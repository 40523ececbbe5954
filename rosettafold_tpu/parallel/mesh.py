"""Device mesh and sharding layout.

The reference has zero distributed code (SURVEY.md §2.7); this is a new
first-class subsystem. The mesh is 3D:

  * 'dp'  — data parallel: the batch axis of every input/label shards here.
  * 'sp'  — sequence parallel over MSA rows (the N axis of the (B, N, L) MSA):
            the untied column attention attends across N, so XLA inserts
            all-gathers/reduce-scatters on ICI for that stage; the tied row
            attention's sum over N becomes a psum. Also shards the pair
            track's first L axis (shard_pair_constraint).
  * 'tp'  — tensor parallel (Megatron-style) over attention heads / FF
            hidden: to_q/to_k/to_v/fc1 kernels shard their output axis,
            to_out/fc2 shard their input axis, and XLA's SPMD partitioner
            emits the psum at each row-parallel matmul (param_shardings).

All communication is XLA-emitted collectives over the mesh (no NCCL analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp', 'sp', 'tp') mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % (sp * tp) == 0, f"n_devices {n} not divisible by sp*tp {sp * tp}"
    arr = np.asarray(devices).reshape(n // (sp * tp), sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


# Canonical input shardings for a training batch.
def batch_shardings(mesh: Mesh):
    return {
        "msa": NamedSharding(mesh, P("dp", "sp", None)),  # (B, N, L)
        "seq": NamedSharding(mesh, P("dp", None)),  # (B, L)
        "aa_idx": NamedSharding(mesh, P("dp", None)),  # (B, L)
        "xyz": NamedSharding(mesh, P("dp", None, None, None)),  # (B, L, 3, 3)
        "mask": NamedSharding(mesh, P("dp", None)),  # (B, L)
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_pair_constraint(pair):
    """Constrain a (B, L, L, d) pair tensor to shard batch over 'dp' and the
    FIRST L axis over 'sp' — the long-context lever: the pair track is the
    memory hog (B*L^2*d floats), and axial col-attention/outer-product/conv all
    partition cleanly over the i axis (XLA inserts halo exchanges for the 3x3
    convs and all-gathers for row attention over ICI).

    No-op outside a mesh or on meshes without an 'sp' axis, so the model code
    can call it unconditionally.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or "sp" not in mesh.axis_names:
        return pair
    return jax.lax.with_sharding_constraint(pair, P("dp", "sp", None, None))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict onto the mesh with the canonical layout."""
    sh = batch_shardings(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}


# Megatron-style tensor parallelism: kernels whose OUTPUT axis is a stack of
# heads / FF hidden units shard that axis; the matching down-projections shard
# their INPUT axis, making them row-parallel (XLA SPMD inserts one psum per
# attention/FF block at the row-parallel matmul). Leaf names are the module
# names used throughout models/ (attention.py, msa.py, structure.py).
_TP_COL = frozenset({"to_q", "to_k", "to_v", "fc1", "msa2value"})
_TP_ROW = frozenset({"to_out", "fc2"})


def _tp_spec(path, leaf, tp_size: int):
    names = [p.key for p in path if hasattr(p, "key")]
    if len(names) < 2:
        return P()
    mod, kind = names[-2], names[-1]
    nd = getattr(leaf, "ndim", 0)
    if mod in _TP_COL and kind in ("kernel", "bias") and nd >= 1 \
            and leaf.shape[-1] % tp_size == 0:
        return P(*([None] * (nd - 1)), "tp")
    if mod in _TP_ROW and kind == "kernel" and nd >= 2 \
            and leaf.shape[-2] % tp_size == 0:
        return P(*([None] * (nd - 2)), "tp", None)
    return P()


def param_shardings(tree, mesh: Mesh):
    """NamedShardings for a parameter (or optimizer-state) tree under 'tp'.

    Matches leaves by their trailing path names, so it applies equally to the
    unscanned tree, the scan_blocks stacked tree (specs are padded with
    leading Nones to each leaf's rank), and optax moment trees that mirror the
    param structure. Axes whose size does not divide the tp extent stay
    replicated — the rule is a layout hint; correctness is SPMD-guaranteed
    either way."""
    tp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
    if tp_size == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_spec(path, leaf, tp_size)),
        tree,
    )


def shard_params(tree, mesh: Mesh):
    """Device-put a param/opt-state tree with tensor-parallel layout."""
    return jax.tree.map(jax.device_put, tree, param_shardings(tree, mesh))
