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


def tp_shard_map(fn, *args, shard=None):
    """Run a leading-axis-batched Pallas kernel sharded over the 'tp' axis.

    XLA's SPMD partitioner cannot slice into a pallas_call (it is an opaque
    custom call), so under a tp>1 mesh the kernel's operands would otherwise
    be all-gathered and the kernel replicated on every tp group — the one
    place Megatron sharding used to stop at the XLA path. The attention
    kernels are embarrassingly parallel over their leading batch axis
    (batch*heads for tied attention, row-problems for the fused FAVOR+
    layer), so a shard_map with that axis split over 'tp' runs each device
    on its local block with zero collectives inside; XLA inserts the
    boundary reshards (for tied attention the q/k/v producers are already
    head-sharded by param_shardings, so those are local reshapes, not
    gathers).

    shard: indices of args whose leading axis is split (default: all args);
    the rest (e.g. whole-layer weights fed to the fused FAVOR+ kernel) are
    replicated within the tp group. Falls back to a plain call when no mesh
    is active, tp == 1, or a sharded leading axis does not divide tp. fn
    must map the sharded args to outputs carrying the same leading axis.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or "tp" not in mesh.axis_names:
        return fn(*args)
    tp = mesh.shape["tp"]
    shard = set(range(len(args))) if shard is None else set(shard)
    if tp == 1 or any(args[i].shape[0] % tp != 0 for i in shard):
        return fn(*args)
    in_specs = tuple(
        P("tp", *([None] * (a.ndim - 1))) if i in shard
        else P(*([None] * a.ndim))
        for i, a in enumerate(args))
    out_shapes = jax.eval_shape(fn, *args)
    out_specs = jax.tree.map(
        lambda s: P("tp", *([None] * (len(s.shape) - 1))), out_shapes)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; every output is 'tp'-varying by construction here
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(*args)
