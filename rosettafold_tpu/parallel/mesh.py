"""Device mesh and sharding layout.

The reference has zero distributed code (SURVEY.md §2.7); this is a new
first-class subsystem. The mesh is 2D:

  * 'dp'  — data parallel: the batch axis of every input/label shards here.
  * 'sp'  — sequence parallel over MSA rows (the N axis of the (B, N, L) MSA):
            the untied column attention attends across N, so XLA inserts
            all-gathers/reduce-scatters on ICI for that stage; the tied row
            attention's sum over N becomes a psum. Parameters stay replicated.

All communication is XLA-emitted collectives over the mesh (no NCCL analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'sp') mesh over the first n_devices devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % sp == 0, f"n_devices {n} not divisible by sp {sp}"
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, ("dp", "sp"))


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
