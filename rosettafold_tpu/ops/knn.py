"""Static-shape kNN neighborhoods for the SE(3) structure track.

Replaces the reference's dynamic DGL graph construction
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:823-862) with a dense
boolean adjacency computed entirely in XLA: pairwise CA distances with the
diagonal pushed out (+1e3), lax.top_k for the K nearest neighbors, a scatter to
adjacency, and the union with the sequence band |i-j| < kmin. No dynamic shapes,
no host round-trips; the mask feeds masked attention instead of an edge list.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ca_pairwise_distance(ca: jnp.ndarray) -> jnp.ndarray:
    """(B, L, 3) -> (B, L, L) Euclidean distances."""
    diff = ca[:, :, None, :] - ca[:, None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)


def knn_adjacency(
    xyz: jnp.ndarray,
    aa_idx: jnp.ndarray,
    n_neighbors: int,
    kmin: int = 9,
    ca_index: int = 1,
    exclude_self: bool = True,
    k_dynamic=None,
) -> jnp.ndarray:
    """Boolean adjacency cond[b, i, j]: edge i -> j exists iff j is among the
    n_neighbors nearest CAs of i, OR |aa_i - aa_j| < kmin (self excluded from
    both conditions). Matches the reference edge rule exactly (:844-852).

    xyz: (B, L, 3, 3) backbone N/CA/C coords; aa_idx: (B, L) int.
    Returns (B, L, L) bool, src-major (row i = out-neighbors of i).
    """
    B, L = xyz.shape[:2]
    ca = xyz[:, :, ca_index]
    pdist = ca_pairwise_distance(ca)
    eye = jnp.eye(L, dtype=pdist.dtype)
    pdist = pdist + eye[None] * 1e3

    sep = jnp.abs(aa_idx[:, None, :] - aa_idx[:, :, None]).astype(pdist.dtype)
    sep = sep + eye[None] * 999.9

    k = min(n_neighbors, L)
    _, nbr_idx = jax.lax.top_k(-pdist, k)  # (B, L, k): k smallest distances
    adj = jnp.zeros((B, L, L), dtype=bool)
    b_ix = jnp.arange(B)[:, None, None]
    i_ix = jnp.arange(L)[None, :, None]
    if k_dynamic is None:
        adj = adj.at[b_ix, i_ix, nbr_idx].set(True)
    else:
        # scanned-blocks mode: n_neighbors is the static max; the per-block
        # budget arrives as a traced scalar — only the first k_dynamic
        # (closest) top-k slots become edges
        slot_ok = jnp.arange(k) < jnp.minimum(k_dynamic, L)
        adj = adj.at[b_ix, i_ix, nbr_idx].max(slot_ok[None, None, :])

    cond = jnp.logical_or(adj, sep < kmin)
    if not exclude_self:
        # Reference-exact compat mode (parity testing): keep whatever the top-k
        # picked, including self edges when n_neighbors >= L (:844-847).
        return cond
    # Default: exclude self edges. DIVERGENCE from the reference: its top-k spans
    # every node (including self) once n_neighbors >= L (:844-847), and a
    # self-edge has a zero displacement whose spherical-harmonic basis is not
    # rotation-covariant — it silently breaks SE(3) equivariance in that regime
    # (measured: max displacement error 15.3 vs 5e-3 at L=128, K=128).
    return cond & ~jnp.eye(L, dtype=bool)[None]


def incoming_mask(cond: jnp.ndarray) -> jnp.ndarray:
    """Transpose src-major adjacency to dst-major incoming mask:
    in_mask[b, j, i] = cond[b, i, j] (aggregation at dst over incoming edges,
    DGL update_all semantics)."""
    return jnp.swapaxes(cond, 1, 2)


def knn_gather_indices(
    xyz: jnp.ndarray,
    aa_idx: jnp.ndarray,
    n_neighbors: int,
    kmin: int = 9,
    ca_index: int = 1,
    k_dynamic=None,
):
    """(B, L, S) neighbor indices + validity mask for the gather SE(3) path.

    For each destination j the S = min(K, L) + 2*(kmin-1) slots hold j's K
    nearest CAs plus the sequence band j-(kmin-1) .. j+(kmin-1). Band slots that
    fall out of range or duplicate a top-K slot are masked. Self is excluded.

    Exactness note: the dense path (knn_adjacency) aggregates the reference's
    *reverse*-topk incoming set {i : j in topk(i)}; since CA distances are
    symmetric this gather form {i in topk(j)} coincides except at top-K boundary
    asymmetries. With K >= L-1 both reduce to the full graph. The gather path
    is the long-sequence (O(L*S) memory) implementation; the dense path is the
    exact-parity implementation (config.se3_impl).
    """
    B, L = xyz.shape[:2]
    ca = xyz[:, :, ca_index]
    pdist = ca_pairwise_distance(ca)
    pdist = pdist + jnp.eye(L, dtype=pdist.dtype)[None] * 1e3

    k = min(n_neighbors, L)
    _, topk_idx = jax.lax.top_k(-pdist, k)  # (B, L, k): k nearest i of each j
    # Self edges are always excluded (see knn_adjacency: the reference keeps
    # them when K >= L, which breaks equivariance; we diverge deliberately).
    topk_valid = topk_idx != jnp.arange(L)[None, :, None]
    if k_dynamic is not None:
        topk_valid = topk_valid & (
            jnp.arange(k)[None, None, :] < jnp.minimum(k_dynamic, L)
        )

    # Sequence band: offsets -(kmin-1)..-1, 1..kmin-1 relative to aa_idx order.
    # (aa_idx is the residue numbering; band membership is |aa_i - aa_j| < kmin.
    # For the standard contiguous numbering this is j +- offset.)
    offsets = jnp.asarray(
        [o for o in range(-(kmin - 1), kmin) if o != 0], dtype=jnp.int32
    )
    pos = jnp.arange(L, dtype=jnp.int32)
    band_idx = pos[None, :, None] + offsets[None, None, :]  # (1, L, 2*(kmin-1))
    band_valid = (band_idx >= 0) & (band_idx < L)
    band_idx = jnp.clip(band_idx, 0, L - 1)
    band_idx = jnp.broadcast_to(band_idx, (B, L, offsets.shape[0]))
    band_valid = jnp.broadcast_to(band_valid, band_idx.shape)
    # Validity also requires the aa_idx separation rule (handles non-contiguous
    # numbering conservatively).
    aa_j = aa_idx[:, :, None]
    aa_band = jax.vmap(lambda a, i: a[i])(aa_idx, band_idx)  # (B, L, 2*(kmin-1))
    band_valid = band_valid & (jnp.abs(aa_band - aa_j) < kmin)
    # De-duplicate against the top-k slots — but only the *valid* ones. In
    # k_dynamic mode slots at rank >= k_dynamic are masked out of the top-k, so
    # a band edge that collides with such a slot must stay in the band or the
    # edge vanishes from the graph entirely.
    dup = jnp.any(
        (band_idx[..., None] == topk_idx[:, :, None, :])
        & topk_valid[:, :, None, :],
        axis=-1,
    )
    band_valid = band_valid & ~dup

    idx = jnp.concatenate([topk_idx, band_idx], axis=-1)
    valid = jnp.concatenate([topk_valid, band_valid], axis=-1)
    return idx.astype(jnp.int32), valid


def knn_bucket_indices(
    xyz: jnp.ndarray,
    aa_idx: jnp.ndarray,
    n_neighbors: int,
    kmin: int = 9,
    ca_index: int = 1,
    capacity: Optional[int] = None,
    k_dynamic=None,
):
    """EXACT incoming neighborhoods on the dst-major (B, L, C) gather layout.

    The reference edge rule is src-major — i -> j exists iff j is in topk(i)
    (rosettafold_pytorch.py:844-852) — so the incoming set of a destination j,
    {i : j in topk(i)} + band, has *variable* size (reverse-kNN indegree).
    This buckets each destination's true incoming set into C static slots,
    nearest-first, so the fused SE(3) attention kernel (which needs a static
    dst-major layout) runs on the exact edge set. Band edges are always kept.

    capacity (C): measured reverse-kNN indegree on chain / compact-globule /
    uniform point clouds tops out at ~2.2 * K (mean = K by double counting),
    so the default C = min(2*K, L) + 2*(kmin-1) covers every distribution we
    measured; any residual overflow drops the FURTHEST incoming edges (a
    rotation-invariant rule — equivariance is preserved) and is reported.

    Returns (src_idx (B, L, C) int32, valid (B, L, C) bool, overflow (B,) int32
    = number of true edges beyond capacity, 0 means exact).
    """
    B, L = xyz.shape[:2]
    cond = knn_adjacency(
        xyz, aa_idx, n_neighbors, kmin, ca_index,
        exclude_self=True, k_dynamic=k_dynamic,
    )
    in_mask = jnp.swapaxes(cond, 1, 2)  # (B, j, i): true incoming sets

    ca = xyz[:, :, ca_index]
    pdist = ca_pairwise_distance(ca)  # symmetric: d(j, i) = d(i, j)
    sep = jnp.abs(aa_idx[:, None, :] - aa_idx[:, :, None])
    band_bonus = jnp.where(sep < kmin, 1e4, 0.0)  # band edges never dropped
    score = jnp.where(in_mask, band_bonus - pdist, -jnp.inf)

    k = min(n_neighbors, L)
    C = capacity if capacity is not None else min(2 * k, L) + 2 * (kmin - 1)
    C = min(C, L)
    val, src_idx = jax.lax.top_k(score, C)  # (B, j, C), nearest-first
    valid = jnp.isfinite(val)
    overflow = (
        jnp.sum(in_mask, axis=(1, 2), dtype=jnp.int32)
        - jnp.sum(valid, axis=(1, 2), dtype=jnp.int32)
    )
    return src_idx.astype(jnp.int32), valid, overflow


def update_relative_positions(rel_layout, xyz, ca_index: int = 1):
    """Recompute rel_pos for a neighborhood layout from new coordinates
    (functional analog of the reference's update_relative_positions,
    equivariant_attention/utils/utils_data.py:46-65).

    rel_layout: either a (B, L, S) src-index array (gather layout) or None
    (dense layout). Returns the new rel_pos tensor (dst - src)."""
    ca = xyz[:, :, ca_index]
    if rel_layout is None:
        return ca[:, :, None, :] - ca[:, None, :, :]
    ca_src = jax.vmap(lambda c, i: c[i])(ca, rel_layout)
    return ca[:, :, None, :] - ca_src
