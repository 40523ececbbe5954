"""FAVOR+ linear attention (Performer), TPU-native.

The reference reaches FAVOR+ through the performer-pytorch dependency
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:10,313-318,505-518):
softmax-kernel random features for the sequence-wise MSA attention and the
generalized ReLU kernel (`generalized_attention=True`) for pair axial attention.

This is a from-scratch implementation of the FAVOR+ algorithm (Choromanski et al.,
"Rethinking Attention with Performers", 2021): random orthogonal feature maps
phi(x), followed by the O(L) associativity trick
    Attn(Q,K,V) ~= phi(Q) (phi(K)^T V) / (phi(Q) (phi(K)^T 1)).
Everything is a dense matmul -> maps straight onto the MXU; no custom kernel needed
(the contraction sizes are already MXU-shaped).

All functions operate on (..., L, d) arrays so callers batch arbitrarily (MSA rows,
pair rows/cols) without reshapes.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def default_nb_features(dim_head: int) -> int:
    return int(dim_head * math.ceil(math.log(dim_head)))


def gaussian_orthogonal_matrix(
    nb_rows: int, nb_cols: int, seed: int, scaling: int = 0
) -> np.ndarray:
    """Random features matrix with orthogonal blocks (FAVOR+ Sec. 3.2).

    Built host-side in float64 and embedded as a trace-time constant: the projection
    is a fixed buffer, never trained.
    scaling=0: rows rescaled by norms of iid gaussian rows (matches performer-pytorch
    default); scaling=1: all rows scaled by sqrt(nb_cols).
    """
    rng = np.random.default_rng(seed)
    n_full = nb_rows // nb_cols
    blocks = []
    for _ in range(n_full):
        q, _ = np.linalg.qr(rng.standard_normal((nb_cols, nb_cols)))
        blocks.append(q.T)
    rem = nb_rows - n_full * nb_cols
    if rem > 0:
        q, _ = np.linalg.qr(rng.standard_normal((nb_cols, nb_cols)))
        blocks.append(q.T[:rem])
    mat = np.concatenate(blocks, axis=0)

    if scaling == 0:
        multiplier = np.linalg.norm(rng.standard_normal((nb_rows, nb_cols)), axis=1)
    elif scaling == 1:
        multiplier = np.full((nb_rows,), math.sqrt(nb_cols))
    else:
        raise ValueError(f"invalid scaling {scaling}")
    return (multiplier[:, None] * mat).astype(np.float32)


def softmax_kernel_features(
    data: jnp.ndarray,
    projection: jnp.ndarray,
    *,
    is_query: bool,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Positive softmax-kernel features: phi(x) = exp(w^T x' - |x'|^2/2 - stab)/sqrt(m).

    data: (..., L, d); projection: (m, d) -> (..., L, m).
    Queries stabilize with a per-position max, keys with a global max (this is the
    standard FAVOR+ numerical-stability choice).
    """
    d = data.shape[-1]
    m = projection.shape[0]
    data_normalizer = d ** -0.25
    ratio = m ** -0.5

    proj = jnp.einsum(
        "...ld,md->...lm",
        data_normalizer * data,
        projection.astype(data.dtype),
        preferred_element_type=jnp.float32,
    )
    diag = (
        jnp.sum(data.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        * (data_normalizer**2)
        / 2.0
    )

    if is_query:
        stab = jnp.max(proj, axis=-1, keepdims=True)
    else:
        stab = jnp.max(proj, axis=(-1, -2), keepdims=True)
    # exp in float32 for stability; features downcast to the compute dtype
    feats = ratio * (jnp.exp(proj - diag - jax.lax.stop_gradient(stab)) + eps)
    return feats.astype(data.dtype)


def generalized_kernel_features(
    data: jnp.ndarray,
    projection: Optional[jnp.ndarray],
    *,
    kernel_fn=jax.nn.relu,
    kernel_eps: float = 1e-3,
) -> jnp.ndarray:
    """Generalized attention features: phi(x) = kernel_fn(x' W^T) + eps.

    Used for the pair axial attention (`generalized_attention=True` in the reference,
    rosettafold_pytorch.py:509,517).
    """
    d = data.shape[-1]
    data_normalizer = d ** -0.25
    if projection is None:
        return kernel_fn(data_normalizer * data) + kernel_eps
    proj = jnp.einsum(
        "...ld,md->...lm", data_normalizer * data, projection.astype(data.dtype)
    )
    return kernel_fn(proj) + jnp.asarray(kernel_eps, proj.dtype)


def linear_attention(q_feat: jnp.ndarray, k_feat: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Non-causal linear attention. q_feat/k_feat (..., L, m), v (..., L, e).

    When the attended axis is short (L(m+e) < 2me — e.g. the MSA sequence-wise
    attention over N=8 homologs, reference rosettafold_pytorch.py:357-409), the
    QUADRATIC association (phi_q phi_k^T) v is used instead of phi_q (phi_k^T v):
    mathematically identical by associativity, fewer FLOPs, and it never builds
    the (..., m, e) context tensor — which at B*L row-problems is the single
    largest HBM tensor of the whole forward (~0.5 GB/call at L=1024; measured
    bandwidth-bound at ~4 TFLOP/s on v5e, profiles/l128_r3)."""
    L, m = q_feat.shape[-2], q_feat.shape[-1]
    e = v.shape[-1]
    if L * (m + e) < 2 * m * e:
        a = jnp.einsum("...lm,...km->...lk", q_feat, k_feat,
                       preferred_element_type=jnp.float32)     # (..., L, L)
        d_inv = 1.0 / (jnp.sum(a, axis=-1) + 1e-12)
        out = jnp.einsum("...lk,...ke->...le", a.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return (out * d_inv[..., None]).astype(v.dtype)
    k_sum = jnp.sum(k_feat.astype(jnp.float32), axis=-2)  # (..., m)
    d_inv = 1.0 / (
        jnp.einsum(
            "...lm,...m->...l", q_feat, k_sum.astype(q_feat.dtype),
            preferred_element_type=jnp.float32,
        )
        + 1e-12
    )
    context = jnp.einsum("...lm,...le->...me", k_feat, v)
    out = jnp.einsum("...me,...lm->...le", context, q_feat,
                     preferred_element_type=jnp.float32)
    return (out * d_inv[..., None]).astype(v.dtype)


def favor_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    projection: Optional[jnp.ndarray],
    *,
    generalized: bool = False,
    kernel_eps: float = 1e-3,
    softmax_eps: float = 1e-4,
) -> jnp.ndarray:
    """Full FAVOR+ attention on per-head tensors (..., L, d_head)."""
    if generalized:
        q_feat = generalized_kernel_features(q, projection, kernel_eps=kernel_eps)
        k_feat = generalized_kernel_features(k, projection, kernel_eps=kernel_eps)
    else:
        assert projection is not None
        q_feat = softmax_kernel_features(q, projection, is_query=True, eps=softmax_eps)
        k_feat = softmax_kernel_features(k, projection, is_query=False, eps=softmax_eps)
    return linear_attention(q_feat, k_feat, v)
