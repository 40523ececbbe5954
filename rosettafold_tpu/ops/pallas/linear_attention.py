"""Fused FAVOR+ linear-attention kernel (Pallas).

The XLA implementation of generalized-kernel linear attention
(ops/performer.py) materializes the random-feature maps phi(q), phi(k) of
shape (rows, L, m) in HBM. At the axial-attention shapes of BASELINE config 4
(L=1024, h=8, dh=64, m=320) that is ~5.5 GB per tensor — the op is hopelessly
bandwidth-bound (measured 74 ms / 18 TFLOP/s per call on v5e, ~5x off the
compute roofline).

This kernel fuses the whole chain per attention problem:

    phi_k = relu(k @ W^T) + eps          (L, m)   -- VMEM only
    ctx   = phi_k^T @ v                  (m, dh)
    ksum  = sum_L phi_k                  (m,)
    phi_q = relu(q @ W^T) + eps          (L, m)   -- VMEM only
    out   = (phi_q @ ctx) / (phi_q @ ksum)

so the only HBM traffic is q, k, v, out (+ the tiny projection) — the op
becomes compute-bound. Problems (batch rows x heads) are tiled `bp` per
program; every dot is a 2D MXU matmul.

Replaces the hot path of performer-pytorch's FAVOR+ (the reference's axial
pair attention, rosettafold_pytorch.py:501-528) with identical math
(ops/performer.generalized_kernel_features + linear_attention).

Backward: custom VJP recomputes with the XLA einsum path (memory-heavy;
config-4 training at L=1024 chunks rows instead — see PerformerSelfAttention
chunk_rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, p_ref, o_ref, *, bp, kernel_eps):
    proj_t = p_ref[...].T  # (dh, m)
    for p in range(bp):
        k = k_ref[p]  # (L, dh)
        v = v_ref[p]  # (L, dh)
        q = q_ref[p]  # (L, dh)

        phi_k = jax.nn.relu(
            jax.lax.dot(k, proj_t, preferred_element_type=jnp.float32)
        ) + kernel_eps  # (L, m) f32
        ctx = jax.lax.dot_general(
            phi_k, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (m, dh)
        ksum = jnp.sum(phi_k, axis=0, keepdims=True)  # (1, m)

        phi_q = jax.nn.relu(
            jax.lax.dot(q, proj_t, preferred_element_type=jnp.float32)
        ) + kernel_eps  # (L, m)
        den = jax.lax.dot_general(
            phi_q, ksum, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, 1)
        num = jax.lax.dot(
            phi_q, ctx.astype(phi_q.dtype), preferred_element_type=jnp.float32
        )  # (L, dh)
        # maximum (not +eps): Mosaic rejects non-neutral reduction inits
        o_ref[p] = (num / jnp.maximum(den, 1e-12)).astype(o_ref.dtype)


def _forward(q, k, v, projection, kernel_eps: float, bp: int):
    P, L, dh = q.shape
    m = projection.shape[0]
    bp = min(bp, P)
    # pad the problem axis to a bp multiple
    P_pad = (P + bp - 1) // bp * bp
    if P_pad != P:
        pad = ((0, P_pad - P), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    backend = jax.default_backend()
    out = pl.pallas_call(
        functools.partial(_kernel, bp=bp, kernel_eps=kernel_eps),
        out_shape=jax.ShapeDtypeStruct((P_pad, L, dh), q.dtype),
        grid=(P_pad // bp,),
        in_specs=[
            pl.BlockSpec((bp, L, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bp, L, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bp, L, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((m, dh), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, L, dh), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the unrolled bp loop keeps ~4.2 MB of phi intermediates live per
            # iteration; the default 16 MB scoped-vmem cap is too small
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=(backend not in ("tpu", "axon")),
    )(q, k, v, projection)
    return out[:P]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def generalized_linear_attention(q, k, v, projection, kernel_eps: float = 1e-3,
                                 bp: int = 8):
    """Fused ReLU-kernel FAVOR+ attention.

    q, k, v: (P, L, dh) — P independent problems (flatten batch x heads).
    projection: (m, dh). Inputs are expected pre-scaled by d**-0.25
    (performer convention; see ops/performer.generalized_kernel_features).
    Returns (P, L, dh) in the dtype of v.
    """
    return _forward(q, k, v, projection, kernel_eps, bp)


def _xla_reference(q, k, v, projection, kernel_eps):
    phi = lambda x: jax.nn.relu(
        jnp.einsum("pld,md->plm", x, projection.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    ) + kernel_eps
    qf, kf = phi(q), phi(k)
    ctx = jnp.einsum("plm,pld->pmd", kf, v.astype(kf.dtype),
                     preferred_element_type=jnp.float32)
    ksum = jnp.sum(kf, axis=1)
    den = jnp.einsum("plm,pm->pl", qf, ksum) + 1e-12
    out = jnp.einsum("plm,pmd->pld", qf, ctx) / den[..., None]
    return out.astype(v.dtype)


def _fwd(q, k, v, projection, kernel_eps, bp):
    return _forward(q, k, v, projection, kernel_eps, bp), (q, k, v, projection)


def _bwd(kernel_eps, bp, res, g):
    q, k, v, projection = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference(q, k, v, projection, kernel_eps), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


generalized_linear_attention.defvjp(_fwd, _bwd)
