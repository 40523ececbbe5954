"""Fused pre-LN FeedForward residual (Pallas).

    out = x + fc2(relu(fc1(LayerNorm(x))))

The axial pair track runs this after every row+col attention pair (reference
rosettafold_pytorch.py:270-281,521-525: Linear -> ReLU -> Linear, pre-LN
residual). On the XLA path at L=1024 the (L*L, 4*D) hidden activation is
written to and re-read from HBM between the two GEMMs (~4.8 GB of traffic per
layer in bf16) and the LN + residual cost two more full passes over the pair
stream. The FF is pointwise over pair positions, so this kernel flattens the
input to (M, D) row tiles and runs LN, both GEMMs, the ReLU and the residual
add per tile entirely in VMEM: HBM traffic is one read of x and one write of
out.

Backward recomputes through the plain-XLA composition via jax.vjp (exact; the
hidden is materialized only under grad, where the training shapes are small).
Dropout between ReLU and fc2 is the caller's concern — the fused path engages
only when dropout is inactive (deterministic or p=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_performer import _interpret, _ln


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            ln_eps):
    f32 = jnp.float32
    x = x_ref[...]                                    # (TM, D)
    cdt = x.dtype
    y = _ln(x, g_ref[0], b_ref[0], ln_eps).astype(cdt)
    h = jax.nn.relu(
        jax.lax.dot(y, w1_ref[...], preferred_element_type=f32)
        + b1_ref[...].astype(f32)).astype(cdt)        # (TM, F)
    out = (jax.lax.dot(h, w2_ref[...], preferred_element_type=f32)
           + b2_ref[...].astype(f32) + x.astype(f32))
    o_ref[...] = out.astype(o_ref.dtype)


def _forward(x, gamma, beta, w1, b1, w2, b2, ln_eps):
    shape = x.shape
    D = shape[-1]
    F = w1.shape[1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    TM = min(512, M)
    M_pad = -(-M // TM) * TM
    if M_pad != M:
        x2 = jnp.pad(x2, ((0, M_pad - M), (0, 0)))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((M_pad, D), x.dtype),
        grid=(M_pad // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0)),
            vec(D), vec(D),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            vec(F),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            vec(D),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x2, gamma.reshape(1, -1), beta.reshape(1, -1),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:M].reshape(shape)


def _xla_composed(x, gamma, beta, w1, b1, w2, b2, ln_eps):
    """The same math on plain XLA ops (backward recompute + tests)."""
    f32 = jnp.float32
    cdt = x.dtype
    y = _ln(x, gamma, beta, ln_eps).astype(cdt)
    h = jax.nn.relu(
        jax.lax.dot_general(y, w1, (((y.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=f32)
        + b1.astype(f32)).astype(cdt)
    out = (jax.lax.dot_general(h, w2, (((h.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=f32)
           + b2.astype(f32) + x.astype(f32))
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_ff_residual(x, gamma, beta, w1, b1, w2, b2, ln_eps):
    """out = x + FF(LayerNorm(x)) in one Pallas pass over (..., D) rows.

    gamma/beta: (D,) LN params; w1: (D, F); b1: (F,); w2: (F, D); b2: (D,).
    """
    return _forward(x, gamma, beta, w1, b1, w2, b2, ln_eps)


def _fwd_rule(x, gamma, beta, w1, b1, w2, b2, ln_eps):
    out = _forward(x, gamma, beta, w1, b1, w2, b2, ln_eps)
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _bwd_rule(ln_eps, res, gy):
    x, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_composed(*a, ln_eps), x, gamma, beta, w1, b1, w2, b2)
    return vjp(gy.astype(x.dtype))


fused_ln_ff_residual.defvjp(_fwd_rule, _bwd_rule)
