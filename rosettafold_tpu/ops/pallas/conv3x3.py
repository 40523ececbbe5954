"""Fused 3x3 (dilated) NHWC convolution kernel (Pallas).

The pair track and the prediction head run 3x3 SAME convs on (B, L, L, 288)
maps (reference resnet.py:15-44 and rosettafold_pytorch.py:470-496). XLA's
conv lowering sustains only ~26-28% of the measured MXU ceiling on these
shapes and 740 ms of the L=1024 forward is conv time
(profiles/l1024_r3/ANALYSIS.md). This kernel reformulates the conv as nine
shifted GEMMs accumulated in VMEM:

    out[i, j, :] = sum_{ki,kj in {0,1,2}} x[i+(ki-1)d, j+(kj-1)d, :] @ W[ki,kj]

Grid = (B, H/T) row tiles. Each program assembles its (T + 2d) input rows
from three clamped views of x (tile above / main / tile below — Pallas
auto-pipelines the block fetches), applies the optional fused pre-op
(InstanceNorm affine + ELU, i.e. the inter-conv elementwise of a ResBlock,
models/resnet.py:37-63) on the VPU, zero-masks the out-of-image halo AFTER
the pre-op (SAME padding pads the activated tensor), and runs the nine
(T*W, C) x (C, C') MXU dots with f32 accumulation. HBM traffic is x (3x,
once per neighboring tile) and the output once — no im2col buffer, no
layout copies, and the inter-conv elementwise never exists in HBM.

Backward: custom VJP with no conv ops and no HBM partial sums — dx runs this
same Pallas kernel on the cotangent (a conv's input gradient is a conv with
flipped/transposed weights), dw is nine L^2-contraction GEMMs with (C, Co)
outputs. The lax.conv_general_dilated transpose rules this replaces
materialize space-to-depth temps (f32[H, d, W/d+1, C] copies per dilated
conv) that were the top HBM allocations of the L=512 single-chip train-step
OOM (see also `shifted_gemm_conv`, the conv-free XLA form kept for parity
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(above_ref, main_ref, below_ref, w_ref, pre_ref, o_ref, *,
            dilation, tile, has_pre, acc_f32):
    d = dilation
    T = tile
    i = pl.program_id(1)
    n_t = pl.num_programs(1)
    f32 = jnp.float32

    main = main_ref[0]                    # (T, W, C)
    top = above_ref[0][T - d:]            # (d, W, C)
    bot = below_ref[0][:d]
    cat = jnp.concatenate([top, main, bot], axis=0)  # (T+2d, W, C)
    cdt = main.dtype

    if has_pre:
        inv = pre_ref[0, 0:1]             # (1, C) f32
        shift = pre_ref[0, 1:2]
        pre = cat.astype(f32) * inv[None] + shift[None]
        # ELU via exp (Mosaic has no expm1 lowering)
        cat = jnp.where(pre > 0, pre, jnp.exp(jnp.minimum(pre, 0.0)) - 1.0)
    else:
        cat = cat.astype(f32)

    # SAME padding pads the (pre-activated) tensor with zeros: mask the
    # out-of-image halo rows AFTER the pre-op, then zero-pad the columns.
    r_id = jax.lax.broadcasted_iota(jnp.int32, cat.shape[:2] + (1,), 0)
    valid = (r_id >= jnp.where(i == 0, d, 0)) & (
        r_id < jnp.where(i == n_t - 1, T + d, T + 2 * d))
    cat = jnp.where(valid, cat, 0.0).astype(cdt)
    xsp = jnp.pad(cat, ((0, 0), (d, d), (0, 0)))     # (T+2d, W+2d, C)

    W = main.shape[1]
    C = main.shape[2]
    Co = o_ref.shape[-1]
    acc = jnp.zeros((T * W, Co), f32)
    for ki in range(3):
        for kj in range(3):
            v = xsp[ki * d: ki * d + T, kj * d: kj * d + W, :]
            v = v.reshape(T * W, C)
            wt = w_ref[(ki * 3 + kj) * C: (ki * 3 + kj + 1) * C, :]
            acc = acc + jax.lax.dot(v, wt, preferred_element_type=f32)
    out = acc if acc_f32 else acc.astype(o_ref.dtype)
    o_ref[0] = out.reshape(T, W, Co).astype(o_ref.dtype)


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def pick_tile(H, W, C, Co, dilation, itemsize, has_pre=True,
              budget=100 * 1024 * 1024):
    """Largest row-tile T in (8, 4, 2) whose kernel working set fits VMEM,
    or None when none does (caller falls back to the XLA conv — e.g. the
    dilation-8 head-tower blocks at L=2048, where the (T+2d) halo rows of a
    full-width f32 slab exceed the ~128 MB VMEM alone)."""
    for T in (8, 4, 2):
        if H % T or dilation > T:
            continue
        d = dilation
        est = (
            3 * T * W * C * itemsize * 2          # in blocks, double-buffered
            + T * W * Co * itemsize * 2           # out block, double-buffered
            + (T + 2 * d) * W * C * 4             # f32 cat (pre-op / cast)
            + (T + 2 * d) * (W + 2 * d) * C * itemsize   # padded xsp
            + T * W * Co * 4                      # f32 accumulator
            + T * W * C * itemsize                # shifted-view transient
            + 9 * C * Co * itemsize               # weights
        )
        if est <= budget:
            return T
    return None


def _forward(x, w, pre, dilation, out_dtype, tile):
    B, H, Wd, C = x.shape
    Co = w.shape[-1]
    d = dilation
    T = tile
    assert H % T == 0 and d <= T, (H, T, d)
    n_t = H // T

    wf = w.reshape(9 * C, Co).astype(x.dtype)
    has_pre = pre is not None
    if has_pre:
        inv, shift = pre                  # each (B, C) f32
        pre_arr = jnp.stack([inv, shift], axis=1).astype(jnp.float32)
    else:
        pre_arr = jnp.zeros((B, 2, C), jnp.float32)

    kern = functools.partial(_kernel, dilation=d, tile=T, has_pre=has_pre,
                             acc_f32=out_dtype == jnp.float32)
    clamp = lambda v, hi: jnp.clip(v, 0, hi)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, H, Wd, Co), out_dtype),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, T, Wd, C), lambda b, i: (b, clamp(i - 1, n_t - 1), 0, 0)),
            pl.BlockSpec((1, T, Wd, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, T, Wd, C), lambda b, i: (b, clamp(i + 1, n_t - 1), 0, 0)),
            pl.BlockSpec((9 * C, Co), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, Wd, Co), lambda b, i: (b, i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, x, x, wf, pre_arr)
    return out


def xla_reference(x, w, pre, dilation, out_dtype):
    """Plain-XLA conv with the same pre-op semantics (equals flax
    nn.Conv(kernel_dilation=d, padding='SAME'))."""
    if pre is not None:
        inv, shift = pre
        x = jax.nn.elu(
            x.astype(jnp.float32) * inv[:, None, None, :]
            + shift[:, None, None, :]
        ).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def _shift2d(t, dy, dx):
    """Zero-padded spatial shift: out[i, j] = t[i+dy, j+dx] (0 out of range).
    A slice + pad — XLA fuses it into the consuming GEMM."""
    B, H, W, C = t.shape
    core = t[:, max(dy, 0): H + min(dy, 0), max(dx, 0): W + min(dx, 0)]
    return jnp.pad(core, ((0, 0), (max(-dy, 0), max(dy, 0)),
                          (max(-dx, 0), max(dx, 0)), (0, 0)))


def shifted_gemm_conv(x, w, pre, dilation, out_dtype):
    """The conv as nine shifted GEMMs in plain XLA — same math as the Pallas
    kernel, differentiable by ordinary AD, no conv ops anywhere (so neither
    it nor its transpose produces lax.conv's space-to-depth temps). Kept as
    the executable statement of the algebra the kernel and its custom VJP
    implement, and as the parity target for their tests."""
    if pre is not None:
        inv, shift = pre
        x = jax.nn.elu(
            x.astype(jnp.float32) * inv[:, None, None, :]
            + shift[:, None, None, :]
        ).astype(x.dtype)
    d = dilation
    acc = None
    for ki in range(3):
        for kj in range(3):
            t = jnp.einsum(
                "bhwc,co->bhwo",
                _shift2d(x, (ki - 1) * d, (kj - 1) * d),
                w[ki, kj].astype(x.dtype),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_fused(x, w, pre, dilation=1, out_dtype=jnp.float32, tile=8):
    """Fused 3x3 dilated SAME conv: x (B, H, W, C) NHWC, w (3, 3, C, Co).

    pre: optional (inv, shift) pair of (B, C) f32 arrays — the fused
    elementwise `elu(x * inv + shift)` applied to x before the conv (the
    InstanceNorm-affine + ELU between a ResBlock's two convs). Pass None
    for a plain conv. Requires H % tile == 0 and dilation <= tile."""
    return _forward(x, w, pre, dilation, out_dtype, tile)


def _fwd_rule(x, w, pre, dilation, out_dtype, tile):
    return _forward(x, w, pre, dilation, out_dtype, tile), (x, w, pre)


def _bwd_rule(dilation, out_dtype, tile, res, g):
    # No conv ops and no HBM partial sums in the backward:
    #   - dx of a 3x3 dilated SAME conv is itself a 3x3 dilated SAME conv of
    #     the cotangent with spatially flipped, in/out-transposed weights —
    #     run the Pallas forward kernel for it, so the nine reverse-shifted
    #     GEMM partial sums stay in VMEM.
    #   - dw is nine L^2-contraction GEMMs with (C, Co) outputs.
    # The previous recompute through lax.conv_general_dilated's transpose
    # rules materialized space-to-depth temps (f32[H, d, W/d+1, C] copies per
    # dilated conv) that were the top HBM allocations of the L=512
    # train-step OOM; the all-GEMM form (shifted_gemm_conv's AD) still held
    # multiple (L, L, C) f32 dx partial sums alive.
    x, w, pre = res
    cdt = x.dtype
    f32 = jnp.float32
    if pre is not None:
        def pre_fn(x_, p_):
            inv, shift = p_
            return jax.nn.elu(
                x_.astype(f32) * inv[:, None, None, :]
                + shift[:, None, None, :]).astype(cdt)

        a, pre_vjp = jax.vjp(pre_fn, x, pre)
    else:
        a = x

    gc = g.astype(cdt)
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(cdt)
    da = _forward(gc, w_t, None, dilation, f32, tile)
    d = dilation
    dw = jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwo->co",
                       _shift2d(a, (ki - 1) * d, (kj - 1) * d), gc,
                       preferred_element_type=f32)
            for kj in range(3)], axis=0)
        for ki in range(3)], axis=0).astype(w.dtype)
    if pre is None:
        return da.astype(x.dtype), dw, None
    dx, dpre = pre_vjp(da.astype(a.dtype))
    return dx, dw, dpre


conv3x3_fused.defvjp(_fwd_rule, _bwd_rule)
