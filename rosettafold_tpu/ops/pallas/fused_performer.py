"""Fully fused generalized-FAVOR+ attention layer (Pallas).

Round-2's `linear_attention.py` kernel fused only the FAVOR+ core and took
per-head (P, L, dh) tensors — producing that layout from the (R, L, D) pair
rows costs three (R, L, H*dh) HBM transposes each way, which is exactly why
the fused kernel lost to XLA's cross-op fusion in context at L=1024
(BENCHMARKS.md round-2 inference table). This kernel fuses the ENTIRE
attention layer per row-problem:

    q = (x @ Wq) * s,  k = (x @ Wk) * s,  v = x @ Wv        (L, H*dh)
    per head h:
        phi_q = relu(q_h @ P^T) + eps                        (L, m)  VMEM only
        phi_k = relu(k_h @ P^T) + eps   (padded rows zeroed)
        ctx   = phi_k^T @ v_h                                (m, dh)
        ksum  = sum_L phi_k                                  (1, m)
        att_h = (phi_q @ ctx) / max(phi_q @ ksum^T, 1e-12)
    out = concat_h(att_h) @ Wo + bo                          (L, D)

so HBM traffic is x + out + the small weights — no per-head tensor, no
feature map, and no transpose ever exists outside VMEM. All matmuls are MXU
dots with f32 accumulation; with bf16 inputs the projection GEMMs run at
bf16 MXU rate.

The backward is fused the same way (`_bwd_kernel`): residual = x only;
q/k/v/phi are recomputed per row-problem in VMEM and the weight gradients
accumulate across the sequential grid in VMEM accumulators. This removes the
round-2 limitation where the fused forward's backward re-materialized the
(rows, L, m) XLA feature maps (infeasible at L >= 2048).

Math identical to performer-pytorch's generalized_attention=True path used by
the reference's axial pair attention
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:501-528) — see
ops/performer.generalized_kernel_features + linear_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_iota(L):
    return jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)


def _ln(x, gamma, beta, eps):
    """LayerNorm over the last axis, f32 statistics, flax fast-variance
    formula (mean of squares minus squared mean) so the folded kernel matches
    nn.LayerNorm bit-for-bit up to reduction order."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def _fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
                o_ref, *, heads, dim_head, scale, kernel_eps, l_valid):
    TR, L, D = x_ref.shape           # TR row-problems per program
    out = _layer_math(
        x_ref[...].reshape(TR * L, D), TR, L,
        wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
        heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=l_valid)
    o_ref[...] = out.reshape(TR, L, D).astype(o_ref.dtype)


def _fwd_kernel_t(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
                  o_ref, *, heads, dim_head, scale, kernel_eps, l_valid):
    """Transposed-read variant: the block is (1, L, TR, D) strided straight out
    of the untransposed (B, L1, L2, D) pair tensor — the explicit swapaxes HBM
    round trip (one full read+write of the 0.6 GB pair map at L=1024, each way)
    never happens; the DMA engine does the stride work."""
    _, L, TR, D = x_ref.shape
    x = jnp.swapaxes(x_ref[0], 0, 1)           # (TR, L, D) in VMEM
    out = _layer_math(
        x.reshape(TR * L, D), TR, L,
        wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
        heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=l_valid)
    o_ref[0] = jnp.swapaxes(out.reshape(TR, L, D), 0, 1).astype(o_ref.dtype)


def _fwd_kernel_lnres(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                      bo_ref, p_ref, o_ref, *, heads, dim_head, scale,
                      kernel_eps, l_valid, ln_eps):
    """LN + attention + residual in one program: o = x + Attn(LN(x)).

    Folding the pre-LN and the residual add into the kernel deletes two full
    HBM passes over the pair stream per attention step (the separate LN
    read+write and the residual read+read+write) — ~3 GB of elementwise
    traffic per call at L=1024 that the l1024_r3b profile attributed to
    `convert_reduce_fusion` LN statistics and misc loop fusions."""
    TR, L, D = x_ref.shape
    x = x_ref[...]
    y = _ln(x.reshape(TR * L, D), g_ref[0], b_ref[0], ln_eps).astype(x.dtype)
    out = _layer_math(
        y, TR, L, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
        heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=l_valid)
    out = x.astype(jnp.float32) + out.reshape(TR, L, D)
    o_ref[...] = out.astype(o_ref.dtype)


def _fwd_kernel_t_lnres(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                        bo_ref, p_ref, o_ref, *, heads, dim_head, scale,
                        kernel_eps, l_valid, ln_eps):
    """Axis-1 strided-read variant of _fwd_kernel_lnres (see _fwd_kernel_t)."""
    _, L, TR, D = x_ref.shape
    x = jnp.swapaxes(x_ref[0], 0, 1)           # (TR, L, D) in VMEM
    y = _ln(x.reshape(TR * L, D), g_ref[0], b_ref[0], ln_eps).astype(x.dtype)
    out = _layer_math(
        y, TR, L, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref,
        heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=l_valid)
    out = x.astype(jnp.float32) + out.reshape(TR, L, D)
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


def _layer_math(x, TR, L, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, p_ref, *,
                heads, dim_head, scale, kernel_eps, l_valid):
    f32 = jnp.float32
    D = x.shape[-1]
    cdt = x.dtype                    # compute dtype for MXU inputs (bf16/f32)
    proj_t = p_ref[...].T.astype(cdt)  # (dh, m)

    # Projections and phi maps run over all TR row-problems in one GEMM
    # (M = TR*L): at small L this amortizes the MXU pipeline ramp and the
    # per-program grid overhead that capped the kernel at ~46% of ceiling
    # for L=128 (BENCHMARKS.md).
    q = (jax.lax.dot(x, wq_ref[...], preferred_element_type=f32)
         * scale).astype(cdt)        # (TR*L, H*dh)
    k = (jax.lax.dot(x, wk_ref[...], preferred_element_type=f32)
         * scale).astype(cdt)
    v = jax.lax.dot(x, wv_ref[...], preferred_element_type=f32).astype(cdt)

    padded = l_valid < L
    if padded:
        valid = (_row_iota(TR * L) % L < l_valid)  # (TR*L, 1)

    # ksum (= sum_L phi_k) and den (= phi_q . ksum) ride the existing GEMMs
    # for free: a ones-column appended to v makes ctx's last column ksum, and
    # then num's last column is den — dh=64 -> 65 output lanes still round to
    # one 128-lane MXU tile, while the two (TR*L, m) f32 VPU reductions they
    # replace were ~40% of the kernel's non-MXU time at L=1024.
    ones_col = jnp.ones((TR, L, 1), cdt)

    att_parts = []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        phi_q = (jax.nn.relu(
            jax.lax.dot(qh, proj_t, preferred_element_type=f32))
            + kernel_eps).astype(cdt)                        # (TR*L, m)
        phi_k = jax.nn.relu(
            jax.lax.dot(kh, proj_t, preferred_element_type=f32)) + kernel_eps
        if padded:
            phi_k = jnp.where(valid, phi_k, 0.0)             # zero padded rows
        phi_k = phi_k.astype(cdt)
        m = phi_q.shape[-1]
        pq3 = phi_q.reshape(TR, L, m)
        pk3 = phi_k.reshape(TR, L, m)
        v3 = jnp.concatenate(
            [vh.reshape(TR, L, dim_head), ones_col], axis=-1)
        ctx = jax.lax.dot_general(
            pk3, v3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                      # (TR, m, dh+1)
        num = jax.lax.dot_general(
            pq3, ctx.astype(cdt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                      # (TR, L, dh+1)
        den = num[..., dim_head:]
        att_parts.append(
            (num[..., :dim_head] / jnp.maximum(den, 1e-12))
            .reshape(TR * L, dim_head))
    att = jnp.concatenate(att_parts, axis=-1).astype(cdt)    # (TR*L, H*dh)
    out = jax.lax.dot(att, wo_ref[...], preferred_element_type=f32)
    return out + bo_ref[...].astype(f32)


def _bwd_kernel(x_ref, gy_ref, wq_ref, wk_ref, wv_ref, wo_ref, p_ref,
                wqt_ref, wkt_ref, wvt_ref, wot_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dbo_ref, *,
                heads, dim_head, scale, kernel_eps, l_valid):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x = x_ref[0]                      # (L, D)
    gy = gy_ref[0]                    # (L, D), padded rows zero
    L = x.shape[0]
    cdt = x.dtype
    proj_t = p_ref[...].T.astype(cdt)   # (dh, m)
    proj = p_ref[...].astype(cdt)       # (m, dh)

    q = (jax.lax.dot(x, wq_ref[...], preferred_element_type=f32)
         * scale).astype(cdt)
    k = (jax.lax.dot(x, wk_ref[...], preferred_element_type=f32)
         * scale).astype(cdt)
    v = jax.lax.dot(x, wv_ref[...], preferred_element_type=f32).astype(cdt)
    go_full = jax.lax.dot(gy.astype(cdt), wot_ref[...],
                          preferred_element_type=f32)   # (L, H*dh)

    padded = l_valid < L
    if padded:
        valid = (_row_iota(L) < l_valid)

    # Same GEMM-folding as the forward (see _layer_math): ksum/den ride the
    # ctx/num GEMMs via a ones-column on v, and the backward's g_ksum term
    # rides the g_ctx GEMM via a gden-column on gnum — the dh=64 -> 65 output
    # lanes round to the same 128-lane MXU tile, so all four (L, m) f32 VPU
    # reductions this kernel used to run per head are free now.
    ones_col = jnp.ones((L, 1), cdt)

    att_parts, gq_parts, gk_parts, gv_parts = [], [], [], []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        sq = jax.lax.dot(qh, proj_t, preferred_element_type=f32)   # (L, m)
        sk = jax.lax.dot(kh, proj_t, preferred_element_type=f32)
        phi_q = (jax.nn.relu(sq) + kernel_eps).astype(cdt)
        phi_k = jax.nn.relu(sk) + kernel_eps
        if padded:
            phi_k = jnp.where(valid, phi_k, 0.0)
        phi_k = phi_k.astype(cdt)
        v_ext = jnp.concatenate([vh, ones_col], axis=-1)           # (L, dh+1)
        ctx = jax.lax.dot_general(
            phi_k, v_ext, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                            # (m, dh+1)
        num = jax.lax.dot(phi_q, ctx.astype(cdt),
                          preferred_element_type=f32)              # (L, dh+1)
        den = num[:, dim_head:]                                    # (L, 1)
        r = 1.0 / jnp.maximum(den, 1e-12)                          # (L, 1)
        o_h = num[:, :dim_head] * r                                # (L, dh) f32
        att_parts.append(o_h)

        go = go_full[:, sl]                                        # (L, dh) f32
        gnum = go * r                                              # (L, dh) f32
        gden = (-jnp.sum(go * o_h, axis=-1, keepdims=True) * r)    # (L, 1) f32
        gnum_ext = jnp.concatenate([gnum, gden], axis=-1).astype(cdt)
        # d phi_q = gnum @ ctx^T + gden * ksum  (ksum = ctx[:, dh])
        g_pq = jax.lax.dot_general(
            gnum_ext, ctx.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                            # (L, m) f32
        # g_ctx_ext[:, :dh] = d ctx; g_ctx_ext[:, dh] = g_ksum
        g_ctx_ext = jax.lax.dot_general(
            phi_q, gnum_ext, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)                            # (m, dh+1)
        # d phi_k = vh @ g_ctx^T + g_ksum  (the ones-column of v_ext selects it)
        g_pk = jax.lax.dot_general(
            v_ext, g_ctx_ext.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                            # (L, m)
        if padded:
            g_pk = jnp.where(valid, g_pk, 0.0)
        g_sq = (g_pq * (sq > 0)).astype(cdt)
        g_sk = (g_pk * (sk > 0)).astype(cdt)
        gq_parts.append(jax.lax.dot(g_sq, proj, preferred_element_type=f32))
        gk_parts.append(jax.lax.dot(g_sk, proj, preferred_element_type=f32))
        gv_parts.append(jax.lax.dot(
            phi_k, g_ctx_ext[:, :dim_head].astype(cdt),
            preferred_element_type=f32))
    att = jnp.concatenate(att_parts, axis=-1).astype(cdt)          # (L, H*dh)
    gq = (jnp.concatenate(gq_parts, axis=-1) * scale).astype(cdt)
    gk = (jnp.concatenate(gk_parts, axis=-1) * scale).astype(cdt)
    gv = jnp.concatenate(gv_parts, axis=-1).astype(cdt)

    dx = (jax.lax.dot(gq, wqt_ref[...], preferred_element_type=f32)
          + jax.lax.dot(gk, wkt_ref[...], preferred_element_type=f32)
          + jax.lax.dot(gv, wvt_ref[...], preferred_element_type=f32))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    gyc = gy.astype(cdt)
    dwq_ref[...] += jax.lax.dot_general(
        x, gq, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dwk_ref[...] += jax.lax.dot_general(
        x, gk, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dwv_ref[...] += jax.lax.dot_general(
        x, gv, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dwo_ref[...] += jax.lax.dot_general(
        att, gyc, (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbo_ref[...] += jnp.sum(gy.astype(jnp.float32), axis=0, keepdims=True)


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _pad_rows(t, L_pad):
    L = t.shape[1]
    if L == L_pad:
        return t
    return jnp.pad(t, ((0, 0), (0, L_pad - L), (0, 0)))


def _forward(x, wq, wk, wv, wo, bo, projection, scale, kernel_eps,
             heads, dim_head):
    R, L, D = x.shape
    L_pad = max(128, -(-L // 128) * 128)
    # Rows per program: stack row-problems until M ~= 512 (measured sweet spot
    # at L=128 — amortizes grid overhead and MXU pipeline ramp; at L >= 512
    # one row-problem is already a full-size GEMM and TR=1 keeps VMEM low).
    TR = max(1, 512 // L_pad)
    while R % TR:
        TR //= 2
    xp = _pad_rows(x, L_pad)
    kern = functools.partial(
        _fwd_kernel, heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=L)
    hd = heads * dim_head
    m = projection.shape[0]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, L_pad, D), x.dtype),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, L_pad, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((hd, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((m, dim_head), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, L_pad, D), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, wq, wk, wv, wo, bo.reshape(1, -1), projection)
    return out[:, :L]


def _forward_axis1(x, wq, wk, wv, wo, bo, projection, scale, kernel_eps,
                   heads, dim_head):
    """Attend over axis 1 of (B, L1, L2, D) WITHOUT transposing in HBM:
    blocks are read (1, L1, TR, D)-strided and transposed in VMEM."""
    B, L1, L2, D = x.shape
    # Caller falls back to the swapaxes path otherwise. TR is fixed at 8:
    # Mosaic requires the second-to-last block dim to be a multiple of 8,
    # and 8 problems/program keeps VMEM bounded at L1=1024 while giving
    # M=8*L1 GEMMs.
    assert L1 % 128 == 0 and L2 % 8 == 0
    TR = 8
    kern = functools.partial(
        _fwd_kernel_t, heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=L1)
    hd = heads * dim_head
    m = projection.shape[0]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L1, L2, D), x.dtype),
        grid=(B, L2 // TR),
        in_specs=[
            pl.BlockSpec((1, L1, TR, D), lambda b, j: (b, 0, j, 0)),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((hd, D), lambda b, j: (0, 0)),
            pl.BlockSpec((1, D), lambda b, j: (0, 0)),
            pl.BlockSpec((m, dim_head), lambda b, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L1, TR, D), lambda b, j: (b, 0, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, wq, wk, wv, wo, bo.reshape(1, -1), projection)
    return out


def _forward_lnres(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                   scale, kernel_eps, heads, dim_head, ln_eps):
    R, L, D = x.shape
    L_pad = max(128, -(-L // 128) * 128)
    TR = max(1, 512 // L_pad)
    while R % TR:
        TR //= 2
    xp = _pad_rows(x, L_pad)
    kern = functools.partial(
        _fwd_kernel_lnres, heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=L, ln_eps=ln_eps)
    hd = heads * dim_head
    m = projection.shape[0]
    vec = lambda: pl.BlockSpec((1, D), lambda i: (0, 0))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, L_pad, D), x.dtype),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, L_pad, D), lambda i: (i, 0, 0)),
            vec(), vec(),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((D, hd), lambda i: (0, 0)),
            pl.BlockSpec((hd, D), lambda i: (0, 0)),
            vec(),
            pl.BlockSpec((m, dim_head), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, L_pad, D), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, gamma.reshape(1, -1), beta.reshape(1, -1),
      wq, wk, wv, wo, bo.reshape(1, -1), projection)
    return out[:, :L]


def _forward_axis1_lnres(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                         scale, kernel_eps, heads, dim_head, ln_eps):
    B, L1, L2, D = x.shape
    assert L1 % 128 == 0 and L2 % 8 == 0
    TR = 8
    kern = functools.partial(
        _fwd_kernel_t_lnres, heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=L1, ln_eps=ln_eps)
    hd = heads * dim_head
    m = projection.shape[0]
    vec = lambda: pl.BlockSpec((1, D), lambda b, j: (0, 0))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L1, L2, D), x.dtype),
        grid=(B, L2 // TR),
        in_specs=[
            pl.BlockSpec((1, L1, TR, D), lambda b, j: (b, 0, j, 0)),
            vec(), vec(),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((D, hd), lambda b, j: (0, 0)),
            pl.BlockSpec((hd, D), lambda b, j: (0, 0)),
            vec(),
            pl.BlockSpec((m, dim_head), lambda b, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L1, TR, D), lambda b, j: (b, 0, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1),
      wq, wk, wv, wo, bo.reshape(1, -1), projection)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_ln_performer_residual(x, gamma, beta, wq, wk, wv, wo, bo,
                                projection, scale, kernel_eps, heads,
                                dim_head, ln_eps):
    """out = x + FusedPerformerLayer(LayerNorm(x)) in ONE Pallas pass.

    The pre-LN residual attention step of the axial pair track (reference
    rosettafold_pytorch.py:521-525) with the LayerNorm and the residual add
    folded into the kernel: HBM traffic is one read of x and one write of
    out. Backward recomputes LN(x) in XLA (cheap, elementwise), reuses the
    fused attention backward kernel, and routes the LN cotangent via jax.vjp
    — exact, and the (rows, L, m) feature maps still never exist in HBM.
    gamma/beta: (D,) LayerNorm scale/bias; ln_eps static.
    """
    return _forward_lnres(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                          scale, kernel_eps, heads, dim_head, ln_eps)


def _fwd_rule_lnres(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                    scale, kernel_eps, heads, dim_head, ln_eps):
    out = _forward_lnres(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                         scale, kernel_eps, heads, dim_head, ln_eps)
    return out, (x, gamma, beta, wq, wk, wv, wo, projection)


def _bwd_rule_lnres(scale, kernel_eps, heads, dim_head, ln_eps, res, gy):
    x, gamma, beta, wq, wk, wv, wo, projection = res
    ln_fn = lambda x_, g_, b_: _ln(x_, g_, b_, ln_eps).astype(x.dtype)
    y, ln_vjp = jax.vjp(ln_fn, x, gamma, beta)
    dy, dwq, dwk, dwv, dwo, dbo, dproj = _backward(
        y, gy, wq, wk, wv, wo, projection, scale, kernel_eps,
        heads, dim_head)
    dx_ln, dgamma, dbeta = ln_vjp(dy)
    dx = gy.astype(dx_ln.dtype) + dx_ln
    return (dx.astype(x.dtype), dgamma, dbeta, dwq, dwk, dwv, dwo, dbo,
            dproj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_ln_performer_residual_axis1(x, gamma, beta, wq, wk, wv, wo, bo,
                                      projection, scale, kernel_eps, heads,
                                      dim_head, ln_eps):
    """fused_ln_performer_residual attending over axis 1 of (B, L1, L2, D)
    with the transpose folded into strided DMA (see fused_performer_layer_axis1)."""
    return _forward_axis1_lnres(x, gamma, beta, wq, wk, wv, wo, bo,
                                projection, scale, kernel_eps, heads,
                                dim_head, ln_eps)


def _fwd_rule_lnres_axis1(x, gamma, beta, wq, wk, wv, wo, bo, projection,
                          scale, kernel_eps, heads, dim_head, ln_eps):
    out = _forward_axis1_lnres(x, gamma, beta, wq, wk, wv, wo, bo,
                               projection, scale, kernel_eps, heads,
                               dim_head, ln_eps)
    return out, (x, gamma, beta, wq, wk, wv, wo, projection)


def _bwd_rule_lnres_axis1(scale, kernel_eps, heads, dim_head, ln_eps,
                          res, gy):
    x, gamma, beta, wq, wk, wv, wo, projection = res
    B, L1, L2, D = x.shape
    xt = jnp.swapaxes(x, 1, 2).reshape(B * L2, L1, D)
    gyt = jnp.swapaxes(gy, 1, 2).reshape(B * L2, L1, D)
    dxt, dgamma, dbeta, dwq, dwk, dwv, dwo, dbo, dproj = _bwd_rule_lnres(
        scale, kernel_eps, heads, dim_head, ln_eps,
        (xt, gamma, beta, wq, wk, wv, wo, projection), gyt)
    dx = jnp.swapaxes(dxt.reshape(B, L2, L1, D), 1, 2)
    return dx, dgamma, dbeta, dwq, dwk, dwv, dwo, dbo, dproj


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_performer_layer_axis1(x, wq, wk, wv, wo, bo, projection,
                                scale, kernel_eps, heads, dim_head):
    """fused_performer_layer attending over axis 1 of a (B, L1, L2, D) pair
    tensor (the RowWise axial step, reference rosettafold_pytorch.py:44-54,
    501-513) with the transpose folded into the kernel's strided DMA.
    Requires L1 % 128 == 0 (the caller falls back to swapaxes otherwise)."""
    return _forward_axis1(x, wq, wk, wv, wo, bo, projection,
                          scale, kernel_eps, heads, dim_head)


def _fwd_rule_axis1(x, wq, wk, wv, wo, bo, projection, scale, kernel_eps,
                    heads, dim_head):
    out = _forward_axis1(x, wq, wk, wv, wo, bo, projection,
                         scale, kernel_eps, heads, dim_head)
    return out, (x, wq, wk, wv, wo, projection)


def _bwd_rule_axis1(scale, kernel_eps, heads, dim_head, res, gy):
    # Training path: transpose once and reuse the (R, L, D) fused backward —
    # the forward's no-transpose trick is an inference win; backward keeps
    # the straightforward layout.
    x, wq, wk, wv, wo, projection = res
    B, L1, L2, D = x.shape
    xt = jnp.swapaxes(x, 1, 2).reshape(B * L2, L1, D)
    gyt = jnp.swapaxes(gy, 1, 2).reshape(B * L2, L1, D)
    dxt, dwq, dwk, dwv, dwo, dbo, dproj = _backward(
        xt, gyt, wq, wk, wv, wo, projection, scale, kernel_eps,
        heads, dim_head)
    dx = jnp.swapaxes(dxt.reshape(B, L2, L1, D), 1, 2)
    return dx, dwq, dwk, dwv, dwo, dbo, dproj


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_performer_layer(x, wq, wk, wv, wo, bo, projection,
                          scale, kernel_eps, heads, dim_head):
    """Fused generalized-FAVOR+ attention layer.

    x: (R, L, D) row-problems (R = batch * other pair axis), LN'd input.
    wq/wk/wv: (D, heads*dim_head); wo: (heads*dim_head, D); bo: (D,).
    projection: (m, dim_head) fixed random features (no gradient).
    Returns (R, L, D) = attention output incl. the output projection
    (dropout and residual are the caller's).
    """
    return _forward(x, wq, wk, wv, wo, bo, projection,
                    scale, kernel_eps, heads, dim_head)


def _fwd_rule(x, wq, wk, wv, wo, bo, projection, scale, kernel_eps,
              heads, dim_head):
    out = _forward(x, wq, wk, wv, wo, bo, projection,
                   scale, kernel_eps, heads, dim_head)
    return out, (x, wq, wk, wv, wo, projection)


def _bwd_rule(scale, kernel_eps, heads, dim_head, res, gy):
    x, wq, wk, wv, wo, projection = res
    return _backward(x, gy, wq, wk, wv, wo, projection,
                     scale, kernel_eps, heads, dim_head)


def _backward(x, gy, wq, wk, wv, wo, projection,
              scale, kernel_eps, heads, dim_head):
    R, L, D = x.shape
    L_pad = max(128, -(-L // 128) * 128)
    xp, gyp = _pad_rows(x, L_pad), _pad_rows(gy.astype(x.dtype), L_pad)
    hd = heads * dim_head
    m = projection.shape[0]
    kern = functools.partial(
        _bwd_kernel, heads=heads, dim_head=dim_head, scale=scale,
        kernel_eps=kernel_eps, l_valid=L)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    dx, dwq, dwk, dwv, dwo, dbo = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((R, L_pad, D), x.dtype),
            jax.ShapeDtypeStruct((D, hd), jnp.float32),
            jax.ShapeDtypeStruct((D, hd), jnp.float32),
            jax.ShapeDtypeStruct((D, hd), jnp.float32),
            jax.ShapeDtypeStruct((hd, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, L_pad, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, L_pad, D), lambda i: (i, 0, 0)),
            w_spec((D, hd)), w_spec((D, hd)), w_spec((D, hd)),
            w_spec((hd, D)), w_spec((m, dim_head)),
            w_spec((hd, D)), w_spec((hd, D)), w_spec((hd, D)),
            w_spec((D, hd)),
        ],
        out_specs=(
            pl.BlockSpec((1, L_pad, D), lambda i: (i, 0, 0)),
            w_spec((D, hd)), w_spec((D, hd)), w_spec((D, hd)),
            w_spec((hd, D)), w_spec((1, D)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, gyp, wq, wk, wv, wo, projection,
      wq.T, wk.T, wv.T, wo.T)
    return (dx[:, :L], dwq.astype(wq.dtype), dwk.astype(wk.dtype),
            dwv.astype(wv.dtype), dwo.astype(wo.dtype),
            dbo[0].astype(jnp.float32), jnp.zeros_like(projection))


fused_performer_layer.defvjp(_fwd_rule, _bwd_rule)
fused_performer_layer_axis1.defvjp(_fwd_rule_axis1, _bwd_rule_axis1)
fused_ln_performer_residual.defvjp(_fwd_rule_lnres, _bwd_rule_lnres)
fused_ln_performer_residual_axis1.defvjp(
    _fwd_rule_lnres_axis1, _bwd_rule_lnres_axis1)


def xla_reference(x, wq, wk, wv, wo, bo, projection, scale, kernel_eps,
                  heads, dim_head):
    """Plain-XLA implementation of the same fused layer (tests/benchmarks)."""
    R, L, D = x.shape
    split = lambda t: jnp.moveaxis(
        t.reshape(R, L, heads, dim_head), -2, 1)        # (R, h, L, dh)
    q = split(x @ wq) * scale
    k = split(x @ wk) * scale
    v = split(x @ wv)
    phi = lambda t: jax.nn.relu(
        jnp.einsum("rhld,md->rhlm", t, projection.astype(t.dtype))
    ).astype(t.dtype) + jnp.asarray(kernel_eps, t.dtype)
    pq, pk = phi(q), phi(k)
    ctx = jnp.einsum("rhlm,rhld->rhmd", pk, v)
    ksum = jnp.sum(pk.astype(jnp.float32), axis=-2)
    den = jnp.einsum("rhlm,rhm->rhl", pq, ksum.astype(pq.dtype),
                     preferred_element_type=jnp.float32)
    num = jnp.einsum("rhlm,rhmd->rhld", pq, ctx,
                     preferred_element_type=jnp.float32)
    att = num / jnp.maximum(den, 1e-12)[..., None]
    att = jnp.moveaxis(att, 1, -2).reshape(R, L, heads * dim_head)
    return (att.astype(x.dtype) @ wo + bo).astype(x.dtype)
