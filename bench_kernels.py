"""Per-family kernel benchmarks with analytic FLOP counts and roofline %.

BASELINE config 4 asks for >=50% of the attention roofline at L=1024. This
harness times each hot family on the real chip and reports achieved FLOP/s
against the chip's peak (v5e/"TPU v5 lite": ~197 TFLOP/s bf16, ~98 TFLOP/s
f32, ~819 GB/s HBM). Each family's arithmetic intensity decides its roofline:
compute-bound families are scored against MXU peak, bandwidth-bound ones
against HBM.

Timing uses the checksum-fetch pattern (block_until_ready does not synchronize
on this tunneled runtime; see bench.py).

Usage: python bench_kernels.py [--L 1024] [--dtype bfloat16] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rftpu_jax_cache")

PEAKS = {
    # TPU v5 lite (v5e) public specs
    "bf16_flops": 197e12,
    "f32_flops": 98.5e12,
    "hbm_gbs": 819e9,
}


def _time(fn, *args, iters=20, warmup=3, reps=1):
    """Median seconds per call; each call fetches a scalar checksum.

    reps > 1: fn must be a (carry, *args) -> carry step; it is chained inside
    one jit via fori_loop so ops far smaller than the tunnel round-trip
    (~30 ms) are still measurable. Returned time is per rep."""
    if reps == 1:
        f = jax.jit(fn)
    else:
        step = fn

        def loop(*args):
            def body(_, c):
                return step(c, *args[1:])
            return jnp.sum(
                jax.lax.fori_loop(0, reps, body, args[0]).astype(jnp.float32)
            )

        f = jax.jit(loop)
    for _ in range(warmup):
        float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / reps


def bench_matmul_peak(L, dtype, n=8192):
    """The honest '% of peak' denominator: a carry-chained dense n^3 matmul
    (c <- c @ b). Round-2's 114.6 TFLOP/s ceiling was measured un-chained;
    in-context fusions have since been observed above it (an fc1 GEMM at 134
    TFLOP/s in profiles/l1024_r3b), so the ceiling itself needs the same
    carry-chained timing discipline as every other family here."""
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    c0 = jax.random.normal(ks[0], (n, n)).astype(dtype)
    # keep the chain bounded: b scaled well under unit spectral norm
    b = (jax.random.normal(ks[1], (n, n)) * (0.5 / n ** 0.5)).astype(dtype)

    def step(c):
        return jax.lax.dot(
            c, b, preferred_element_type=jnp.float32).astype(dtype)

    sec = _time(step, c0, reps=10, iters=5)
    flops = 2 * n * n * n
    bytes_ = 3 * n * n * c0.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_tied_attention(L, dtype, B=1, N=8, h=12, d=32):
    """The fused tied-attention kernel: q/k (BH, L, N*d), v same."""
    from rosettafold_tpu.ops.pallas.tied_attention import tied_flash_attention

    BH, ND = B * h, N * d
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (BH, L, ND)) * 0.1).astype(dtype)
    k = (jax.random.normal(ks[1], (BH, L, ND)) * 0.1).astype(dtype)
    v = jax.random.normal(ks[2], (BH, L, ND)).astype(dtype)

    # chain: v_{t+1} = attn(q, k, v_t); 20 reps amortize the tunnel RTT
    sec = _time(lambda v, q, k: tied_flash_attention(q, k, v), v, q, k, reps=300, iters=5)
    flops = 2 * BH * L * L * ND * 2  # logits + AV
    bytes_ = (3 * BH * L * ND + BH * L * ND) * q.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_tied_attention_xla(L, dtype, B=1, N=8, h=12, d=32):
    BH, ND = B * h, N * d
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (BH, L, ND)) * 0.1).astype(dtype)
    k = (jax.random.normal(ks[1], (BH, L, ND)) * 0.1).astype(dtype)
    v = jax.random.normal(ks[2], (BH, L, ND)).astype(dtype)

    def att(v, q, k):
        s = jnp.einsum("bie,bje->bij", q, k, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bij,bjd->bid", a, v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    sec = _time(att, v, q, k, reps=300, iters=5)
    flops = 2 * BH * L * L * ND * 2
    bytes_ = (3 * BH * L * ND) * q.dtype.itemsize + 2 * BH * L * L * 4
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_favor_axial(L, dtype, d_pair=288, h=8, dh=64, m=320):
    """One generalized-FAVOR+ axial pass over the pair rows: (L, L, d_pair)."""
    from rosettafold_tpu.ops.performer import (favor_attention,
                                               gaussian_orthogonal_matrix)

    proj = jnp.asarray(gaussian_orthogonal_matrix(m, dh, seed=0))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (L, h, L, dh)) * 0.1).astype(dtype)
    k = (jax.random.normal(ks[1], (L, h, L, dh)) * 0.1).astype(dtype)
    v = jax.random.normal(ks[2], (L, h, L, dh)).astype(dtype)

    sec = _time(
        lambda q, k, v: jnp.sum(
            favor_attention(q, k, v, proj, generalized=True).astype(jnp.float32)
        ),
        q, k, v,
    )
    rows = L * h
    flops = (
        2 * rows * L * dh * m * 2      # feature maps for q and k
        + 2 * rows * m * L * dh        # context k_feat^T v
        + 2 * rows * L * m * dh        # out = q_feat @ context
        + 2 * rows * L * m             # normalizer
    )
    bytes_ = 3 * rows * L * dh * q.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_favor_axial_pallas(L, dtype, d_pair=288, h=8, dh=64, m=320):
    """The fused Pallas linear-attention kernel at the same shapes."""
    from rosettafold_tpu.ops.pallas.linear_attention import (
        generalized_linear_attention,
    )
    from rosettafold_tpu.ops.performer import gaussian_orthogonal_matrix

    proj = jnp.asarray(gaussian_orthogonal_matrix(m, dh, seed=0)).astype(dtype)
    P = L * h
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (P, L, dh)) * 0.1).astype(dtype)
    k = (jax.random.normal(ks[1], (P, L, dh)) * 0.1).astype(dtype)
    v = jax.random.normal(ks[2], (P, L, dh)).astype(dtype)

    sec = _time(
        lambda v, q, k: generalized_linear_attention(q, k, v, proj),
        v, q, k, reps=20, iters=5,
    )
    rows = P
    flops = (
        2 * rows * L * dh * m * 2
        + 2 * rows * m * L * dh
        + 2 * rows * L * m * dh
        + 2 * rows * L * m
    )
    bytes_ = 4 * rows * L * dh * q.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_fused_performer_layer(L, dtype, d_pair=288, h=8, dh=64, m=320):
    """Round-3 fully fused axial-attention layer (q/k/v proj + FAVOR+ +
    out-proj in one kernel; ops/pallas/fused_performer.py)."""
    from rosettafold_tpu.ops.pallas.fused_performer import fused_performer_layer
    from rosettafold_tpu.ops.performer import gaussian_orthogonal_matrix

    R, HD = L, h * dh
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = (jax.random.normal(ks[0], (R, L, d_pair)) * 0.3).astype(dtype)
    wq, wk, wv = ((jax.random.normal(k, (d_pair, HD)) * 0.05).astype(dtype)
                  for k in ks[1:4])
    wo = (jax.random.normal(ks[4], (HD, d_pair)) * 0.05).astype(dtype)
    bo = (jax.random.normal(ks[5], (d_pair,)) * 0.1).astype(dtype)
    proj = jnp.asarray(gaussian_orthogonal_matrix(m, dh, seed=0))
    scale = dh ** -0.25

    sec = _time(
        lambda x: fused_performer_layer(x, wq, wk, wv, wo, bo, proj,
                                        scale, 1e-3, h, dh),
        x, reps=5, iters=5,
    )
    flops = (3 * 2 * R * L * d_pair * HD
             + R * h * (2 * 2 * L * dh * m + 2 * m * L * dh + 2 * L * m * dh
                        + 2 * L * m)
             + 2 * R * L * HD * d_pair)
    bytes_ = 2 * R * L * d_pair * x.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def _ff_inputs(L, dtype, D, F):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = (jax.random.normal(ks[0], (1, L, L, D)) * 0.3).astype(dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    beta = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = (jax.random.normal(ks[3], (D, F)) * 0.05).astype(dtype)
    b1 = 0.1 * jax.random.normal(ks[4], (F,))
    w2 = (jax.random.normal(ks[5], (F, D)) * 0.05).astype(dtype)
    b2 = 0.1 * jax.random.normal(ks[6], (D,))
    return x, gamma, beta, w1, b1, w2, b2


def bench_ff_xla(L, dtype, D=288, F=1152):
    """Pre-LN FF residual of the axial pair track on plain XLA: the
    (L*L, F) hidden round-trips HBM between the two GEMMs."""
    from rosettafold_tpu.ops.pallas.fused_ff import _xla_composed

    x, gamma, beta, w1, b1, w2, b2 = _ff_inputs(L, dtype, D, F)

    def step(c):
        return _xla_composed(c, gamma, beta, w1, b1, w2, b2, 1e-5)

    sec = _time(step, x, reps=5, iters=5)
    flops = 2 * 2 * L * L * D * F
    bytes_ = (2 * L * L * D + 2 * L * L * F) * x.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_ff_pallas(L, dtype, D=288, F=1152):
    """The fused pre-LN FF residual kernel (ops/pallas/fused_ff.py): LN,
    both GEMMs, ReLU and the residual in one pass; hidden stays in VMEM."""
    from rosettafold_tpu.ops.pallas.fused_ff import fused_ln_ff_residual

    x, gamma, beta, w1, b1, w2, b2 = _ff_inputs(L, dtype, D, F)

    def step(c):
        return fused_ln_ff_residual(c, gamma, beta, w1, b1, w2, b2, 1e-5)

    sec = _time(step, x, reps=5, iters=5)
    flops = 2 * 2 * L * L * D * F
    bytes_ = 2 * L * L * D * x.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_fused_opm(L, dtype, N=8, d=32, d_pair=288):
    """Round-3 fused OPM kernel (LN folded into the projection;
    ops/pallas/outer_product.py)."""
    from rosettafold_tpu.ops.pallas.outer_product import fused_outer_product_mean

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (1, N, L, d), jnp.float32)
    y = (jax.random.normal(ks[1], (1, N, L, d)) * 0.5).astype(dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (d * d,))
    beta = 0.1 * jax.random.normal(ks[3], (d * d,))
    w = (0.1 * jax.random.normal(ks[4], (d * d, d_pair))).astype(dtype)
    b = 0.1 * jax.random.normal(ks[5], (d_pair,))

    def step(y):
        out = fused_outer_product_mean(x, y, gamma, beta, w, b, 1e-5, dtype)
        return y + (jnp.sum(out.astype(jnp.float32)) * 0).astype(y.dtype)

    sec = _time(step, y, reps=5, iters=5)
    # useful FLOPs = the factored contraction, per i: H build + t1
    flops = L * (2 * N * d * d * d_pair + 2 * L * N * d * d_pair)
    bytes_ = (2 * N * L * d + L * L * d_pair) * y.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_outer_product(L, dtype, N=8, d=32, d_pair=288):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = (jax.random.normal(ks[0], (1, N, L, d)) * 0.1).astype(dtype)
    w = jax.random.normal(ks[1], (d * d, d_pair)).astype(dtype)

    def opm(x, w):
        op = jnp.einsum("bniu,bnjv->bijuv", x, x,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        op = op.reshape(1, L, L, d * d)
        return jnp.sum(jnp.einsum("bijc,cd->bijd", op, w,
                                  preferred_element_type=jnp.float32))

    sec = _time(opm, x, w)
    flops = 2 * N * L * L * d * d + 2 * L * L * d * d * d_pair
    bytes_ = L * L * d * d * x.dtype.itemsize  # the big intermediate
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_conv_head(L, dtype, C=288, bins=37):
    """One dilated ResNet tower step: 3x3 conv at (1, L, L, C).

    Carry-chained (reps=5) like bench_conv_pallas: a single-call measurement
    at small L reads the ~30 ms tunnel-fetch floor, not the conv (the
    round-3 L=128 \"29.4 ms XLA conv\" was exactly that artifact)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (1, L, L, C)).astype(dtype)
    w = (jax.random.normal(ks[1], (3, 3, C, C)) * 0.02).astype(dtype)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    sec = _time(conv, x, w, reps=5, iters=5)
    flops = 2 * L * L * 9 * C * C
    bytes_ = (L * L * C * 2) * x.dtype.itemsize + 9 * C * C * x.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_conv_pallas(L, dtype, C=288, tile=8, dilation=1, with_pre=True):
    """The fused shifted-GEMM conv kernel on the same shapes as conv3x3_head,
    including the fused IN-affine+ELU pre-op it replaces."""
    from rosettafold_tpu.ops.pallas.conv3x3 import conv3x3_fused

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (1, L, L, C)).astype(dtype)
    w = (jax.random.normal(ks[1], (3, 3, C, C)) * 0.02).astype(dtype)
    inv = jax.random.normal(ks[2], (1, C)) * 0.1 + 1.0
    pre = (inv, jnp.zeros((1, C))) if with_pre else None

    def step(x, w):
        return conv3x3_fused(x, w, pre, dilation, dtype, tile)

    sec = _time(step, x, w, reps=5, iters=5)
    flops = 2 * L * L * 9 * C * C
    bytes_ = (L * L * C * 4) * x.dtype.itemsize + 9 * C * C * x.dtype.itemsize
    return dict(sec=sec, flops=flops, bytes=bytes_)


def _se3_gather_inputs(L, S, B=1):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    h = {0: jax.random.normal(ks[0], (B, L, 64, 1)),
         1: jax.random.normal(ks[1], (B, L, 3, 3))}
    src_idx = jax.random.randint(ks[5], (B, L, S), 0, L)
    rel = jax.random.normal(ks[2], (B, L, S, 3))
    edge = jax.random.normal(ks[3], (B, L, S, 64))
    mask = jnp.ones((B, L, S), bool)
    return h, src_idx, rel, edge, mask, ks[4]


def _se3_flops(L, S, B=1):
    E = B * L * S
    # dominant: radial MLPs (per edge) + basis contractions
    radial = 0
    for (di, mi) in ((0, 64), (1, 3)):
        for (do, mo) in ((0, 4), (1, 4)):
            nf = 2 * min(di, do) + 1
            radial += 2 * E * (65 * 32 + 32 * 32 + 32 * nf * mi * mo) * 2  # v and k
    return radial, E * (64 + 3 * 3 + 65) * 4


def bench_se3_block(L, dtype, K=64, impl="xla"):
    """One GSE3Res layer on gathered (L, S) neighborhoods at model dims
    (src_idx layout: the fused path gathers node features in plane layout)."""
    from rosettafold_tpu.models import se3 as jse3

    S = min(K, L) + 16
    f_in = jse3.Fiber({0: 64, 1: 3})
    f_mid = jse3.Fiber(num_degrees=2, num_channels=16)
    mod = jse3.GSE3Res(f_in, f_mid, edge_dim=64, div=4, n_heads=4, impl=impl)

    h, src_idx, rel, edge, mask, k_init = _se3_gather_inputs(L, S)
    from rosettafold_tpu.ops import so3
    basis = so3.equivariant_basis(rel, 1)
    feat = jnp.concatenate([edge, so3.edge_radii(rel)], axis=-1)
    params = mod.init(k_init, h, feat, basis, mask, src_idx=src_idx)

    def run_chained(h0, params, h1, feat, basis, mask, src_idx):
        out = mod.apply(params, {0: h0, 1: h1}, feat, basis, mask,
                        src_idx=src_idx)
        return h0 + 1e-6 * jnp.sum(out[0]) + 0 * jnp.sum(out[1])

    sec = _time(run_chained, h[0], params, h[1], feat, basis, mask,
                src_idx, iters=5, reps=60)
    flops, bytes_ = _se3_flops(L, S)
    return dict(sec=sec, flops=flops, bytes=bytes_)


def bench_se3_transformer(L, dtype, K=64, impl="xla"):
    """Full 3-layer SE3Transformer on gathered neighborhoods at model dims —
    the layer-invariant plane prep (feat/basis/mask) is hoisted and shared by
    all layers on the fused path."""
    from rosettafold_tpu.models import se3 as jse3

    S = min(K, L) + 16
    h, src_idx, rel, edge, mask, k_init = _se3_gather_inputs(L, S)
    mod = jse3.SE3Transformer(
        num_layers=2, num_channels=16, n_heads=4, num_degrees=2,
        l0_in_features=64, l1_in_features=3, l0_out_features=32,
        l1_out_features=3, num_edge_features=64, impl=impl)
    params = mod.init(k_init, h[0], h[1], edge, rel, mask, src_idx=src_idx)

    def run_chained(h0, params, h1, edge, rel, mask, src_idx):
        out = mod.apply(params, h0, h1, edge, rel, mask, src_idx=src_idx)
        return h0 + 1e-6 * jnp.sum(out[0]) + 0 * jnp.sum(out[1])

    sec = _time(run_chained, h[0], params, h[1], edge, rel, mask,
                src_idx, iters=5, reps=30)
    flops, bytes_ = _se3_flops(L, S)
    return dict(sec=sec, flops=flops * 3, bytes=bytes_ * 3)  # ~3 GSE3Res layers


FAMILIES = {
    "matmul_peak": bench_matmul_peak,
    "tied_attention_pallas": bench_tied_attention,
    "tied_attention_xla": bench_tied_attention_xla,
    "favor_axial": bench_favor_axial,
    "favor_axial_pallas": bench_favor_axial_pallas,
    "fused_performer_layer": bench_fused_performer_layer,
    "outer_product": bench_outer_product,
    "fused_opm": bench_fused_opm,
    "ff_xla": bench_ff_xla,
    "ff_pallas": bench_ff_pallas,
    "conv3x3_head": bench_conv_head,
    "conv3x3_pallas": bench_conv_pallas,
    "se3_gse3res": bench_se3_block,
    "se3_gse3res_pallas": lambda L, dtype: bench_se3_block(L, dtype, impl="pallas"),
    "se3_transformer_gather": bench_se3_transformer,
    "se3_transformer_gather_pallas":
        lambda L, dtype: bench_se3_transformer(L, dtype, impl="pallas"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    peak = PEAKS["bf16_flops"] if args.dtype == "bfloat16" else PEAKS["f32_flops"]

    results = {}
    for name in args.families.split(","):
        fn = FAMILIES[name]
        r = fn(args.L, dtype)
        tflops = r["flops"] / r["sec"] / 1e12
        intensity = r["flops"] / r["bytes"]
        ridge = peak / PEAKS["hbm_gbs"]
        bound = "compute" if intensity >= ridge else "bandwidth"
        roofline = peak if bound == "compute" else intensity * PEAKS["hbm_gbs"]
        pct = 100.0 * (r["flops"] / r["sec"]) / roofline
        results[name] = {
            "ms": r["sec"] * 1e3,
            "tflops": round(tflops, 2),
            "intensity_flop_per_byte": round(intensity, 1),
            "bound": bound,
            "roofline_tflops": round(roofline / 1e12, 1),
            "pct_of_roofline": round(pct, 1),
        }
        print(f"{name:24s} {r['sec']*1e3:9.2f} ms  {tflops:8.2f} TFLOP/s "
              f"({bound}-bound, {pct:5.1f}% of roofline)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"L": args.L, "dtype": args.dtype, "device":
                       str(jax.devices()[0]), "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
