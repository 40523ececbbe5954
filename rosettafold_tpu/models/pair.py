"""Pair-track modules.

TPU-native re-designs of the reference pair-track modules
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:412-556). The
outer-product coevolution feature is a single MXU einsum; the 3x3 conv residual
lowers to lax.conv_general_dilated (NHWC); axial attention applies FAVOR+ along the
row / column axes of the L x L pair map.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .dropout import Dropout
import jax.numpy as jnp

from .attention import FeedForward, PerformerSelfAttention
from .msa import PositionWiseWeightFactor
from .resnet import InstanceNorm2d, _conv_rows, _InStats

# One epsilon for every pair-track LayerNorm AND the fused kernels that fold
# those LNs in (fused OPM / FAVOR+ / FF): the nn.LayerNorm constructors and
# the (scale, bias, eps) tuples handed to the kernels must agree, or the
# fused paths silently diverge from the XLA path (ADVICE r3).
LN_EPS = 1e-5


def symmetrize(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (x + x^T) over the pair axes (reference :550-556)."""
    return 0.5 * (x + jnp.swapaxes(x, 1, 2))


class OuterProductMean(nn.Module):
    """Outer-product *sum* over MSA rows -> pair features (reference :412-427).

    einsum('bniu,bnjv->bijuv') flattened to (u v), then LayerNorm + Linear. The sum
    (not mean) is intentional: y is pre-weighted by attention (:421-422).
    """

    in_features: int
    out_features: int
    # rows of i per chunk; bounds the (B, chunk, L, u*v) intermediate so the
    # full (B, L, L, u*v) outer product never materializes (long-sequence path)
    chunk_size: Optional[int] = None
    # "pallas": fused kernel that never materializes the (B, L, L, u*v) outer
    # product at all — the LayerNorm is folded algebraically into the
    # projection (ops/pallas/outer_product.py). Engaged for L >= fused_min_l
    # (128 after the r3 e2e A/B: +3.6% at the L=128 headline, BENCHMARKS.md).
    impl: str = "xla"
    fused_min_l: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y=None):
        y = x if y is None else y
        if self.dtype is not None:
            x, y = x.astype(self.dtype), y.astype(self.dtype)
        L = x.shape[2]
        ln = nn.LayerNorm(epsilon=LN_EPS, name="ln")
        dense = nn.Dense(self.out_features, dtype=self.dtype, name="to_out")

        if self.impl == "pallas" and L >= self.fused_min_l:
            from ..ops.pallas.outer_product import fused_outer_product_mean

            uv = self.in_features ** 2
            # bind the submodules on dummies (DCE'd) to read their params
            _ = ln(jnp.zeros((1, uv), jnp.float32))
            _ = dense(jnp.zeros((1, uv), x.dtype))
            return fused_outer_product_mean(
                x.astype(jnp.float32), y,
                ln.variables["params"]["scale"],
                ln.variables["params"]["bias"],
                dense.variables["params"]["kernel"].astype(x.dtype),
                dense.variables["params"]["bias"].astype(jnp.float32),
                LN_EPS, self.dtype or jnp.float32,
            )

        def block(x_rows):
            op = jnp.einsum("bniu,bnjv->bijuv", x_rows, y)
            op = op.reshape(*op.shape[:3], self.in_features**2)
            return dense(ln(op))

        if self.chunk_size is None or L <= self.chunk_size:
            return block(x)
        c = self.chunk_size
        # static unrolled loop; submodule params are shared across chunks
        outs = [block(x[:, :, i : i + c]) for i in range(0, L, c)]
        return jnp.concatenate(outs, axis=1)


class PairUpdateWithMsa(nn.Module):
    """MSA -> pair update (reference :430-498).

    Projects the MSA to d_proj, forms the position-weighted outer product, tiles 1D
    MSA features row-/col-wise, concatenates with LN(pair) and the tied-attention
    map, and runs a Linear + one 2-conv residual block (3x3, InstanceNorm, ELU).
    """

    d_msa: int
    d_proj: int = 32
    d_pair: int = 288
    n_heads: int = 12
    p_dropout: float = 0.1
    long_chunk: Optional[int] = None
    attn_impl: str = "xla"  # "pallas" also engages the fused OPM kernel
    # row-chunk the two 3x3 convs at inference (exact halos + global IN
    # stats, models/resnet.py) — at L=2048 the unchunked conv temporaries
    # are 2 x 3 GB (BENCHMARKS.md)
    row_chunk: Optional[int] = None
    # attn_impl == "pallas" engages the fused conv kernel from this L up
    # (128 after the r3 e2e A/B: +9% at the L=128 headline, BENCHMARKS.md)
    conv_fused_min_l: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, att, *, deterministic: bool = True):
        L = msa.shape[2]

        # proj_msa: LN -> Linear -> LN (:434-438)
        m = nn.LayerNorm(epsilon=LN_EPS, name="proj_msa_ln_in")(msa)
        m = nn.Dense(self.d_proj, name="proj_msa")(m)
        m = nn.LayerNorm(epsilon=LN_EPS, name="proj_msa_ln_out")(m)  # (B, N, L, d_proj)

        w = PositionWiseWeightFactor(
            self.d_proj, 1, self.p_dropout, name="poswise_weight"
        )(m, deterministic=deterministic)  # (B, N, 1, L, 1)
        w = w[:, :, 0]  # (B, N, L, 1)

        coevol = OuterProductMean(
            self.d_proj, self.d_pair, chunk_size=self.long_chunk,
            impl=self.attn_impl, dtype=self.dtype,
            name="outer_product_mean",
        )(m, m * w)
        ln_coevol = nn.LayerNorm(epsilon=LN_EPS, name="ln_coevol_feat")
        ln_pair = nn.LayerNorm(epsilon=LN_EPS, name="ln_pair")

        msa_1d = jnp.concatenate([jnp.sum(m, axis=1), m[:, 0]], axis=-1)  # (B, L, 2p)

        # resnet_in applied WITHOUT materializing the (B, L, L, 716) feature
        # concat (6 GB bf16 at L=2048): Dense(concat(parts)) decomposes into a
        # sum of per-part projections through row slices of the same kernel,
        # and the row-/col-tiled MSA features are projected BEFORE tiling —
        # a (B, L, 2p) matmul broadcast-added instead of an L^2 one. The
        # resnet_in/kernel parameter keeps the concat formulation's (716, 288)
        # shape; concat order: [coevol, row, col, ln_pair, att].
        d2p = msa_1d.shape[-1]
        resnet_in = nn.Dense(self.d_pair, dtype=self.dtype, name="resnet_in")
        n_feat = self.d_pair + 2 * d2p + self.d_pair + att.shape[-1]
        _ = resnet_in(jnp.zeros((1, n_feat), msa_1d.dtype))  # bind (DCE'd)
        kern = resnet_in.variables["params"]["kernel"]
        bias = resnet_in.variables["params"]["bias"]
        ct = self.dtype or jnp.float32
        kern = kern.astype(ct)
        o = 0
        w_coevol = kern[o:o + self.d_pair]; o += self.d_pair
        w_row = kern[o:o + d2p]; o += d2p
        w_col = kern[o:o + d2p]; o += d2p
        w_pair = kern[o:o + self.d_pair]; o += self.d_pair
        w_att = kern[o:]
        row_proj = msa_1d.astype(ct) @ w_row  # (B, L, d_pair)
        col_proj = msa_1d.astype(ct) @ w_col

        def x_rows(lo, hi):
            """Rows [lo, hi) of the decomposed resnet_in output; the
            row-chunked path builds x from these chunk-by-chunk so the f32
            LN temporaries stay O(chunk * L * d_pair)."""
            return (
                ln_coevol(coevol[:, lo:hi]).astype(ct) @ w_coevol
                + ln_pair(pair[:, lo:hi]).astype(ct) @ w_pair
                + att[:, lo:hi].astype(ct) @ w_att
                + row_proj[:, lo:hi, None, :]
                + col_proj[:, None, :, :]
                + bias.astype(ct)
            )

        conv1 = nn.Conv(self.d_pair, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(self.d_pair, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv2")
        # Residual adds run in f32, but the pair STREAM between blocks stays
        # in the compute dtype: at L=1024 the f32 stream cost ~1.1 s of
        # elementwise loop fusions per forward (profiles/l1024_r3/ANALYSIS.md);
        # bf16 halves that traffic. LN/IN statistics remain f32 throughout.
        tile = None
        if self.attn_impl == "pallas" and L >= self.conv_fused_min_l:
            # fused shifted-GEMM conv kernel (2.2x over the XLA conv at
            # L=1024; pick_tile shrinks the row tile until the working set
            # fits VMEM so the L >= 2048 regime uses tile=4)
            from ..ops.pallas.conv3x3 import conv3x3_fused, pick_tile

            tile = pick_tile(L, L, self.d_pair, self.d_pair, 1,
                             jnp.dtype(ct).itemsize)
        if tile is not None:
            _ = conv1(jnp.zeros((1, 8, 8, self.d_pair), ct))
            _ = conv2(jnp.zeros((1, 8, 8, self.d_pair), ct))
            k1 = conv1.variables["params"]["kernel"]
            k2 = conv2.variables["params"]["kernel"]
            if self.row_chunk is not None and L > self.row_chunk:
                x = jnp.zeros((pair.shape[0], L, L, self.d_pair), ct)
                for i0 in range(0, L, self.row_chunk):
                    i1 = min(i0 + self.row_chunk, L)
                    x = x.at[:, i0:i1].set(x_rows(i0, i1).astype(ct))
            else:
                x = x_rows(0, L).astype(ct)
            y1 = conv3x3_fused(x, k1, None, 1, ct, tile)
            inv1, shift1 = _InStats(self.d_pair, name="in1",
                                    return_affine=True)(y1)
            if deterministic:
                y2 = conv3x3_fused(y1, k2, (inv1, shift1), 1, ct, tile)
            else:
                a = nn.elu(y1.astype(jnp.float32) * inv1[:, None, None, :]
                           + shift1[:, None, None, :])
                a = Dropout(self.p_dropout)(a, deterministic=False)
                y2 = conv3x3_fused(a.astype(ct), k2, None, 1, ct, tile)
            inv2, shift2 = _InStats(self.d_pair, name="in2",
                                    return_affine=True)(y2)
            out_dt = self.dtype or jnp.float32
            c = self.row_chunk
            if c is not None and L > c:
                out = jnp.zeros(y2.shape, out_dt)
                for i0 in range(0, L, c):
                    i1 = min(i0 + c, L)
                    o = nn.elu(x[:, i0:i1].astype(jnp.float32)
                               + y2[:, i0:i1].astype(jnp.float32)
                               * inv2[:, None, None, :]
                               + shift2[:, None, None, :])
                    out = out.at[:, i0:i1].set(o.astype(out_dt))
                return out
            out = nn.elu(x.astype(jnp.float32)
                         + y2.astype(jnp.float32) * inv2[:, None, None, :]
                         + shift2[:, None, None, :])
            return out.astype(out_dt)
        if self.row_chunk is not None and L > self.row_chunk and deterministic:
            c = self.row_chunk
            # Materialize x ONCE, built chunk-by-chunk (per-chunk f32 LN
            # temps only) — recomputing x_rows per conv sweep was measured
            # WORSE at L=2048: it keeps coevol+pair (2 x 3 GB) alive through
            # every sweep, while one x buffer (3 GB) lets both inputs die
            # here (OOM breakdown in BENCHMARKS.md).
            x = jnp.zeros((pair.shape[0], L, L, self.d_pair), ct)
            for i0 in range(0, L, c):
                i1 = min(i0 + c, L)
                x = x.at[:, i0:i1].set(x_rows(i0, i1).astype(ct))
            y1 = _conv_rows(conv1, x, 1, c)
            in1 = _InStats(self.d_pair, name="in1")(y1)
            pre1 = lambda t: nn.elu(in1(t))
            y2 = _conv_rows(conv2, y1, 1, c, pre=pre1)
            in2 = _InStats(self.d_pair, name="in2")(y2)
            out = jnp.zeros(y2.shape, self.dtype or jnp.float32)
            for i0 in range(0, L, c):
                i1 = min(i0 + c, L)
                o = nn.elu(x[:, i0:i1].astype(jnp.float32)
                           + in2(y2[:, i0:i1]))
                out = out.at[:, i0:i1].set(o.astype(out.dtype))
            return out
        x = x_rows(0, L)
        y = conv1(x)
        y = InstanceNorm2d(self.d_pair, name="in1")(y)
        y = nn.elu(y)
        y = Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = conv2(y)
        y = InstanceNorm2d(self.d_pair, name="in2")(y)
        out = nn.elu(x.astype(jnp.float32) + y)
        return out if self.dtype is None else out.astype(self.dtype)


class PairUpdateWithAxialAttentionLayer(nn.Module):
    """Axial FAVOR+ attention over the pair map (reference :501-528).

    Row step attends along the first pair axis (for each fixed j), col step along
    the second (for each fixed i), each pre-LN residual, then a pre-LN FF residual.
    Both attentions use the generalized (ReLU-kernel) Performer mode (:509,:517).
    """

    d_pair: int
    d_ff: int
    n_heads: int = 8
    p_dropout: float = 0.1
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    long_chunk: Optional[int] = None
    # row-chunk the pre-LN FF residual at inference: the fc1 hidden is the
    # single biggest HLO temp at long L ((L, L, 4*d_pair) bf16 = 9 GB at
    # L=2048); the FF is pointwise over pairs so chunking is exact, no halo.
    ff_chunk: Optional[int] = None
    # crossover overrides for the fused kernels (None = module defaults);
    # tests force the folded paths at tiny L with these
    fused_favor_min_l: Optional[int] = None
    ff_fused_min_l: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)  # bf16 residual stream (LN stats stay f32)
        row_attn = PerformerSelfAttention(
            dim=self.d_pair,
            heads=self.n_heads,
            dim_head=self.performer_dim_head,
            p_dropout=self.p_dropout,
            generalized_attention=True,
            feature_seed=self.feature_seed,
            chunk_rows=self.long_chunk,
            attn_impl=self.attn_impl,
            attend_axis=1,  # RowWise; fused path reads strided, no swapaxes
            fused_favor_min_l=self.fused_favor_min_l,
            dtype=self.dtype,
            name="row_attn",
        )
        col_attn = PerformerSelfAttention(
            dim=self.d_pair,
            heads=self.n_heads,
            dim_head=self.performer_dim_head,
            p_dropout=self.p_dropout,
            generalized_attention=True,
            feature_seed=self.feature_seed + 1,
            chunk_rows=self.long_chunk,
            attn_impl=self.attn_impl,
            fused_favor_min_l=self.fused_favor_min_l,
            dtype=self.dtype,
            name="col_attn",
        )

        ln_row = nn.LayerNorm(epsilon=LN_EPS, name="ln_row")
        ln_col = nn.LayerNorm(epsilon=LN_EPS, name="ln_col")
        # RowWise (reference :44-54): attend over axis 1 (i) for each fixed j.
        # attend_axis=1 keeps the (B, i, j, d) layout end to end; on the fused
        # path the kernel reads/writes strided blocks and the swapaxes pair
        # (a full HBM round trip of the pair map each way) never exists.
        if self.attn_impl == "pallas":
            # Hand the LN params to the attention module: on the fused path
            # the pre-LN AND the residual add fold into the Pallas kernel
            # (the separate LN-statistics and residual passes over the pair
            # stream — ~350 ms/forward at L=1024 in profiles/l1024_r3b —
            # never exist). The module keeps the same x + attn(LN(x))
            # contract off the fused path.
            def lnp(ln):
                _ = ln(jnp.zeros((1, self.d_pair), jnp.float32))  # bind
                p = ln.variables["params"]
                return (p["scale"], p["bias"], LN_EPS)

            x = row_attn(x, deterministic=deterministic, ln_params=lnp(ln_row))
            x = col_attn(x, deterministic=deterministic, ln_params=lnp(ln_col))
        else:
            y = ln_row(x)
            x = x + row_attn(y, deterministic=deterministic)

            # ColWise: attend over axis 2 (j) for each fixed i.
            y = ln_col(x)
            x = x + col_attn(y, deterministic=deterministic)

        ln_ff = nn.LayerNorm(epsilon=LN_EPS, name="ln_ff")
        ff = FeedForward(self.d_pair, self.d_ff, self.p_dropout, dtype=self.dtype,
                         name="ff")
        L = x.shape[1]
        if (self.attn_impl == "pallas" and L >= self.ff_fused_min_l
                and (deterministic or self.p_dropout == 0.0)):
            # Fused pre-LN FF residual: LN, both GEMMs, ReLU, residual in one
            # Pallas pass — the (L*L, d_ff) hidden never exists in HBM
            # (ops/pallas/fused_ff.py), and the kernel is O(tile) memory so
            # the ff_chunk long-L workaround is unnecessary on this path.
            from ..ops.pallas.fused_ff import fused_ln_ff_residual

            _ = ln_ff(jnp.zeros((1, self.d_pair), jnp.float32))  # bind
            _ = ff(jnp.zeros((1, self.d_pair), x.dtype))  # bind (DCE'd)
            lp = ln_ff.variables["params"]
            fp = ff.variables["params"]
            cdt = self.dtype or x.dtype
            return fused_ln_ff_residual(
                x, lp["scale"].astype(jnp.float32),
                lp["bias"].astype(jnp.float32),
                fp["fc1"]["kernel"].astype(cdt),
                fp["fc1"]["bias"].astype(jnp.float32),
                fp["fc2"]["kernel"].astype(cdt),
                fp["fc2"]["bias"].astype(jnp.float32),
                LN_EPS,
            )
        if self.ff_chunk is not None and L > self.ff_chunk and deterministic:
            c = self.ff_chunk
            out = jnp.zeros(x.shape, x.dtype)
            for i in range(0, L, c):
                o = x[:, i: i + c] + ff(ln_ff(x[:, i: i + c]),
                                        deterministic=True)
                out = out.at[:, i: i + c].set(o.astype(x.dtype))
            return out
        return x + ff(ln_ff(x), deterministic=deterministic)


class PairUpdateWithAxialAttention(nn.Module):
    """N-layer axial attention stack (reference :531-547)."""

    d_pair: int
    d_ff: int
    n_heads: int = 8
    p_dropout: float = 0.1
    n_encoder_layers: int = 4
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    long_chunk: Optional[int] = None
    ff_chunk: Optional[int] = None
    fused_favor_min_l: Optional[int] = None
    ff_fused_min_l: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.n_encoder_layers):
            x = PairUpdateWithAxialAttentionLayer(
                self.d_pair,
                self.d_ff,
                self.n_heads,
                self.p_dropout,
                feature_seed=self.feature_seed + 2 * i,
                performer_dim_head=self.performer_dim_head,
                attn_impl=self.attn_impl,
                long_chunk=self.long_chunk,
                ff_chunk=self.ff_chunk,
                fused_favor_min_l=self.fused_favor_min_l,
                ff_fused_min_l=self.ff_fused_min_l,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
        return x
