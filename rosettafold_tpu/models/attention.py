"""Shared attention / feed-forward building blocks."""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn

from .dropout import Dropout
import jax.numpy as jnp

from ..ops import performer as favor

# Fused-FAVOR+ crossover default, read ONCE at import (the value is baked into
# the jitted graph at trace time, so a late env change could never take effect
# anyway; prefer the fused_favor_min_l module attribute for programmatic
# control). Measured crossover (BENCHMARKS.md, round 3): the fully fused
# layer kernel (ops/pallas/fused_performer.py) beats XLA from L=128 up —
# in-context at the L=128 headline config the XLA path's per-head
# (B, L, L, h, dh) maps and their layout copies cost ~8% of the whole
# forward (profiles/l128_r3) — and it is the only feasible path at L >= 2048.
DEFAULT_FUSED_FAVOR_MIN_L = int(os.environ.get("RFTPU_FUSED_FAVOR_MIN_L", "128"))


class FeedForward(nn.Module):
    """Linear -> ReLU -> Dropout -> Linear (reference rosettafold_pytorch.py:270-281)."""

    d_emb: int
    d_ff: int
    p_dropout: float = 0.1
    dtype: Any = None  # compute dtype for the matmuls (None = f32)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.d_ff, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = Dropout(self.p_dropout)(x, deterministic=deterministic)
        return nn.Dense(self.d_emb, dtype=self.dtype, name="fc2")(x)


class PerformerSelfAttention(nn.Module):
    """FAVOR+ self-attention over the second-to-last axis.

    Drop-in for performer-pytorch's SelfAttention as used by the reference
    (rosettafold_pytorch.py:313-318,505-518): separate q/k/v projections to
    heads*dim_head (dim_head=64 by default, independent of `dim`), fixed random
    feature projection, output projection back to `dim`, dropout on the output.

    Input: (..., L, dim) -> (..., L, dim); leading axes are all batch.
    """

    dim: int
    heads: int
    dim_head: int = 64
    nb_features: Optional[int] = None
    generalized_attention: bool = False
    p_dropout: float = 0.0
    feature_seed: int = 42
    kernel_eps: float = 1e-3
    softmax_eps: float = 1e-4
    # max rows (second-to-last batch axis) per chunk: bounds the FAVOR+ feature
    # tensors (rows, h, L, nb_features) for the long-sequence axial path
    chunk_rows: Optional[int] = None
    # "xla": einsum FAVOR+ (materializes the (rows, L, m) feature maps).
    # "pallas": fused kernel for the generalized (ReLU) mode — phi never leaves
    # VMEM, ~5x less HBM traffic at config-4 shapes (ops/pallas/linear_attention).
    attn_impl: str = "xla"
    # L at/above which attn_impl="pallas" actually uses the fused kernel
    # (None = DEFAULT_FUSED_FAVOR_MIN_L, i.e. RFTPU_FUSED_FAVOR_MIN_L at import)
    fused_favor_min_l: Optional[int] = None
    # -2 (default): attend over the second-to-last axis. 1: attend over axis 1
    # of a 4D (B, L1, L2, D) input — the RowWise axial step — with the
    # transpose folded into the fused kernel's strided block reads (no
    # swapaxes HBM round trip; falls back to swapaxes off the fused path).
    attend_axis: int = -2
    dtype: Any = None  # compute dtype for projections/feature matmuls

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, ln_params=None):
        """With ln_params=(scale, bias, eps) the module computes the WHOLE
        pre-LN residual step `x + dropout(attn(LayerNorm(x)))` — on the fused
        path the LayerNorm and the residual add are folded into the Pallas
        kernel (one HBM read of x, one write of out; the separate LN and
        residual elementwise passes over the pair stream never exist)."""
        assert self.attend_axis in (-2, 1)
        if self.attend_axis == 1:
            assert x.ndim == 4
        inner = self.heads * self.dim_head
        m = self.nb_features or favor.default_nb_features(self.dim_head)
        # Fixed (untrained) random-feature projection, embedded as a constant.
        projection = jnp.asarray(
            favor.gaussian_orthogonal_matrix(m, self.dim_head, seed=self.feature_seed)
        )

        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")

        def split_heads(t):  # (..., L, h*dh) -> (..., h, L, dh)
            t = t.reshape(*t.shape[:-1], self.heads, self.dim_head)
            return jnp.moveaxis(t, -2, -3)

        # Fully fused layer kernel (ops/pallas/fused_performer.py): one Pallas
        # program per row-problem computes the q/k/v projections, per-head
        # FAVOR+, and the output projection entirely in VMEM — no per-head
        # (P, L, dh) HBM transposes ever exist. Measured on v5e at config-4
        # shapes: 38.9 ms vs 62.6 ms XLA at L=1024 (67 TFLOP/s = 59% of the
        # measured ceiling); in-context crossover at L=128 (headline bench
        # 185.7k -> 201.7k pairs/s). At L >= 2048 the XLA path's phi maps
        # (~21 GB) exceed HBM and the kernel is the only feasible path.
        # Tune via fused_favor_min_l / RFTPU_FUSED_FAVOR_MIN_L.
        min_l = (
            self.fused_favor_min_l
            if self.fused_favor_min_l is not None
            else DEFAULT_FUSED_FAVOR_MIN_L
        )
        attended_len = x.shape[self.attend_axis if self.attend_axis == 1 else -2]
        use_fused = (
            self.attn_impl == "pallas"
            and self.generalized_attention
            and attended_len >= min_l
        )
        fold_lnres = (
            ln_params is not None
            and use_fused
            and (deterministic or self.p_dropout == 0.0)
        )
        # Residual contract: when ln_params is set, EVERY return path below
        # yields x + dropout(attn(LN(x))) — folded into the Pallas kernel on
        # the fold_lnres path, applied explicitly right here otherwise.
        g = b = eps = None
        if ln_params is not None:
            g, b, eps = ln_params
        residual_in = None
        if ln_params is not None and not fold_lnres:
            from ..ops.pallas.fused_performer import _ln

            residual_in = x
            x = _ln(x, g, b, eps).astype(x.dtype)

        def finish(out):
            out = Dropout(self.p_dropout)(out, deterministic=deterministic)
            return out if residual_in is None else residual_in + out

        if use_fused:
            from ..ops.pallas.fused_performer import (
                fused_ln_performer_residual,
                fused_ln_performer_residual_axis1,
                fused_performer_layer,
                fused_performer_layer_axis1,
            )

            cdt = self.dtype or x.dtype
            # Bind the projection submodules on dummy inputs (results unused
            # -> DCE'd by XLA) so the fused path reads the same parameters
            # under the same names as the XLA path.
            _ = to_q(jnp.zeros((1, self.dim), x.dtype))
            _ = to_k(jnp.zeros((1, self.dim), x.dtype))
            _ = to_v(jnp.zeros((1, self.dim), x.dtype))
            _ = to_out(jnp.zeros((1, inner), x.dtype))
            wq = to_q.variables["params"]["kernel"].astype(cdt)
            wk = to_k.variables["params"]["kernel"].astype(cdt)
            wv = to_v.variables["params"]["kernel"].astype(cdt)
            wo = to_out.variables["params"]["kernel"].astype(cdt)
            bo = to_out.variables["params"]["bias"].astype(cdt)
            # Strided axis-1 reads measured 1.03x at L=128 but 0.93-0.96x at
            # L>=512 (the in-VMEM (L, 8, D)->(8, L, D) relayout + short-burst
            # DMA outweigh the saved swapaxes round trip at long L).
            if fold_lnres:
                g = g.astype(jnp.float32)
                b = b.astype(jnp.float32)
            if (self.attend_axis == 1 and x.shape[1] % 128 == 0
                    and x.shape[2] % 8 == 0 and x.shape[1] <= 256):
                # RowWise without the HBM transpose: strided block reads
                if fold_lnres:
                    return fused_ln_performer_residual_axis1(
                        x.astype(cdt), g, b, wq, wk, wv, wo, bo,
                        projection, self.dim_head**-0.25, self.kernel_eps,
                        self.heads, self.dim_head, eps,
                    )
                out = fused_performer_layer_axis1(
                    x.astype(cdt), wq, wk, wv, wo, bo,
                    projection, self.dim_head**-0.25, self.kernel_eps,
                    self.heads, self.dim_head,
                )
                return finish(out)
            xr = jnp.swapaxes(x, 1, 2) if self.attend_axis == 1 else x
            lead, L = xr.shape[:-2], xr.shape[-2]
            from ..parallel.mesh import tp_shard_map

            # under a tp>1 mesh: split the row-problem axis over 'tp'
            # (zero collectives — each row's layer is independent); the
            # whole-layer weights are replicated within the tp group
            if fold_lnres:
                out = tp_shard_map(
                    lambda x3, g_, b_, *w: fused_ln_performer_residual(
                        x3, g_, b_, *w, self.dim_head**-0.25,
                        self.kernel_eps, self.heads, self.dim_head, eps,
                    ),
                    xr.astype(cdt).reshape(-1, L, self.dim),
                    g, b, wq, wk, wv, wo, bo, projection,
                    shard=(0,),
                ).reshape(*lead, L, self.dim)
            else:
                out = tp_shard_map(
                    lambda x3, *w: fused_performer_layer(
                        x3, *w, self.dim_head**-0.25, self.kernel_eps,
                        self.heads, self.dim_head,
                    ),
                    xr.astype(cdt).reshape(-1, L, self.dim),
                    wq, wk, wv, wo, bo, projection,
                    shard=(0,),
                ).reshape(*lead, L, self.dim)
            if self.attend_axis == 1:
                out = jnp.swapaxes(out, 1, 2)
            return out if fold_lnres else finish(out)

        if self.attend_axis == 1:
            x = jnp.swapaxes(x, 1, 2)  # XLA fallback: explicit transpose

        def block(xc):
            q, k, v = split_heads(to_q(xc)), split_heads(to_k(xc)), split_heads(to_v(xc))
            out = favor.favor_attention(
                q,
                k,
                v,
                projection,
                generalized=self.generalized_attention,
                kernel_eps=self.kernel_eps,
                softmax_eps=self.softmax_eps,
            )
            out = jnp.moveaxis(out, -3, -2)  # (..., L, h, dh)
            return to_out(out.reshape(*out.shape[:-2], inner))

        c = self.chunk_rows
        if c is not None and x.ndim >= 3 and x.shape[-3] > c:
            rows = x.shape[-3]
            outs = [
                block(x[..., i : i + c, :, :]) for i in range(0, rows, c)
            ]
            out = jnp.concatenate(outs, axis=-3)
        else:
            out = block(x)
        if self.attend_axis == 1:
            out = jnp.swapaxes(out, 1, 2)
        return finish(out)
