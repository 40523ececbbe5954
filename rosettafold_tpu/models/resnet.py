"""2D dilated-conv ResNet (reference /root/reference/rosettafold_pytorch/resnet.py).

The reference runs NCHW Conv2d + InstanceNorm2d; here everything is NHWC
(B, L, L, C) so the channel axis is the fast (lane) axis on TPU and XLA lowers the
3x3 dilated convolutions straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn

from .dropout import Dropout
import jax.numpy as jnp


class InstanceNorm2d(nn.Module):
    """InstanceNorm over the two spatial axes, affine, eps=1e-6 (resnet.py:28,39).

    Input NHWC (B, H, W, C); normalization is per (sample, channel) over (H, W),
    with biased variance — matching torch.nn.InstanceNorm2d semantics.
    """

    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)  # normalization statistics always in f32
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return y * scale + bias


class ResBlock2D(nn.Module):
    """conv3x3(dilated) -> IN -> ELU -> Dropout -> conv3x3 -> IN, residual, outer ELU
    (resnet.py:15-44).

    row_chunk: long-L inference mode — both convolutions run row-chunked with
    an exact `dilation`-row halo; IN statistics are computed globally over the
    full raw conv output and their affine application is fused into the next
    chunk read, so outputs equal the unchunked path while per-conv temporaries
    shrink from O(L^2 C) to O(chunk L C). (At L=2048 the unchunked prediction
    head holds 6 x 3 GB conv temps and exceeds HBM — BENCHMARKS.md.)"""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    p_dropout: float = 0.15
    dtype: Any = None
    row_chunk: Optional[int] = None
    # "pallas": fused shifted-GEMM conv kernel (ops/pallas/conv3x3.py) for
    # H >= fused_min_l — 2.2x over the XLA conv at L=1024, +9% e2e at L=128 (BENCHMARKS.md)
    conv_impl: str = "xla"
    fused_min_l: int = 128

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = (self.kernel_size, self.kernel_size)
        d = (self.dilation, self.dilation)
        conv1 = nn.Conv(
            self.channels, k, kernel_dilation=d, padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv1",
        )
        conv2 = nn.Conv(
            self.channels, k, kernel_dilation=d, padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )
        H = x.shape[1]
        cdt = self.dtype or jnp.float32
        tile = None
        if (self.conv_impl == "pallas" and self.kernel_size == 3
                and H >= self.fused_min_l):
            from ..ops.pallas.conv3x3 import conv3x3_fused, pick_tile

            # None when no row-tile fits VMEM (e.g. dilation-8 at L=2048):
            # fall through to the XLA paths below
            tile = pick_tile(H, x.shape[2], self.channels, self.channels,
                             self.dilation, jnp.dtype(cdt).itemsize)
        if tile is not None:
            # bind the convs on dummies (DCE'd) to create/read their params
            _ = conv1(jnp.zeros((1, 8, 8, self.channels), x.dtype))
            _ = conv2(jnp.zeros((1, 8, 8, self.channels), x.dtype))
            k1 = conv1.variables["params"]["kernel"]
            k2 = conv2.variables["params"]["kernel"]
            y1 = conv3x3_fused(x.astype(cdt), k1, None, self.dilation, cdt, tile)
            in1 = _InStats(self.channels, name="in1", return_affine=True)
            inv1, shift1 = in1(y1)
            if deterministic:
                # IN-affine + ELU fused into the conv2 read (VMEM only)
                y2 = conv3x3_fused(y1, k2, (inv1, shift1), self.dilation,
                                   cdt, tile)
            else:
                a = nn.elu(y1.astype(jnp.float32) * inv1[:, None, None, :]
                           + shift1[:, None, None, :])
                a = Dropout(self.p_dropout)(a, deterministic=False)
                y2 = conv3x3_fused(a.astype(cdt), k2, None, self.dilation,
                                   cdt, tile)
            in2 = _InStats(self.channels, name="in2", return_affine=True)
            inv2, shift2 = in2(y2)
            out_dt = self.dtype or jnp.float32
            c = self.row_chunk
            if c is not None and H > c:
                out = jnp.zeros(y2.shape, out_dt)
                for i0 in range(0, H, c):
                    i1 = min(i0 + c, H)
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
        if self.row_chunk is not None and x.shape[1] > self.row_chunk:
            assert deterministic, "row-chunked ResBlock2D is an inference path"
            c = self.row_chunk
            y1 = _conv_rows(conv1, x, self.dilation, c)
            in1 = _InStats(self.channels, name="in1")(y1)
            pre1 = lambda t: nn.elu(in1(t))
            y2 = _conv_rows(conv2, y1, self.dilation, c, pre=pre1)
            in2 = _InStats(self.channels, name="in2")(y2)
            # residual+ELU row-chunked too: the full-tensor f32 add was the
            # single largest HBM temp at L=2048 (4.5 GB; OOM report in
            # BENCHMARKS.md) — per-chunk f32 math, bf16 out buffer
            out_dt = self.dtype or jnp.float32
            out = jnp.zeros(y2.shape, out_dt)
            H = x.shape[1]
            for i0 in range(0, H, c):
                i1 = min(i0 + c, H)
                o = nn.elu(x[:, i0:i1].astype(jnp.float32) + in2(y2[:, i0:i1]))
                out = out.at[:, i0:i1].set(o.astype(out_dt))
            return out
        y = conv1(x)
        y = InstanceNorm2d(self.channels, name="in1")(y)
        y = nn.elu(y)
        y = Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = conv2(y)
        y = InstanceNorm2d(self.channels, name="in2")(y)
        out = nn.elu(x.astype(jnp.float32) + y)
        return out if self.dtype is None else out.astype(self.dtype)


class _InStats(nn.Module):
    """InstanceNorm2d with the statistics/apply steps split, for the
    row-chunked ResNet path: stats are computed once over the FULL raw conv
    output (exact global (H, W) normalization), the affine application is
    then fused into each chunk's read."""

    channels: int
    eps: float = 1e-6
    # True: return the (inv, shift) affine pair as (B, C) arrays instead of
    # the apply closure (the fused Pallas conv folds them into its read)
    return_affine: bool = False

    @nn.compact
    def __call__(self, y_raw):
        yf = y_raw.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(1, 2), keepdims=True)
        var = jnp.var(yf, axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        inv = scale / jnp.sqrt(var + self.eps)  # (B,1,1,C)
        shift = bias - mean * inv
        if self.return_affine:
            return inv[:, 0, 0, :], shift[:, 0, 0, :]

        def apply(t):
            return t.astype(jnp.float32) * inv + shift

        return apply


def _conv_rows(conv, x, dilation: int, chunk: int, pre=None):
    """Apply a 3x3 (dilated) SAME conv row-chunked with an exact halo of
    `dilation` rows; `pre` is an elementwise fn (IN apply + activation) fused
    into each chunk's read. Results are exactly equal to conv(pre(x))."""
    H, dt = x.shape[1], x.dtype
    # accumulate via in-place dynamic-update-slices, NOT concatenate: XLA
    # keeps every chunk buffer alive until a concat (3 x 1.5 GB of 2.7x-padded
    # temps at L=2048), while .at[].set chains alias one output buffer
    out = None
    for i0 in range(0, H, chunk):
        i1 = min(i0 + chunk, H)
        lo, hi = max(0, i0 - dilation), min(H, i1 + dilation)
        xs = x[:, lo:hi]
        if pre is not None:
            xs = pre(xs).astype(dt)
        y = conv(xs)[:, i0 - lo: i0 - lo + (i1 - i0)]
        if out is None:
            out = jnp.zeros((y.shape[0], H) + y.shape[2:], y.dtype)
        out = out.at[:, i0:i1].set(y)
    return out


class ResNet(nn.Module):
    """1x1 in-proj + IN + ELU; n blocks with dilation cycling; 1x1 out-proj
    (resnet.py:47-83). Input/output NHWC.

    row_chunk: long-sequence inference mode — convolutions run row-chunked
    with exact dilation halos and InstanceNorm statistics computed globally
    over the full raw conv output, so results equal the unchunked path while
    per-op temporaries shrink from O(L^2 C) to O(chunk * L * C). (At L=2048
    the unchunked head's conv temps are 6 x 3 GB and exceed HBM; BENCHMARKS.)
    Chunked mode requires deterministic=True (inference)."""

    n_res_blocks: int
    in_channels: int
    intermediate_channels: int
    out_channels: int
    dilations: Tuple[int, ...] = (1, 2, 4, 8)
    p_dropout: float = 0.15
    dtype: Any = None
    row_chunk: Optional[int] = None
    conv_impl: str = "xla"
    # Checkpoint each ResBlock2D (training): a whole remat'd tower backward
    # otherwise keeps every block's (L, L, C) intermediates alive at once —
    # the dominant HBM cost of the L=512 train step after the conv-transpose
    # fix. Per-block remat bounds the peak to one block's internals plus the
    # inter-block boundary activations.
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(
            self.intermediate_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="proj_in",
        )(x)
        if self.row_chunk is not None and x.shape[1] > self.row_chunk:
            # chunked IN apply + ELU: same stats/apply split as the blocks, so
            # no full-tensor f32 materialization after proj_in (param tree is
            # identical — _InStats and InstanceNorm2d share scale/bias names)
            in_in = _InStats(self.intermediate_channels, name="in_in")(x)
            out_dt = self.dtype or jnp.float32
            y = jnp.zeros(x.shape, out_dt)
            for i0 in range(0, x.shape[1], self.row_chunk):
                i1 = min(i0 + self.row_chunk, x.shape[1])
                y = y.at[:, i0:i1].set(nn.elu(in_in(x[:, i0:i1])).astype(out_dt))
            x = y
        else:
            x = InstanceNorm2d(self.intermediate_channels, name="in_in")(x)
            x = nn.elu(x)
            if self.dtype is not None:
                x = x.astype(self.dtype)
        block_cls = (nn.remat(ResBlock2D, static_argnums=(2,))
                     if self.remat_blocks else ResBlock2D)
        for i in range(self.n_res_blocks):
            x = block_cls(
                self.intermediate_channels,
                kernel_size=3,
                dilation=self.dilations[i % len(self.dilations)],
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                row_chunk=self.row_chunk,
                conv_impl=self.conv_impl,
                name=f"block_{i}",
            )(x, deterministic)
        return nn.Conv(self.out_channels, (1, 1), name="proj_out")(x)
