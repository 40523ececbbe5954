"""2D dilated-conv ResNet (reference /root/reference/rosettafold_pytorch/resnet.py).

The reference runs NCHW Conv2d + InstanceNorm2d; here everything is NHWC
(B, L, L, C) so the channel axis is the fast (lane) axis on TPU and XLA lowers the
3x3 dilated convolutions straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
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
    (resnet.py:15-44)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    p_dropout: float = 0.15
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        k = (self.kernel_size, self.kernel_size)
        d = (self.dilation, self.dilation)
        y = nn.Conv(
            self.channels, k, kernel_dilation=d, padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = InstanceNorm2d(self.channels, name="in1")(y)
        y = nn.elu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = nn.Conv(
            self.channels, k, kernel_dilation=d, padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = InstanceNorm2d(self.channels, name="in2")(y)
        return nn.elu(x.astype(jnp.float32) + y)


class ResNet(nn.Module):
    """1x1 in-proj + IN + ELU; n blocks with dilation cycling; 1x1 out-proj
    (resnet.py:47-83). Input/output NHWC."""

    n_res_blocks: int
    in_channels: int
    intermediate_channels: int
    out_channels: int
    dilations: Tuple[int, ...] = (1, 2, 4, 8)
    p_dropout: float = 0.15
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(
            self.intermediate_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="proj_in",
        )(x)
        x = InstanceNorm2d(self.intermediate_channels, name="in_in")(x)
        x = nn.elu(x)
        for i in range(self.n_res_blocks):
            x = ResBlock2D(
                self.intermediate_channels,
                kernel_size=3,
                dilation=self.dilations[i % len(self.dilations)],
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic)
        return nn.Conv(self.out_channels, (1, 1), name="proj_out")(x)
