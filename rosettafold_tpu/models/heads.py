"""Prediction head: 6D inter-residue geometry logits.

Re-design of /root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1130-1172.
Everything stays NHWC (channels-last); theta/phi read the asymmetric pair map,
dist/omega the symmetrized one. Four dilated-conv ResNet towers.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNet


class PredictionHead(nn.Module):
    """pair (B, L, L, C) -> dict of logits:
    theta (37), phi (19) from asymmetric; dist (37), omega (37) from symmetrized.

    row_chunk: long-L inference mode — the ResNet towers run row-chunked with
    exact conv halos (models/resnet.py); required at L >= 2048 where the
    unchunked conv temporaries alone exceed HBM."""

    in_channels: int
    n_res_blocks: int = 4
    p_dropout: float = 0.1
    dtype: Any = None
    row_chunk: Optional[int] = None
    conv_impl: str = "xla"
    # Checkpoint each tower AND each ResBlock within it (training). A single
    # head-level remat unit recomputes all four towers before backprop, so
    # every tower's (L, L, C) block intermediates coexist — the dominant HBM
    # cost of the L=512 train step. Per-tower/per-block remat serializes that.
    remat_towers: bool = False

    @nn.compact
    def __call__(self, pair, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, name="proj_ln")(pair)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)

        tower_cls = (nn.remat(ResNet, static_argnums=(2,))
                     if self.remat_towers else ResNet)

        def head(n_bins, name):
            return tower_cls(
                self.n_res_blocks,
                self.in_channels,
                self.in_channels,
                n_bins,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                row_chunk=self.row_chunk,
                conv_impl=self.conv_impl,
                remat_blocks=self.remat_towers,
                name=name,
            )

        logits = {}
        logits["theta"] = head(37, "theta_head")(x, deterministic)
        logits["phi"] = head(19, "phi_head")(x, deterministic)

        x_sym = 0.5 * (x + jnp.swapaxes(x, 1, 2))
        logits["dist"] = head(37, "dist_head")(x_sym, deterministic)
        logits["omega"] = head(37, "omega_head")(x_sym, deterministic)
        return logits
