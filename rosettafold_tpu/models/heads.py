"""Prediction head: 6D inter-residue geometry logits.

Re-design of /root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1130-1172.
Everything stays NHWC (channels-last); theta/phi read the asymmetric pair map,
dist/omega the symmetrized one. Four dilated-conv ResNet towers.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .dropout import Dropout
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
    # Serialize the four towers' remat'd backwards only above this L:
    # serializing costs ~5% step time where memory has headroom (measured
    # 580.8 -> 607.6 ms/step at L=128 config-5). Overridable so tests can
    # force chaining on at toy sizes.
    chain_min_l: int = 256

    @nn.compact
    def __call__(self, pair, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, name="proj_ln")(pair)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj")(x)
        x = Dropout(self.p_dropout)(x, deterministic=deterministic)

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

        def chain(inp, prev):
            """Serialize the towers under remat: the four towers are data-
            independent, so XLA overlaps all four remat'd backward recomputes
            and their saved block boundaries coexist (18 x 192 MB of the
            L=512 train-step OOM). A runtime-zero derived from the previous
            tower's logits (isnan-guarded so the algebraic simplifier cannot
            fold the add away) makes each tower's input depend on the
            previous tower's output — backward then runs tower-by-tower.
            Forward value is unchanged (z == 0 for finite logits). Gated to
            L > chain_min_l (default 256): serializing costs ~5% step time
            where memory has headroom, and pays off only where the (L, L, C)
            boundaries dominate HBM."""
            if (not self.remat_towers or prev is None
                    or inp.shape[1] <= self.chain_min_l):
                return inp
            s = jnp.sum(prev.astype(jnp.float32))
            z = jnp.where(jnp.isnan(s), 1.0, 0.0).astype(inp.dtype)
            return inp + z

        logits = {}
        logits["theta"] = head(37, "theta_head")(x, deterministic)
        logits["phi"] = head(19, "phi_head")(
            chain(x, logits["theta"]), deterministic)

        x_sym = 0.5 * (x + jnp.swapaxes(x, 1, 2))
        logits["dist"] = head(37, "dist_head")(
            chain(x_sym, logits["phi"]), deterministic)
        logits["omega"] = head(37, "omega_head")(
            chain(x_sym, logits["dist"]), deterministic)
        return logits
