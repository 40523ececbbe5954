"""Shared attention / feed-forward building blocks."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import performer as favor


class FeedForward(nn.Module):
    """Linear -> ReLU -> Dropout -> Linear (reference rosettafold_pytorch.py:270-281)."""

    d_emb: int
    d_ff: int
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.d_ff, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        return nn.Dense(self.d_emb, name="fc2")(x)


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

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        m = self.nb_features or favor.default_nb_features(self.dim_head)
        # Fixed (untrained) random-feature projection, embedded as a constant.
        projection = jnp.asarray(
            favor.gaussian_orthogonal_matrix(m, self.dim_head, seed=self.feature_seed)
        )

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        def split_heads(t):  # (..., L, h*dh) -> (..., h, L, dh)
            t = t.reshape(*t.shape[:-1], self.heads, self.dim_head)
            return jnp.moveaxis(t, -2, -3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
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
        out = out.reshape(*out.shape[:-2], inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.p_dropout)(out, deterministic=deterministic)
