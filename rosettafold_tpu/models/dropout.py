"""Recompute-friendly dropout.

The L=512 train-step HBM analysis (BENCHMARKS.md, round 4) attributed ~1.1 GB
of the single-chip overshoot to u32 random-bit / mask buffers held live for
the backward pass across the model's 16 dropout sites. This module is a
drop-in for `flax.linen.Dropout` whose backward re-derives the mask from the
PRNG key instead of saving it: the custom-VJP residual is the (tiny) key, and
the backward regenerates the bernoulli bits — a few extra VPU ops per site in
exchange for zero saved mask state, independent of where remat boundaries
fall.

Numerics are bit-identical to `nn.Dropout`: same `make_rng('dropout')` stream
consumption (a key is only drawn when `rate > 0` and not deterministic), same
`bernoulli(rng, keep_prob, shape)` mask, same `select(mask, x / keep_prob, 0)`
apply. The reference applies torch `nn.Dropout` in the same positions
(rosettafold_pytorch.py:18-28,270-281 and throughout).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout(x, rng, rate):
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep_prob, shape=x.shape)
    return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _dropout_fwd(x, rng, rate):
    return _dropout(x, rng, rate), rng


def _dropout_bwd(rate, rng, g):
    keep_prob = 1.0 - rate
    # same key, same shape -> same mask as the forward
    mask = jax.random.bernoulli(rng, p=keep_prob, shape=g.shape)
    dx = jax.lax.select(mask, g / keep_prob, jnp.zeros_like(g))
    return dx, None


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


class Dropout(nn.Module):
    """Drop-in for nn.Dropout (no broadcast_dims — unused in this model).

    recompute_min_elems: tensors at or above this element count take the
    recompute-VJP path; smaller ones use the plain inline dropout (saved
    mask). The backward's extra RNG+select work measured ~5% of the L=128
    config-5 step (611.7 vs 580.8 ms) when applied everywhere, while the
    memory win lives almost entirely in the (L, L, C) pair-stream masks —
    at the default threshold (2^24 ~ 16.8M elements) every pair tensor at
    L >= 384 recomputes and everything at the L=128 flagship config keeps
    the fast path."""

    rate: float
    rng_collection: str = "dropout"
    recompute_min_elems: int = 1 << 24

    @nn.compact
    def __call__(self, inputs, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        rng = self.make_rng(self.rng_collection)
        if inputs.size >= self.recompute_min_elems:
            return _dropout(inputs, rng, float(self.rate))
        keep_prob = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, p=keep_prob, shape=inputs.shape)
        return jax.lax.select(mask, inputs / keep_prob,
                              jnp.zeros_like(inputs))
