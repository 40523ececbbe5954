"""Recompute-friendly dropout (models/dropout.py): bit-parity with
flax.linen.Dropout and mask-consistent gradients.

The module exists for training memory — its custom VJP saves only the PRNG
key and regenerates the bernoulli mask in backward (BENCHMARKS.md round-4
L=512 HBM analysis attributed ~1.1 GB to saved dropout masks/bits). These
tests pin the contract that makes the swap free: same rng stream, same mask,
same apply as nn.Dropout; grads flow exactly through the kept elements.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.models.dropout import Dropout, _dropout


@pytest.mark.parametrize("rate", [0.1, 0.5, 0.9])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("min_elems", [0, 1 << 24])
def test_matches_flax_dropout_bitwise(rate, dtype, min_elems):
    """Both the recompute path (min_elems=0 forces it at toy sizes) and the
    inline path must equal nn.Dropout bit-for-bit under the same key."""
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 17, 9)).astype(dtype)
    key = jax.random.PRNGKey(7)
    a = Dropout(rate, recompute_min_elems=min_elems).apply(
        {}, x, False, rngs={"dropout": key})
    b = nn.Dropout(rate).apply({}, x, deterministic=False, rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deterministic_and_zero_rate_passthrough():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5))
    np.testing.assert_array_equal(
        np.asarray(Dropout(0.5).apply({}, x, True)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(Dropout(0.0).apply({}, x, False)), np.asarray(x))


def test_grad_uses_recomputed_mask():
    """dL/dx must be nonzero exactly where the forward kept the element, with
    the same 1/keep_prob scaling — i.e. the backward's regenerated mask equals
    the forward's."""
    rate = 0.3
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 33))
    key = jax.random.PRNGKey(3)

    def loss(x):
        y = _dropout(x, key, rate)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(x)
    y = _dropout(x, key, rate)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(2.0 * y / (1.0 - rate)), rtol=1e-6)


def test_grad_matches_flax_dropout_grad():
    rate = 0.25
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 21))
    key = jax.random.PRNGKey(5)

    def loss_ours(x):
        # recompute path forced on at toy size
        return jnp.sum(Dropout(rate, recompute_min_elems=0).apply(
            {}, x, False, rngs={"dropout": key}) ** 2)

    def loss_flax(x):
        return jnp.sum(nn.Dropout(rate).apply(
            {}, x, deterministic=False, rngs={"dropout": key}) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_ours)(x)),
        np.asarray(jax.grad(loss_flax)(x)), rtol=1e-6)


def test_no_mask_residual_saved():
    """The point of the module: the custom VJP's saved residual is the key,
    not a mask. Inspect the jaxpr of vjp — no input-shaped f32/bool residual
    may cross the forward/backward boundary."""
    rate = 0.5
    x = jnp.ones((64, 128), jnp.float32)
    key = jax.random.PRNGKey(0)
    _, vjp = jax.vjp(lambda x: _dropout(x, key, rate), x)
    # residuals live in the vjp closure; the only array-valued constants
    # allowed are key-sized (uint32 scalars/pairs), not (64, 128) masks
    leaves = jax.tree_util.tree_leaves(vjp)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            assert np.prod(leaf.shape) <= 4, (
                f"unexpected saved residual of shape {leaf.shape}")
