"""Pair-track tests mirroring /root/reference/tests/test_module.py:313-415."""

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu.utils.testing import japply, jinit, jinit_out
from rosettafold_tpu.models.pair import (
    OuterProductMean,
    PairUpdateWithAxialAttention,
    PairUpdateWithMsa,
    symmetrize,
)

B, N, L = 2, 5, 12


def test_outer_product_mean_shape():
    d_in, d_out = 8, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, d_in))
    mod = OuterProductMean(in_features=d_in, out_features=d_out)
    out, _ = jinit_out(mod, jax.random.PRNGKey(1), x)
    assert out.shape == (B, L, L, d_out)


def test_pair_update_with_msa_shape():
    d_msa, d_pair, d_proj, n_heads = 48, 24, 8, 4
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, d_msa))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, d_pair))
    att = jax.random.normal(jax.random.PRNGKey(2), (B, L, L, n_heads))
    mod = PairUpdateWithMsa(d_msa=d_msa, d_proj=d_proj, d_pair=d_pair, n_heads=n_heads)
    out, _ = jinit_out(mod, jax.random.PRNGKey(3), msa, pair, att)
    assert out.shape == (B, L, L, d_pair)


def test_pair_update_with_axial_attention_shape():
    d_pair = 24
    pair = jax.random.normal(jax.random.PRNGKey(0), (B, L, L, d_pair))
    mod = PairUpdateWithAxialAttention(
        d_pair=d_pair, d_ff=d_pair * 2, n_heads=4, n_encoder_layers=2
    )
    out, _ = jinit_out(mod, jax.random.PRNGKey(1), pair)
    assert out.shape == (B, L, L, d_pair)


def test_symmetrization():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, L, 7))
    s = symmetrize(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s.swapaxes(1, 2)), atol=1e-6)
    # already-symmetric input is a fixed point
    np.testing.assert_allclose(np.asarray(symmetrize(s)), np.asarray(s), atol=1e-6)
