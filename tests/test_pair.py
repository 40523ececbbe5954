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


def test_outer_product_mean_fused_matches_xla():
    """Fused OPM kernel (LN folded into the projection) vs the module's XLA
    path — identical params, includes the weighted-y case."""
    B, N, L, u, Dp = 1, 3, 14, 8, 20
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, N, L, u))
    y = x * jax.nn.sigmoid(jax.random.normal(ks[1], (B, N, L, 1)))
    xla_mod = OuterProductMean(u, Dp)
    pal_mod = OuterProductMean(u, Dp, impl="pallas", fused_min_l=1)
    params = jinit(xla_mod, ks[2], x, y)
    a = japply(xla_mod, params, x, y)
    b = japply(pal_mod, params, x, y)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_outer_product_mean_fused_gradients():
    B, N, L, u, Dp = 1, 2, 10, 8, 12
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, N, L, u))
    y = jax.random.normal(ks[1], (B, N, L, u))
    xla_mod = OuterProductMean(u, Dp)
    pal_mod = OuterProductMean(u, Dp, impl="pallas", fused_min_l=1)
    params = jinit(xla_mod, ks[2], x, y)

    def loss(mod):
        return lambda p, x, y: jnp.sum(mod.apply(p, x, y) ** 2)

    ga = jax.jit(jax.grad(loss(xla_mod), argnums=(0, 1, 2)))(params, x, y)
    gb = jax.jit(jax.grad(loss(pal_mod), argnums=(0, 1, 2)))(params, x, y)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_outer_product_mean_fused_gradients_scan_bwd(monkeypatch):
    """The serialized (lax.scan) chunked backward — the long-L training path —
    including the ragged last chunk (L=10 with chunk 4 pads to 12)."""
    from rosettafold_tpu.ops.pallas import outer_product

    monkeypatch.setattr(outer_product, "_BWD_CHUNK", 4)
    B, N, L, u, Dp = 1, 2, 10, 8, 12
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (B, N, L, u))
    y = jax.random.normal(ks[1], (B, N, L, u))
    xla_mod = OuterProductMean(u, Dp)
    pal_mod = OuterProductMean(u, Dp, impl="pallas", fused_min_l=1)
    params = jinit(xla_mod, ks[2], x, y)

    def loss(mod):
        return lambda p, x, y: jnp.sum(mod.apply(p, x, y) ** 2)

    ga = jax.jit(jax.grad(loss(xla_mod), argnums=(0, 1, 2)))(params, x, y)
    gb = jax.jit(jax.grad(loss(pal_mod), argnums=(0, 1, 2)))(params, x, y)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_pair_update_with_msa_row_chunked_matches():
    """Decomposed resnet_in + row-chunked convs == the plain path."""
    B, N, L = 1, 3, 20
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, 16))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, 12))
    att = jax.random.normal(jax.random.PRNGKey(2), (B, L, L, 12))
    full = PairUpdateWithMsa(d_msa=16, d_proj=8, d_pair=12, n_heads=12)
    chunked = PairUpdateWithMsa(d_msa=16, d_proj=8, d_pair=12, n_heads=12,
                                row_chunk=6)
    p = jinit(full, jax.random.PRNGKey(3), msa, pair, att)
    a = japply(full, p, msa, pair, att)
    b = japply(chunked, p, msa, pair, att)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_axial_layer_ff_chunked_matches():
    """Row-chunked pre-LN FF residual == unchunked (pointwise, no halo)."""
    from rosettafold_tpu.models.pair import PairUpdateWithAxialAttentionLayer

    B, L, d = 1, 20, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, L, d))
    full = PairUpdateWithAxialAttentionLayer(d_pair=d, d_ff=4 * d, n_heads=4,
                                             performer_dim_head=8)
    chunked = PairUpdateWithAxialAttentionLayer(d_pair=d, d_ff=4 * d, n_heads=4,
                                                performer_dim_head=8, ff_chunk=6)
    p = jinit(full, jax.random.PRNGKey(1), x)
    a = japply(full, p, x)
    b = japply(chunked, p, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
