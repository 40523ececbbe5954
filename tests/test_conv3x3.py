"""Fused Pallas 3x3 conv kernel vs the XLA conv (and its gradients)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.ops.pallas.conv3x3 import (
    conv3x3_fused,
    shifted_gemm_conv,
    xla_reference,
)


def _data(B=2, H=16, W=16, C=8, Co=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, C, Co), jnp.float32) * 0.1
    inv = jax.random.normal(ks[2], (B, C), jnp.float32) * 0.5 + 1.0
    shift = jax.random.normal(ks[3], (B, C), jnp.float32) * 0.1
    return x, w, inv, shift


@pytest.mark.parametrize("dilation", [1, 2, 4, 8])
@pytest.mark.parametrize("with_pre", [False, True])
def test_matches_xla_conv(dilation, with_pre):
    x, w, inv, shift = _data()
    pre = (inv, shift) if with_pre else None
    got = conv3x3_fused(x, w, pre, dilation, jnp.float32, 8)
    want = xla_reference(x, w, pre, dilation, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_matches_flax_conv():
    import flax.linen as nn

    x, w, _, _ = _data(B=1, H=24, W=24, C=4, Co=6, seed=1)
    conv = nn.Conv(6, (3, 3), kernel_dilation=(2, 2), padding="SAME",
                   use_bias=False)
    params = {"params": {"kernel": w}}
    want = conv.apply(params, x)
    got = conv3x3_fused(x, w, None, 2, jnp.float32, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("dilation", [1, 2, 8])
@pytest.mark.parametrize("with_pre", [False, True])
def test_shifted_gemm_matches_xla_conv(dilation, with_pre):
    """shifted_gemm_conv (the conv-op-free form the custom VJP recomputes
    through — its transpose has none of lax.conv's space-to-depth temps)
    equals the XLA conv in forward AND gradients."""
    x, w, inv, shift = _data()
    pre = (inv, shift) if with_pre else None
    got = shifted_gemm_conv(x, w, pre, dilation, jnp.float32)
    want = xla_reference(x, w, pre, dilation, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss(fn, x_, w_, i_, s_):
        p = (i_, s_) if with_pre else None
        return jnp.sum(jnp.sin(fn(x_, w_, p, dilation, jnp.float32)))

    g1 = jax.grad(functools.partial(loss, shifted_gemm_conv),
                  argnums=(0, 1, 2, 3))(x, w, inv, shift)
    g2 = jax.grad(functools.partial(loss, xla_reference),
                  argnums=(0, 1, 2, 3))(x, w, inv, shift)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_nondivisible_height_asserts():
    x, w, _, _ = _data(H=12)
    with pytest.raises(AssertionError):
        conv3x3_fused(x, w, None, 1, jnp.float32, 8)


@pytest.mark.parametrize("with_pre", [False, True])
def test_gradients_match_xla(with_pre):
    x, w, inv, shift = _data(B=1, H=8, W=8, C=4, Co=4)
    pre = (inv, shift) if with_pre else None

    def loss_fused(x_, w_, i_, s_):
        p = (i_, s_) if with_pre else None
        return jnp.sum(jnp.sin(conv3x3_fused(x_, w_, p, 2, jnp.float32, 8)))

    def loss_xla(x_, w_, i_, s_):
        p = (i_, s_) if with_pre else None
        return jnp.sum(jnp.sin(xla_reference(x_, w_, p, 2, jnp.float32)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, inv, shift)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, inv, shift)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("with_pre", [False, True])
def test_bf16_training_grads(with_pre):
    """Regression: bf16 activations + f32 weights + f32 output (the resnet
    training configuration at L>=256) must differentiate — the backward
    recompute once paired a f32 cotangent with bf16 weights inside the conv
    transpose and raised. Grads must also track an all-f32 reference to
    bf16 rounding tolerance."""
    x, w, inv, shift = _data(B=1, H=8, W=8, C=4, Co=4)
    xb = x.astype(jnp.bfloat16)

    def loss_fused(x_, w_, i_, s_):
        p = (i_, s_) if with_pre else None
        return jnp.sum(jnp.sin(conv3x3_fused(x_, w_, p, 1, jnp.float32, 8)))

    def loss_f32(x_, w_, i_, s_):
        p = (i_, s_) if with_pre else None
        return jnp.sum(jnp.sin(xla_reference(
            x_.astype(jnp.float32), w_, p, 1, jnp.float32)))

    g1 = jax.grad(loss_fused, argnums=(1, 2, 3))(xb, w, inv, shift)
    g2 = jax.grad(loss_f32, argnums=(1, 2, 3))(xb, w, inv, shift)
    for a, b in zip(g1, g2):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.05, rtol=0.05)


def test_bf16_out_dtype():
    x, w, _, _ = _data()
    got = conv3x3_fused(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        None, 1, jnp.bfloat16, 8)
    want = xla_reference(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                         None, 1, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


class TestModuleIntegration:
    """conv_impl='pallas' matches the XLA path through the real modules."""

    def test_resblock2d_parity(self):
        from rosettafold_tpu.models.resnet import ResBlock2D

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
        ref = ResBlock2D(8, dilation=2)
        params = ref.init(jax.random.PRNGKey(1), x)
        want = ref.apply(params, x)
        fused = ResBlock2D(8, dilation=2, conv_impl="pallas", fused_min_l=8)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_resblock2d_training_grads(self):
        from rosettafold_tpu.models.resnet import ResBlock2D

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
        ref = ResBlock2D(4, p_dropout=0.25)
        fused = ResBlock2D(4, p_dropout=0.25, conv_impl="pallas",
                           fused_min_l=8)
        params = ref.init(jax.random.PRNGKey(1), x)
        rngs = {"dropout": jax.random.PRNGKey(2)}

        def loss(mod):
            def f(p):
                y = mod.apply(p, x, deterministic=False, rngs=rngs)
                return jnp.sum(y ** 2)
            return f

        g_ref = jax.grad(loss(ref))(params)
        g_fused = jax.grad(loss(fused))(params)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        flat_f = jax.tree_util.tree_leaves(g_fused)
        for a, b in zip(flat_r, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_resblock2d_row_chunk_parity(self):
        from rosettafold_tpu.models.resnet import ResBlock2D

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
        ref = ResBlock2D(4)
        params = ref.init(jax.random.PRNGKey(1), x)
        want = ref.apply(params, x)
        fused = ResBlock2D(4, conv_impl="pallas", fused_min_l=8, row_chunk=8)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_pair_update_with_msa_parity(self):
        from rosettafold_tpu.models.pair import PairUpdateWithMsa

        B, N, L, d_msa, d_pair, h = 1, 3, 16, 24, 16, 4
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        msa = jax.random.normal(ks[0], (B, N, L, d_msa))
        pair = jax.random.normal(ks[1], (B, L, L, d_pair))
        att = jax.random.normal(ks[2], (B, L, L, h))
        ref = PairUpdateWithMsa(d_msa, d_proj=8, d_pair=d_pair, n_heads=h)
        params = ref.init(jax.random.PRNGKey(1), msa, pair, att)
        want = ref.apply(params, msa, pair, att)
        fused = PairUpdateWithMsa(d_msa, d_proj=8, d_pair=d_pair, n_heads=h,
                                  attn_impl="pallas", conv_fused_min_l=8)
        got = fused.apply(params, msa, pair, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
