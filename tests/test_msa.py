"""MSA-track tests mirroring /root/reference/tests/test_module.py:147-311,417-441,
588-628 (shape contracts, softmax properties, error contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.utils.testing import japply, jinit, jinit_out
from rosettafold_tpu.models.msa import (
    EncoderLayer,
    MsaUpdateUsingSelfAttention,
    MsaUpdateWithPair,
    MsaUpdateWithPairAndCoord,
    PositionWiseWeightFactor,
    SoftTiedAttentionOverResidues,
)

B, N, L, D = 2, 5, 12, 48


def _msa(key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (B, N, L, D))


def test_poswise_weight_factor_shape_and_sums_to_1():
    mod = PositionWiseWeightFactor(d_msa=D, n_heads=4, p_dropout=0.0)
    w, _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert w.shape == (B, N, 4, L, 1)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-5)


def test_poswise_weight_factor_rejects_bad_heads():
    mod = PositionWiseWeightFactor(d_msa=D, n_heads=5)
    with pytest.raises(AssertionError):
        jinit_out(mod, jax.random.PRNGKey(0), _msa())


def test_soft_tied_attention_shape():
    mod = SoftTiedAttentionOverResidues(d_msa=D, n_heads=4, p_dropout=0.0)
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert out.shape == (B, N, L, D)


def test_soft_tied_attention_att_is_symmetric():
    mod = SoftTiedAttentionOverResidues(
        d_msa=D, n_heads=4, p_dropout=0.0, return_att=True
    )
    (out, att), _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert att.shape == (B, L, L, 4)
    np.testing.assert_allclose(
        np.asarray(att), np.asarray(att.swapaxes(1, 2)), atol=1e-6
    )


def test_encoder_layer_tied_shape():
    mod = EncoderLayer(d_msa=D, d_ff=D * 2, n_heads=4, tied=True)
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert out.shape == (B, N, L, D)


def test_encoder_layer_performer_shape():
    mod = EncoderLayer(d_msa=D, d_ff=D * 2, n_heads=4, performer=True)
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert out.shape == (B, N, L, D)


def test_encoder_layer_performer_return_att_raises():
    mod = EncoderLayer(d_msa=D, d_ff=D * 2, n_heads=4, performer=True, return_att=True)
    with pytest.raises(NotImplementedError):
        jinit_out(mod, jax.random.PRNGKey(0), _msa())


def test_msa_update_using_self_attention_shape():
    mod = MsaUpdateUsingSelfAttention(d_msa=D, d_ff=D * 2, n_heads=4, n_encoder_layers=2)
    (out, att), _ = jinit_out(mod, jax.random.PRNGKey(0), _msa())
    assert out.shape == (B, N, L, D)
    assert att.shape == (B, L, L, 4)


def test_msa_update_with_pair_shape():
    d_pair = 24
    mod = MsaUpdateWithPair(d_msa=D, d_pair=d_pair, n_heads=4, n_encoder_layers=2)
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, d_pair))
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), _msa(), pair)
    assert out.shape == (B, N, L, D)


def test_msa_update_with_pair_and_coord_shape():
    d_state = 16
    mod = MsaUpdateWithPairAndCoord(d_msa=D, d_state=d_state, d_ff=D * 2)
    xyz = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3, 3))
    state = jax.random.normal(jax.random.PRNGKey(3), (B, L, d_state))
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), xyz, state, _msa())
    assert out.shape == (B, N, L, D)


def test_msa_update_with_pair_and_coord_respects_distance_mask():
    """Heads can only attend within their CA-distance bin: with two far-apart
    clusters, positions in cluster A must not receive value contributions from
    cluster B."""
    d_state = 16
    mod = MsaUpdateWithPairAndCoord(d_msa=D, d_state=d_state, d_ff=D * 2)
    # CA coords: first half at origin, second half 1000 A away.
    ca = jnp.concatenate(
        [jnp.zeros((B, L // 2, 3)), 1000.0 + jnp.zeros((B, L - L // 2, 3))], axis=1
    )
    xyz = jnp.tile(ca[:, :, None, :], (1, 1, 3, 1))
    state = jax.random.normal(jax.random.PRNGKey(3), (B, L, d_state))
    msa = _msa()
    params = jinit(mod, jax.random.PRNGKey(0), xyz, state, msa)

    out1 = japply(mod, params, xyz, state, msa)
    # Perturb MSA values in cluster B only; cluster A outputs must be unchanged.
    msa2 = msa.at[:, :, L // 2 :].add(3.0)
    out2 = japply(mod, params, xyz, state, msa2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, : L // 2]), np.asarray(out2[:, :, : L // 2]), atol=1e-5
    )
