"""Embedding tests, mirroring the reference contracts
(/root/reference/tests/test_module.py:35-143) plus PE math properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.utils.testing import japply, jinit, jinit_out
from rosettafold_tpu.models.embeddings import (
    MsaEmbedding,
    PairEmbedding,
    SinusoidalPositionalEncoding,
    SinusoidalPositionalEncoding2D,
)


def test_sinusoidal_positional_encoding_is_sinusoidal():
    bsz, n_seq, max_len, d_emb = 4, 10, 128, 128
    mod = SinusoidalPositionalEncoding(dim=d_emb, max_len=max_len, p_dropout=0.0)
    x = jnp.zeros((bsz, n_seq, max_len, d_emb))
    aa_idx = jnp.tile(jnp.arange(max_len)[None], (bsz, 1))
    pe, _ = jinit_out(mod, jax.random.PRNGKey(0), x, aa_idx)
    s = pe[..., 0::2] ** 2 + pe[..., 1::2] ** 2
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)


def test_sinusoidal_positional_encoding_2d_shape():
    bsz, max_len, d_emb = 2, 32, 64
    mod = SinusoidalPositionalEncoding2D(dim=d_emb, max_len=max_len)
    x = jnp.zeros((bsz, max_len, max_len, d_emb))
    aa_idx = jnp.tile(jnp.arange(max_len)[None], (bsz, 1))
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), x, aa_idx)
    assert out.shape == (bsz, max_len, max_len, d_emb)


def test_msa_embedding_shape_and_query_segment():
    bsz, n_seq, L, d_msa = 2, 5, 16, 48
    mod = MsaEmbedding(d_input=21, d_msa=d_msa, max_len=64)
    msa = jnp.zeros((bsz, n_seq, L), jnp.int32)
    aa_idx = jnp.tile(jnp.arange(L)[None], (bsz, 1))
    out, params = jinit_out(mod, jax.random.PRNGKey(0), msa, aa_idx)
    assert out.shape == (bsz, n_seq, L, d_msa)
    # all-identical tokens: rows 1.. differ from row 0 only by the segment embedding
    seg = params["params"]["query_enc"]["embedding"]
    diff = np.asarray(out[:, 1] - out[:, 0])
    np.testing.assert_allclose(
        diff, np.broadcast_to(np.asarray(seg[1] - seg[0]), diff.shape), atol=1e-5
    )


def test_pair_embedding_shape():
    bsz, L, d_pair = 2, 16, 24
    mod = PairEmbedding(d_input=21, d_pair=d_pair, max_len=64)
    seq = jnp.zeros((bsz, L), jnp.int32)
    aa_idx = jnp.tile(jnp.arange(L)[None], (bsz, 1))
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), seq, aa_idx)
    assert out.shape == (bsz, L, L, d_pair)


def test_pair_embedding_with_template_shape():
    bsz, L, d_pair, d_template = 2, 16, 24, 8
    mod = PairEmbedding(
        d_input=21, d_pair=d_pair, max_len=64, use_template=True, d_template=d_template
    )
    seq = jnp.zeros((bsz, L), jnp.int32)
    aa_idx = jnp.tile(jnp.arange(L)[None], (bsz, 1))
    template = jnp.ones((bsz, L, L, d_template))
    out, _ = jinit_out(mod, jax.random.PRNGKey(0), seq, aa_idx, template)
    assert out.shape == (bsz, L, L, d_pair)


def test_pair_embedding_raises_on_unexpected_template():
    mod = PairEmbedding(d_input=21, d_pair=24, max_len=64, use_template=False)
    seq = jnp.zeros((2, 16), jnp.int32)
    aa_idx = jnp.tile(jnp.arange(16)[None], (2, 1))
    with pytest.raises(ValueError):
        jinit_out(mod, jax.random.PRNGKey(0), seq, aa_idx, jnp.ones((2, 16, 16, 8)))
