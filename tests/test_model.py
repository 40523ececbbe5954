"""Full-model integration tests, mirroring the reference's single integration
test (/root/reference/tests/test_module.py:792-824) plus block-level contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu import RoseTTAFold, tiny_config
from rosettafold_tpu.models.rosettafold import FinalBlock, ThreeTrackBlock, TwoTrackBlock
from rosettafold_tpu.utils.testing import japply, jinit, jinit_out

B, N, L = 1, 4, 16
D_MSA, D_PAIR = 48, 24


def _inputs(key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 3)
    msa = jax.random.randint(k[0], (B, N, L), 0, 21)
    seq = msa[:, 0]
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))
    return msa, seq, aa_idx


def test_two_track_block_shape():
    mod = TwoTrackBlock(D_MSA, D_PAIR, n_encoder_layers=1)
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, D_MSA))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, D_PAIR))
    (m, p), _ = jinit_out(mod, jax.random.PRNGKey(2), msa, pair)
    assert m.shape == msa.shape and p.shape == pair.shape


def test_three_track_block_shape():
    mod = ThreeTrackBlock(
        D_MSA, D_PAIR, d_node=8, d_edge=8, d_state=8,
        n_encoder_layers=1, n_neighbors=6,
    )
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, D_MSA))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, D_PAIR))
    xyz = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3, 3)) * 4
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa = jnp.tile(jnp.arange(L)[None], (B, 1))
    (m, p, x), _ = jinit_out(mod, jax.random.PRNGKey(3), msa, pair, xyz, seq1h, aa)
    assert m.shape == msa.shape and p.shape == pair.shape and x.shape == xyz.shape


def test_final_block_shape():
    mod = FinalBlock(
        D_MSA, D_PAIR, d_node=8, d_edge=8, d_state=8,
        n_encoder_layers=1, n_neighbors=6,
    )
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, D_MSA))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, D_PAIR))
    xyz = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3, 3)) * 4
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa = jnp.tile(jnp.arange(L)[None], (B, 1))
    (m, p, x, plddt), _ = jinit_out(mod, jax.random.PRNGKey(3), msa, pair, xyz, seq1h, aa)
    assert plddt.shape == (B, L)


def test_rosettafold_forward_shapes():
    cfg = tiny_config()
    model = RoseTTAFold(config=cfg)
    msa, seq, aa_idx = _inputs()
    (logits, xyz, plddt), params = jinit_out(
        model, jax.random.PRNGKey(0), msa, seq, aa_idx
    )
    assert logits["theta"].shape == (B, L, L, 37)
    assert logits["phi"].shape == (B, L, L, 19)
    assert logits["dist"].shape == (B, L, L, 37)
    assert logits["omega"].shape == (B, L, L, 37)
    assert xyz.shape == (B, L, 3, 3)
    assert plddt.shape == (B, L)
    # (Note: dist/omega read the *symmetrized* pair map, but the conv towers do
    # not preserve symmetry — same as the reference, which only symmetrizes the
    # head inputs, rosettafold_pytorch.py:1168.)
    for k in logits:
        assert bool(jnp.isfinite(logits[k]).all()), k
    assert bool(jnp.isfinite(xyz).all() and jnp.isfinite(plddt).all())


def test_rosettafold_deterministic_and_data_dependent():
    cfg = tiny_config()
    model = RoseTTAFold(config=cfg)
    msa, seq, aa_idx = _inputs()
    params = jinit(model, jax.random.PRNGKey(0), msa, seq, aa_idx)
    out1 = japply(model, params, msa, seq, aa_idx)
    out2 = japply(model, params, msa, seq, aa_idx)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]), atol=0)

    msa2, seq2, _ = _inputs(key=5)
    out3 = japply(model, params, msa2, seq2, aa_idx)
    assert float(jnp.abs(out3[1] - out1[1]).max()) > 1e-4


def test_rosettafold_template_path():
    cfg = tiny_config(use_template=True)
    model = RoseTTAFold(config=cfg)
    msa, seq, aa_idx = _inputs()
    template = jax.random.normal(jax.random.PRNGKey(9), (B, L, L, cfg.d_template))
    (logits, xyz, plddt), _ = jinit_out(
        model, jax.random.PRNGKey(0), msa, seq, aa_idx, template
    )
    assert xyz.shape == (B, L, 3, 3)


def test_rosettafold_train_mode_runs():
    cfg = tiny_config()
    model = RoseTTAFold(config=cfg)
    msa, seq, aa_idx = _inputs()
    params = jinit(model, jax.random.PRNGKey(0), msa, seq, aa_idx)
    out = japply(
        model, params, msa, seq, aa_idx,
        deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert bool(jnp.isfinite(out[1]).all())


def test_rosettafold_bfloat16_close_to_float32():
    """bfloat16 trunk must run and agree with the f32 path to bf16 tolerance."""
    cfg32 = tiny_config()
    cfg16 = tiny_config(compute_dtype="bfloat16")
    m32, m16 = RoseTTAFold(config=cfg32), RoseTTAFold(config=cfg16)
    msa, seq, aa_idx = _inputs()
    params = jinit(m32, jax.random.PRNGKey(0), msa, seq, aa_idx)
    l32, x32, p32 = japply(m32, params, msa, seq, aa_idx)
    l16, x16, p16 = japply(m16, params, msa, seq, aa_idx)
    assert l16["dist"].dtype == jnp.float32  # public contract: f32 outputs
    assert bool(jnp.isfinite(x16).all())
    # loose agreement: bf16 rounding compounds over ~30 layers
    corr = jnp.corrcoef(x32.ravel(), x16.ravel())[0, 1]
    assert corr > 0.98, float(corr)
