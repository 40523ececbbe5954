"""End-to-end data->training tests: dataset loader + fit() driver + pooling ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rosettafold_tpu import PerformerConfig, RoseTTAFoldConfig
from rosettafold_tpu.data import pdb
from rosettafold_tpu.data.dataset import batches, crop_pad, load_example
from rosettafold_tpu.data.vocab import AA_ORDER
from rosettafold_tpu.models.se3 import Fiber, fiber2tensor, g_avg_pooling, g_max_pooling, tensor2fiber
from rosettafold_tpu.train.loop import fit


@pytest.fixture
def sample_pairs(tmp_path):
    rng = np.random.default_rng(0)
    pairs = []
    for t in range(3):
        L = 20 + 4 * t
        seq = "".join(AA_ORDER[i] for i in rng.integers(0, 20, L))
        lines = [">query", seq]
        for n in range(5):
            s = list(seq)
            for i in rng.integers(0, L, 4):
                s[i] = "-"
            lines += [f">h{n}", "".join(s)]
        a3m = tmp_path / f"t{t}.a3m"
        a3m.write_text("\n".join(lines))
        xyz = rng.normal(size=(L, 3, 3)).astype(np.float32) * 4
        pdbf = tmp_path / f"t{t}.pdb"
        pdb.write_pdb(str(pdbf), xyz, rng.integers(0, 20, L))
        pairs.append((str(a3m), str(pdbf)))
    return pairs


def test_load_and_crop(sample_pairs):
    ex = load_example(*sample_pairs[0])
    assert ex.msa.shape[0] == 6 and ex.msa.shape[1] == ex.xyz.shape[0]
    rng = np.random.default_rng(0)
    c = crop_pad(ex, n_seq=4, crop_len=16, rng=rng)
    assert c.msa.shape == (4, 16) and c.xyz.shape == (16, 3, 3)
    c2 = crop_pad(ex, n_seq=10, crop_len=32, rng=rng)  # pad both ways
    assert c2.msa.shape == (10, 32) and not c2.mask[-1]


def test_batches_fixed_shapes(sample_pairs):
    it = batches(sample_pairs, batch_size=2, n_seq=4, crop_len=16)
    for _ in range(3):
        b = next(it)
        assert b["msa"].shape == (2, 4, 16)
        assert b["xyz"].shape == (2, 16, 3, 3)
        assert (b["seq"] == b["msa"][:, 0]).all()


def test_fit_runs_and_checkpoints(sample_pairs, tmp_path):
    cfg = RoseTTAFoldConfig(
        d_msa=24, d_pair=16, d_node=8, d_edge=8, d_state=8,
        n_two_track_blocks=1, n_three_track_blocks=2, n_encoder_layers=1,
        max_len=32, n_neighbors=(4, 4),
        performer=PerformerConfig(dim_head=8, nb_features=8),
    )
    logs = []
    it = batches(sample_pairs, batch_size=2, n_seq=4, crop_len=16)
    state = fit(
        cfg, it, steps=2, ckpt_dir=str(tmp_path / "ck"), ckpt_every=1,
        log_every=1, log_fn=logs.append,
    )
    assert int(state.step) == 2
    assert any("loss=" in l for l in logs)
    # resume
    it2 = batches(sample_pairs, batch_size=2, n_seq=4, crop_len=16)
    state2 = fit(
        cfg, it2, steps=3, ckpt_dir=str(tmp_path / "ck"), ckpt_every=10,
        log_every=1, log_fn=logs.append,
    )
    assert int(state2.step) == 3
    assert any("resumed from step 2" in l for l in logs)


def test_fiber_tensor_roundtrip_and_pooling():
    fiber = Fiber({0: 4, 1: 2})
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    feats = {
        0: jax.random.normal(k[0], (2, 5, 4, 1)),
        1: jax.random.normal(k[1], (2, 5, 2, 3)),
    }
    flat = fiber2tensor(feats, fiber)
    assert flat.shape == (2, 5, 4 + 6)
    back = tensor2fiber(flat, fiber)
    for d in feats:
        np.testing.assert_allclose(np.asarray(back[d]), np.asarray(feats[d]))

    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    avg = g_avg_pooling(feats, mask)
    np.testing.assert_allclose(
        np.asarray(avg[0]), np.asarray(jnp.mean(feats[0][0, :3, :, 0], axis=0)),
        atol=1e-6,
    )
    mx = g_max_pooling(feats, mask)
    np.testing.assert_allclose(
        np.asarray(mx[0]), np.asarray(jnp.max(feats[0][0, :3, :, 0], axis=0)),
        atol=1e-6,
    )
