"""End-to-end data->training tests: dataset loader + fit() driver + pooling ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rosettafold_tpu import PerformerConfig, RoseTTAFoldConfig
from rosettafold_tpu.data import pdb
from rosettafold_tpu.data.dataset import (
    batches, crop_pad, load_example, prefetch,
)
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


def test_subsample_strategies(sample_pairs):
    """All strategies keep the query row, return n_seq rows, and the
    diversity/weighted pickers prefer non-redundant homologs."""
    ex = load_example(*sample_pairs[0])
    # build a deep synthetic alignment: 30 near-copies of homolog A plus
    # 3 genuinely distinct rows — redundancy-aware strategies must not fill
    # the selection with A-clones
    rng = np.random.default_rng(1)
    L = ex.msa.shape[1]
    query = ex.msa[0]
    clone = query.copy()
    clone[:2] = (clone[:2] + 1) % 20
    clones = np.stack([clone] * 30)
    distinct = rng.integers(0, 20, (3, L)).astype(np.int32)
    deep = np.concatenate([query[None], clones, distinct])
    ex = type(ex)(msa=deep, xyz=np.zeros((L, 3, 3), np.float32),
                  aa_idx=np.arange(L, dtype=np.int32),
                  mask=np.ones(L, bool))

    for strat in ("uniform", "weighted", "diversity"):
        c = crop_pad(ex, n_seq=4, crop_len=L, rng=np.random.default_rng(0),
                     subsample=strat)
        assert c.msa.shape == (4, L)
        assert (c.msa[0] == query).all(), f"{strat} dropped the query row"

    # redundancy-aware strategies prefer the 3 distinct rows over the 30
    # clones: greedy diversity is deterministic (must take all 3); weighted
    # is stochastic but heavily tilted (each distinct row carries ~31x a
    # clone's weight — uniform sampling would average ~0.3 distinct rows)
    def n_distinct(strat):
        c = crop_pad(ex, n_seq=4, crop_len=L, rng=np.random.default_rng(0),
                     subsample=strat)
        return sum(
            any((row == d).all() for d in distinct) for row in c.msa[1:])

    assert n_distinct("diversity") == 3
    assert n_distinct("weighted") >= 2

    with pytest.raises(ValueError, match="subsample"):
        crop_pad(ex, n_seq=4, crop_len=L, rng=np.random.default_rng(0),
                 subsample="nope")


def test_multihost_sharding(sample_pairs):
    """Hosts with the same seed draw disjoint example shards that cover each
    epoch, and batches stay fixed-shape per host."""
    per_host = [
        list(batches(sample_pairs, batch_size=1, n_seq=4, crop_len=16,
                     epochs=2, seed=7, process_index=i, process_count=2))
        for i in range(2)
    ]
    # 3 examples, 2 hosts: host 0 sees 2/epoch, host 1 sees 1/epoch
    assert len(per_host[0]) == 4 and len(per_host[1]) == 2
    for bs in per_host:
        for b in bs:
            assert b["msa"].shape == (1, 4, 16)
    with pytest.raises(ValueError, match="process_index"):
        next(batches(sample_pairs, process_index=2, process_count=2))


def test_prefetch_matches_and_propagates_errors(sample_pairs):
    direct = list(batches(sample_pairs, batch_size=2, n_seq=4, crop_len=16,
                          epochs=1, seed=3))
    fetched = list(prefetch(
        batches(sample_pairs, batch_size=2, n_seq=4, crop_len=16,
                epochs=1, seed=3), size=2))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a["msa"], b["msa"])
        np.testing.assert_array_equal(a["xyz"], b["xyz"])

    def boom():
        yield {"ok": 1}
        raise RuntimeError("loader died")

    it = prefetch(boom(), size=1)
    assert next(it) == {"ok": 1}
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)


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
