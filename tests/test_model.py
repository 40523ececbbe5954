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


def test_scan_blocks_mode():
    """scan_blocks=True: one trace for all repeated blocks (stacked params),
    per-block n_neighbors via the scanned top-k mask. Perf/training mode —
    not name-compatible with torch_import (documented in config.py)."""
    import numpy as np

    from rosettafold_tpu.config import tiny_config
    from rosettafold_tpu.models.rosettafold import RoseTTAFold

    cfg = tiny_config(
        scan_blocks=True, n_two_track_blocks=2, n_three_track_blocks=3,
        n_neighbors=(8, 6, 6), p_dropout=0.0,
    )
    m = RoseTTAFold(config=cfg)
    msa = jnp.asarray(np.random.default_rng(0).integers(0, 21, (1, 2, 12)))
    aa = jnp.arange(12)[None]
    p = m.init(jax.random.PRNGKey(0), msa, msa[:, 0], aa)
    # stacked params: leading axis = n_blocks
    leaf = jax.tree.leaves(p["params"]["two_track_scan"])[0]
    assert leaf.shape[0] == 2, leaf.shape
    leaf3 = jax.tree.leaves(p["params"]["three_track_scan"])[0]
    assert leaf3.shape[0] == 2, leaf3.shape  # n_three_track_blocks - 1
    logits, xyz, plddt = jax.jit(m.apply)(p, msa, msa[:, 0], aa)
    assert xyz.shape == (1, 12, 3, 3) and plddt.shape == (1, 12)
    assert all(bool(jnp.isfinite(v).all()) for v in
               [xyz, plddt] + list(logits.values()))


def test_dynamic_k_matches_static():
    """k_dynamic top-k masking == a static smaller K (scan-mode correctness)."""
    import numpy as np

    from rosettafold_tpu.ops import knn

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.normal(size=(2, 24, 3, 3)) * 4.0, jnp.float32)
    aa = jnp.tile(jnp.arange(24)[None], (2, 1))
    for k_small, k_max in [(6, 16), (4, 24), (16, 16)]:
        a = knn.knn_adjacency(xyz, aa, k_small)
        b = knn.knn_adjacency(xyz, aa, k_max, k_dynamic=jnp.asarray(k_small))
        assert bool((a == b).all()), (k_small, k_max)


def test_dynamic_k_matches_static_gather():
    """knn_gather_indices with k_dynamic must produce the SAME edge set as a
    static smaller K — regression for the band/top-k dedup bug where band
    edges colliding with a k_dynamic-masked top-k slot were dropped from both
    (advisor r2 high: ops/knn.py)."""
    import numpy as np

    from rosettafold_tpu.ops import knn

    def edge_set(idx, valid):
        B, L, S = idx.shape
        adj = np.zeros((B, L, L), dtype=bool)
        idx, valid = np.asarray(idx), np.asarray(valid)
        for b in range(B):
            for j in range(L):
                adj[b, j, idx[b, j][valid[b, j]]] = True
        return adj

    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.normal(size=(2, 24, 3, 3)) * 4.0, jnp.float32)
    aa = jnp.tile(jnp.arange(24)[None], (2, 1))
    for k_small, k_max in [(6, 16), (4, 24), (16, 16)]:
        ia, va = knn.knn_gather_indices(xyz, aa, k_small)
        ib, vb = knn.knn_gather_indices(
            xyz, aa, k_max, k_dynamic=jnp.asarray(k_small)
        )
        ea, eb = edge_set(ia, va), edge_set(ib, vb)
        assert (ea == eb).all(), (k_small, k_max, int((ea != eb).sum()))


def test_resnet_row_chunked_matches_unchunked():
    """The row-chunked ResNet (exact conv halos + global IN stats) must equal
    the unchunked path: same params, dilations spanning chunk boundaries."""
    import numpy as np

    from rosettafold_tpu.models.resnet import ResNet

    B, H, W, C = 1, 24, 24, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    full = ResNet(4, C, C, 10, dilations=(1, 2, 4, 8))
    chunked = ResNet(4, C, C, 10, dilations=(1, 2, 4, 8), row_chunk=7)
    p = full.init(jax.random.PRNGKey(1), x)
    a = jax.jit(lambda p, x: full.apply(p, x))(p, x)
    b = jax.jit(lambda p, x: chunked.apply(p, x))(p, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_prediction_head_row_chunked_matches():
    import numpy as np

    from rosettafold_tpu.models.heads import PredictionHead

    B, L, C = 1, 20, 12
    pair = jax.random.normal(jax.random.PRNGKey(2), (B, L, L, C))
    full = PredictionHead(in_channels=C, n_res_blocks=2)
    chunked = PredictionHead(in_channels=C, n_res_blocks=2, row_chunk=6)
    p = full.init(jax.random.PRNGKey(3), pair)
    a = jax.jit(lambda p, x: full.apply(p, x))(p, pair)
    b = jax.jit(lambda p, x: chunked.apply(p, x))(p, pair)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=2e-5, err_msg=k)


def test_prediction_head_tower_chaining_identity():
    """The long-L tower-serialization chain (heads.py chain()) must be a
    forward identity (the injected z is exactly 0 for finite logits) and must
    not leak gradient between towers through the isnan-guarded zero. Forced on
    at toy L via chain_min_l=0 (advisor r4: the hard-coded 256 gate left the
    path untestable at unit sizes)."""
    import numpy as np

    from rosettafold_tpu.models.heads import PredictionHead

    B, L, C = 1, 12, 8
    pair = jax.random.normal(jax.random.PRNGKey(4), (B, L, L, C))
    plain = PredictionHead(in_channels=C, n_res_blocks=1, remat_towers=True)
    chained = PredictionHead(
        in_channels=C, n_res_blocks=1, remat_towers=True, chain_min_l=0)
    p = plain.init(jax.random.PRNGKey(5), pair)

    a = jax.jit(lambda p, x: plain.apply(p, x))(p, pair)
    b = jax.jit(lambda p, x: chained.apply(p, x))(p, pair)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), atol=0, err_msg=k)

    def loss(mod):
        def f(p, x):
            out = mod.apply(p, x)
            return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in out.values())
        return f

    ga = jax.jit(jax.grad(loss(plain)))(p, pair)
    gb = jax.jit(jax.grad(loss(chained)))(p, pair)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xb), np.asarray(xa), atol=1e-6)
