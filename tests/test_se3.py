"""SE(3)-transformer and structure-track tests.

The decisive test the reference lacks (SURVEY.md §4): full-layer equivariance —
rotate the input frame, outputs must co-rotate (type-1) / stay invariant (type-0).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu.utils.testing import japply, jinit, jinit_out
from rosettafold_tpu.models.se3 import Fiber, SE3Transformer, TFN
from rosettafold_tpu.models.structure import (
    CoordUpdateWithMsaAndPair,
    GraphTransformer,
    GraphTransformerBlock,
    InitialCoordGenerationWithMsaAndPair,
)
from rosettafold_tpu.ops import knn, so3

B, L = 1, 10
D_NODE, D_EDGE, D_STATE = 8, 6, 8


def _se3_inputs(key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 5)
    h0 = jax.random.normal(k[0], (B, L, D_NODE, 1))
    xyz = jax.random.normal(k[1], (B, L, 3)) * 4.0
    h1 = jax.random.normal(k[2], (B, L, 3, 3))
    edge = jax.random.normal(k[3], (B, L, L, D_EDGE))
    edge = 0.5 * (edge + jnp.swapaxes(edge, 1, 2))
    rel = xyz[:, :, None, :] - xyz[:, None, :, :]
    mask = jnp.ones((B, L, L), bool) & ~jnp.eye(L, dtype=bool)[None]
    return h0, h1, edge, rel, mask, xyz


def _model():
    return SE3Transformer(
        num_layers=2, num_channels=8, n_heads=2, num_degrees=2,
        l0_in_features=D_NODE, l1_in_features=3,
        l0_out_features=D_STATE, l1_out_features=3,
        num_edge_features=D_EDGE,
    )


def test_se3_transformer_shapes():
    h0, h1, edge, rel, mask, _ = _se3_inputs()
    model = _model()
    out, _ = jinit_out(model, jax.random.PRNGKey(0), h0, h1, edge, rel, mask)
    assert out[0].shape == (B, L, D_STATE, 1)
    assert out[1].shape == (B, L, 3, 3)


def test_se3_transformer_equivariance():
    """Rotate coords and type-1 inputs by R: type-0 output invariant, type-1
    output rotates by R."""
    h0, h1, edge, rel, mask, xyz = _se3_inputs()
    model = _model()
    params = jinit(model, jax.random.PRNGKey(0), h0, h1, edge, rel, mask)
    out = japply(model, params, h0, h1, edge, rel, mask)

    R = jnp.asarray(so3.rot_np(0.7, 0.3, 1.9), dtype=jnp.float32)
    out_r = japply(model, params, h0, h1 @ R.T, edge, rel @ R.T, mask)

    np.testing.assert_allclose(
        np.asarray(out_r[0]), np.asarray(out[0]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_r[1]), np.asarray(out[1] @ R.T), atol=2e-3
    )


def test_tfn_shapes_and_equivariance():
    h0, h1, edge, rel, mask, _ = _se3_inputs()
    model = TFN(
        num_layers=2, num_channels=8, num_degrees=2,
        l0_in_features=D_NODE, l1_in_features=3,
        l0_out_features=D_STATE, l1_out_features=3,
        num_edge_features=D_EDGE,
    )
    params = jinit(model, jax.random.PRNGKey(0), h0, h1, edge, rel, mask)
    out = japply(model, params, h0, h1, edge, rel, mask)
    assert out[0].shape == (B, L, D_STATE, 1) and out[1].shape == (B, L, 3, 3)

    R = jnp.asarray(so3.rot_np(0.2, 1.4, 0.8), dtype=jnp.float32)
    out_r = japply(model, params, h0, h1 @ R.T, edge, rel @ R.T, mask)
    np.testing.assert_allclose(np.asarray(out_r[0]), np.asarray(out[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_r[1]), np.asarray(out[1] @ R.T), atol=2e-3)


def test_knn_adjacency_matches_bruteforce():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 14, 3, 3)) * 5.0
    aa_idx = np.tile(np.arange(14)[None], (2, 1))
    K, kmin = 4, 3
    cond = np.asarray(
        knn.knn_adjacency(jnp.asarray(xyz, jnp.float32), jnp.asarray(aa_idx), K, kmin)
    )
    ca = xyz[:, :, 1]
    for b in range(2):
        pd = np.linalg.norm(ca[b][:, None] - ca[b][None], axis=-1) + np.eye(14) * 1e3
        for i in range(14):
            topk = set(np.argsort(pd[i], kind="stable")[:K])
            for j in range(14):
                band = (abs(i - j) < kmin) and (i != j)
                assert cond[b, i, j] == ((j in topk) or band), (b, i, j)


def test_graph_transformer_shapes_and_mask():
    d_in, d_out, d_edge, h = 12, 8, 6, 2
    node = jax.random.normal(jax.random.PRNGKey(0), (B, L, d_in))
    edge = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, d_edge))
    mod = GraphTransformer(d_in, d_out, d_edge, h, p_dropout=0.0)
    out, params = jinit_out(mod, jax.random.PRNGKey(2), node, edge, None)
    assert out.shape == (B, L, d_out * h)

    # mask blocks information flow: isolate node 0 from all others
    mask = jnp.ones((B, L, L))
    mask = mask.at[:, 0, 1:].set(0.0)
    out1 = japply(mod, params, node, edge, mask)
    node2 = node.at[:, 1:].add(2.0)
    out2 = japply(mod, params, node2.at[:, 0].set(node[:, 0]), edge, mask)
    np.testing.assert_allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]), atol=1e-5)


def test_graph_transformer_block_shape():
    d_node, d_edge = 12, 6
    node = jax.random.normal(jax.random.PRNGKey(0), (B, L, d_node))
    edge = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, d_edge))
    mod = GraphTransformerBlock(d_node, d_node, d_edge, 2)
    out, _ = jinit_out(mod, jax.random.PRNGKey(2), node, edge, None)
    assert out.shape == (B, L, d_node)


def test_initial_coord_generation_shape():
    d_msa, d_pair = 24, 16
    N = 4
    msa = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, d_msa))
    pair = jax.random.normal(jax.random.PRNGKey(1), (B, L, L, d_pair))
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))
    mod = InitialCoordGenerationWithMsaAndPair(
        d_msa=d_msa, d_pair=d_pair, d_node=D_NODE, d_edge=D_EDGE, n_layers=2
    )
    out, _ = jinit_out(mod, jax.random.PRNGKey(2), msa, pair, seq1h, aa_idx)
    assert out.shape == (B, L, 3, 3)


def test_coord_update_shapes_and_equivariance():
    d_msa, d_pair = 24, 16
    N = 4
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    msa = jax.random.normal(keys[0], (B, N, L, d_msa))
    pair = jax.random.normal(keys[1], (B, L, L, d_pair))
    xyz = jax.random.normal(keys[2], (B, L, 3, 3)) * 4.0
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))

    mod = CoordUpdateWithMsaAndPair(
        d_msa=d_msa, d_pair=d_pair, d_node=D_NODE, d_edge=D_EDGE,
        d_state=D_STATE, n_neighbors=6,
    )
    params = jinit(mod, jax.random.PRNGKey(0), xyz, msa, pair, aa_idx, seq1h)
    state, xyz_new = japply(mod, params, xyz, msa, pair, aa_idx, seq1h)
    assert state.shape == (B, L, D_STATE)
    assert xyz_new.shape == (B, L, 3, 3)

    # Rigid-motion equivariance: rotating the input coords rotates the output
    # coords (up to the same rotation), and leaves the state invariant.
    R = jnp.asarray(so3.rot_np(0.5, 1.2, 2.6), dtype=jnp.float32)
    state_r, xyz_r = japply(mod, params, xyz @ R.T, msa, pair, aa_idx, seq1h)
    np.testing.assert_allclose(np.asarray(state_r), np.asarray(state), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(xyz_r), np.asarray(xyz_new @ R.T), atol=3e-3
    )


def test_coord_update_gather_matches_dense_on_full_graph():
    """With K >= L the forward-topk and reverse-topk neighborhoods both become
    the full graph, so the gather path must agree with the dense path exactly."""
    d_msa, d_pair = 24, 16
    N = 4
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    msa = jax.random.normal(keys[0], (B, N, L, d_msa))
    pair = jax.random.normal(keys[1], (B, L, L, d_pair))
    xyz = jax.random.normal(keys[2], (B, L, 3, 3)) * 4.0
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))

    dense = CoordUpdateWithMsaAndPair(
        d_msa=d_msa, d_pair=d_pair, d_node=D_NODE, d_edge=D_EDGE,
        d_state=D_STATE, n_neighbors=L, se3_impl="dense",
    )
    gather = CoordUpdateWithMsaAndPair(
        d_msa=d_msa, d_pair=d_pair, d_node=D_NODE, d_edge=D_EDGE,
        d_state=D_STATE, n_neighbors=L, se3_impl="gather",
    )
    params = jinit(dense, jax.random.PRNGKey(0), xyz, msa, pair, aa_idx, seq1h)
    s_d, x_d = japply(dense, params, xyz, msa, pair, aa_idx, seq1h)
    s_g, x_g = japply(gather, params, xyz, msa, pair, aa_idx, seq1h)
    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_d), atol=2e-4)


def test_coord_update_gather_equivariance():
    d_msa, d_pair = 24, 16
    N = 4
    keys = jax.random.split(jax.random.PRNGKey(13), 4)
    msa = jax.random.normal(keys[0], (B, N, L, d_msa))
    pair = jax.random.normal(keys[1], (B, L, L, d_pair))
    xyz = jax.random.normal(keys[2], (B, L, 3, 3)) * 4.0
    seq1h = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), 21)
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))

    mod = CoordUpdateWithMsaAndPair(
        d_msa=d_msa, d_pair=d_pair, d_node=D_NODE, d_edge=D_EDGE,
        d_state=D_STATE, n_neighbors=5, se3_impl="gather",
    )
    params = jinit(mod, jax.random.PRNGKey(0), xyz, msa, pair, aa_idx, seq1h)
    state, xyz_new = japply(mod, params, xyz, msa, pair, aa_idx, seq1h)

    R = so3.rot_np(0.5, 1.2, 2.6)
    xyz_rot = jnp.asarray(np.asarray(xyz, np.float64) @ R.T, jnp.float32)
    state_r, xyz_r = japply(mod, params, xyz_rot, msa, pair, aa_idx, seq1h)
    np.testing.assert_allclose(np.asarray(state_r), np.asarray(state), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(xyz_r, np.float64),
        np.asarray(xyz_new, np.float64) @ R.T,
        atol=3e-3,
    )


def test_knn_excludes_self_even_when_k_geq_l():
    """Regression: self edges at K >= L broke SE(3) equivariance (the reference
    keeps them, rosettafold_pytorch.py:844-847; we deliberately exclude them)."""
    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.normal(size=(1, 9, 3, 3)) * 5, jnp.float32)
    aa = jnp.tile(jnp.arange(9)[None], (1, 1))
    cond = np.asarray(knn.knn_adjacency(xyz, aa, n_neighbors=9))
    assert not np.diag(cond[0]).any()
    idx, valid = knn.knn_gather_indices(xyz, aa, n_neighbors=9)
    self_slots = np.asarray(idx[0]) == np.arange(9)[:, None]
    assert not (self_slots & np.asarray(valid[0])).any()


def test_gather_vs_dense_divergence_at_small_K():
    """Quantify the documented forward-topk (gather) vs reverse-topk (dense)
    divergence at K << L (VERDICT r1 weak #8). CA distances are symmetric, so
    the two neighbor sets coincide except at top-K boundary asymmetries; this
    pins the resulting output delta at production-like K/L ratios."""
    import numpy as np

    from rosettafold_tpu.models.structure import CoordUpdateWithMsaAndPair

    B, N, L, K = 1, 3, 48, 8
    d_msa, d_pair, d_node, d_edge, d_state = 24, 16, 8, 8, 8
    rng = np.random.default_rng(0)
    xyz = jnp.asarray((rng.normal(size=(B, L, 3, 3)) * 4.0).astype(np.float32))
    msa = jnp.asarray(rng.normal(size=(B, N, L, d_msa)).astype(np.float32))
    pair = jnp.asarray(rng.normal(size=(B, L, L, d_pair)).astype(np.float32))
    aa = jnp.asarray(np.arange(L)[None].repeat(B, 0))
    seq1h = jnp.asarray(
        np.eye(21, dtype=np.float32)[rng.integers(0, 21, size=(B, L))]
    )

    def build(impl):
        return CoordUpdateWithMsaAndPair(
            d_msa, d_pair, d_node, d_edge, d_state, n_neighbors=K, p_dropout=0.0,
            se3_impl=impl,
        )

    dense, scatter, gather = build("dense"), build("scatter"), build("gather")
    params = dense.init(jax.random.PRNGKey(0), xyz, msa, pair, aa, seq1h)
    s_d, x_d = jax.jit(dense.apply)(params, xyz, msa, pair, aa, seq1h)
    s_s, x_s = jax.jit(scatter.apply)(params, xyz, msa, pair, aa, seq1h)
    s_g, x_g = jax.jit(gather.apply)(params, xyz, msa, pair, aa, seq1h)

    # The scatter path runs the EXACT reference edge rule (src-major top-k +
    # band with segment-op aggregation) and must match the dense path to fp
    # tolerance at any K.
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_d), atol=2e-4)

    # The gather path is a forward-topk approximation: at K<<L on asymmetric
    # neighborhoods (random coords are the worst case) the incoming sets
    # differ materially — MEASURED here so the divergence is documented, and
    # why "scatter" (exact) is the default long-sequence path.
    d_state_diff = float(jnp.max(jnp.abs(s_d - s_g)))
    d_xyz = float(jnp.max(jnp.abs(x_d - x_g)))
    scale = float(jnp.std(s_d))
    print(f"gather-vs-dense K={K} L={L}: state {d_state_diff:.4f} "
          f"(std {scale:.3f}), xyz {d_xyz:.4f}")
    assert d_state_diff < 20.0 * max(scale, 1.0)


def test_bucket_edge_set_matches_adjacency_exactly():
    """knn_bucket_indices reproduces the exact incoming sets of knn_adjacency
    (reverse-topk + band, reference rosettafold_pytorch.py:844-852) as a
    static dst-major bucket, with zero overflow at the default capacity."""
    B, L, K = 2, 64, 8
    rng = np.random.default_rng(3)
    xyz = jnp.asarray((rng.normal(size=(B, L, 3, 3)) * 4.0).astype(np.float32))
    aa = jnp.asarray(np.arange(L)[None].repeat(B, 0))

    cond = np.asarray(knn.knn_adjacency(xyz, aa, K))  # (B, i, j) src-major
    idx, valid, overflow = knn.knn_bucket_indices(xyz, aa, K)
    idx, valid, overflow = map(np.asarray, (idx, valid, overflow))

    assert (overflow == 0).all()
    for b in range(B):
        for j in range(L):
            true_in = set(np.nonzero(cond[b, :, j])[0].tolist())
            bucket_in = set(idx[b, j][valid[b, j]].tolist())
            assert bucket_in == true_in, (b, j)
    # no duplicate srcs within a destination's valid slots
    for b in range(B):
        for j in range(L):
            v = idx[b, j][valid[b, j]]
            assert len(set(v.tolist())) == len(v)


def test_bucket_overflow_reported_and_band_kept():
    """With a deliberately tiny capacity the overflow count is positive and
    the dropped edges are the furthest ones — band edges always survive."""
    B, L, K = 1, 48, 16
    rng = np.random.default_rng(5)
    xyz = jnp.asarray((rng.normal(size=(B, L, 3, 3)) * 4.0).astype(np.float32))
    aa = jnp.asarray(np.arange(L)[None])

    idx, valid, overflow = knn.knn_bucket_indices(xyz, aa, K, capacity=18)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert int(overflow[0]) > 0
    # every band neighbor |i-j| < 9 is present in the valid slots
    for j in range(L):
        kept = set(idx[0, j][valid[0, j]].tolist())
        band = {i for i in range(L) if i != j and abs(i - j) < 9}
        assert band <= kept, j


def test_coord_update_bucket_matches_dense():
    """The bucket path runs the EXACT edge rule on the gather layout: outputs
    must match the dense (exact-parity) path to fp tolerance at K << L, where
    the forward-topk gather approximation measurably diverges
    (test_gather_vs_dense_divergence_at_small_K)."""
    from rosettafold_tpu.models.structure import CoordUpdateWithMsaAndPair

    B, N, L, K = 1, 3, 48, 8
    d_msa, d_pair, d_node, d_edge, d_state = 24, 16, 8, 8, 8
    rng = np.random.default_rng(0)
    xyz = jnp.asarray((rng.normal(size=(B, L, 3, 3)) * 4.0).astype(np.float32))
    msa = jnp.asarray(rng.normal(size=(B, N, L, d_msa)).astype(np.float32))
    pair = jnp.asarray(rng.normal(size=(B, L, L, d_pair)).astype(np.float32))
    aa = jnp.asarray(np.arange(L)[None].repeat(B, 0))
    seq1h = jnp.asarray(
        np.eye(21, dtype=np.float32)[rng.integers(0, 21, size=(B, L))]
    )

    def build(impl, **kw):
        return CoordUpdateWithMsaAndPair(
            d_msa, d_pair, d_node, d_edge, d_state, n_neighbors=K,
            p_dropout=0.0, se3_impl=impl, **kw,
        )

    dense, bucket = build("dense"), build("bucket")
    params = dense.init(jax.random.PRNGKey(0), xyz, msa, pair, aa, seq1h)
    s_d, x_d = jax.jit(dense.apply)(params, xyz, msa, pair, aa, seq1h)
    s_b, x_b = jax.jit(bucket.apply)(params, xyz, msa, pair, aa, seq1h)
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_d), atol=2e-4)

    # fused-kernel path on the bucket layout (interpret mode off-TPU) agrees
    bucket_k = build("bucket", attn_impl="pallas")
    s_bk, x_bk = jax.jit(bucket_k.apply)(params, xyz, msa, pair, aa, seq1h)
    np.testing.assert_allclose(np.asarray(s_bk), np.asarray(s_d), atol=2e-3)
    np.testing.assert_allclose(np.asarray(x_bk), np.asarray(x_d), atol=2e-3)


def test_fiber_combine_family():
    """Fiber.combine / combine_max / combine_selectively (reference fibers.py:60-91).

    combine_selectively keeps only f1's degrees, summing f2's multiplicity
    where the degree overlaps — used upstream for selective skip-cats.
    """
    f1 = Fiber({0: 4, 1: 2})
    f2 = Fiber({0: 3, 1: 5, 2: 7})
    assert Fiber.combine(f1, f2).dict == {0: 7, 1: 7, 2: 7}
    assert Fiber.combine_max(f1, f2).dict == {0: 4, 1: 5, 2: 7}
    sel = Fiber.combine_selectively(f1, f2)
    assert sel.dict == {0: 7, 1: 7}  # degree 2 dropped: not in f1
    assert sel.n_features == 7 * 1 + 7 * 3
    # degrees in f1 but absent from f2 pass through unchanged
    assert Fiber.combine_selectively(f2, f1).dict == {0: 7, 1: 7, 2: 7}
