"""Parity tests for the fused SE(3) attention kernel (ops/pallas/se3_attend.py)
against the XLA einsum path (GConvSE3Partial + GMABSE3), dense and gather
layouts, forward and backward. Runs the kernel in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.models import se3 as jse3
from rosettafold_tpu.ops import so3


def _make_inputs(key, B, L, S, f_in, gather, edge_dim=16):
    ks = jax.random.split(key, 6)
    h = {
        d: jax.random.normal(ks[d], (B, L, m, 2 * d + 1))
        for d, m in f_in.dict.items()
    }
    if gather:
        src_idx = jax.random.randint(ks[2], (B, L, S), 0, L)
        h_src = {d: jax.vmap(lambda hb, ib: hb[ib])(h[d], src_idx) for d in h}
        rel = jax.random.normal(ks[3], (B, L, S, 3))
        mask = jax.random.bernoulli(ks[4], 0.85, (B, L, S))
    else:
        h_src = None
        rel = jax.random.normal(ks[3], (B, L, L, 3))
        mask = jax.random.bernoulli(ks[4], 0.85, (B, L, L))
    # every dst keeps at least one edge (fully-masked rows are undefined
    # in both implementations and cannot occur with the kmin band)
    mask = mask.at[..., 0].set(True)
    basis = so3.equivariant_basis(rel, 1)
    feat = jnp.concatenate(
        [jax.random.normal(ks[5], (*mask.shape, edge_dim)), so3.edge_radii(rel)],
        axis=-1,
    )
    return h, h_src, feat, basis, mask


def _mods(f_in, f_out, n_heads=2, div=2, edge_dim=16, selfint="1x1"):
    kw = dict(f_in=f_in, f_out=f_out, edge_dim=edge_dim, div=div,
              n_heads=n_heads, selfint=selfint)
    return (jse3.GSE3Res(impl="xla", **kw), jse3.GSE3Res(impl="pallas", **kw))


@pytest.mark.parametrize("gather", [False, True])
@pytest.mark.parametrize(
    "dims",
    [
        # (f_in, f_out, heads, div) — layer-0, mid-layer, and final-layer shapes
        ({0: 24, 1: 3}, {0: 8, 1: 8}, 2, 2),
        ({0: 8, 1: 8}, {0: 8, 1: 8}, 2, 2),
        ({0: 8, 1: 8}, {0: 12, 1: 3}, 1, 1),
    ],
)
def test_fused_matches_xla(gather, dims):
    f_in_d, f_out_d, heads, div = dims
    f_in, f_out = jse3.Fiber(f_in_d), jse3.Fiber(f_out_d)
    B, L, S = 2, 16, 8 if gather else 16
    h, h_src, feat, basis, mask = _make_inputs(
        jax.random.PRNGKey(0), B, L, S, f_in, gather)
    ref, fused = _mods(f_in, f_out, heads, div)
    params = ref.init(jax.random.PRNGKey(1), h, feat, basis, mask, h_src=h_src)
    # identical param trees: the fused module binds the same v/k/q/project
    chex_tree = jax.tree_util.tree_structure(params)
    params2 = fused.init(jax.random.PRNGKey(1), h, feat, basis, mask, h_src=h_src)
    assert jax.tree_util.tree_structure(params2) == chex_tree

    out_ref = ref.apply(params, h, feat, basis, mask, h_src=h_src)
    out_fused = fused.apply(params, h, feat, basis, mask, h_src=h_src)
    for d in out_ref:
        np.testing.assert_allclose(
            out_fused[d], out_ref[d], rtol=2e-5, atol=2e-5,
            err_msg=f"degree {d}")


@pytest.mark.parametrize("gather", [False, True])
def test_fused_gradients_match(gather):
    f_in, f_out = jse3.Fiber({0: 8, 1: 3}), jse3.Fiber({0: 8, 1: 8})
    B, L, S = 1, 8, 8
    h, h_src, feat, basis, mask = _make_inputs(
        jax.random.PRNGKey(2), B, L, S, f_in, gather)
    ref, fused = _mods(f_in, f_out, n_heads=2, div=2)
    params = ref.init(jax.random.PRNGKey(3), h, feat, basis, mask, h_src=h_src)

    def loss(mod, params, h, feat):
        out = mod.apply(params, h, feat, basis, mask, h_src=h_src)
        return sum(jnp.sum(out[d] ** 2) for d in out)

    g_ref = jax.grad(lambda p, hh, f: loss(ref, p, hh, f), argnums=(0, 1, 2))(
        params, h, feat)
    g_fused = jax.grad(lambda p, hh, f: loss(fused, p, hh, f), argnums=(0, 1, 2))(
        params, h, feat)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("gather", [False, True])
def test_fused_matches_xla_multiblock_s(gather):
    """S > 128 (two 128-lane S-blocks): the edge-flat planes are S-block-major
    and the kernel chunks the attention stage — the layout that a K=128
    neighborhood (S = 128 + band = 146 -> 256) or a dense L in (128, 256]
    produces. Guards the Mosaic (T*S,)->(T,S) reshape restriction."""
    f_in, f_out = jse3.Fiber({0: 8, 1: 3}), jse3.Fiber({0: 8, 1: 8})
    if gather:
        B, L, S = 1, 24, 130
    else:
        B, L, S = 1, 130, 130
    h, h_src, feat, basis, mask = _make_inputs(
        jax.random.PRNGKey(7), B, L, S, f_in, gather)
    ref, fused = _mods(f_in, f_out, n_heads=2, div=2)
    params = ref.init(jax.random.PRNGKey(8), h, feat, basis, mask, h_src=h_src)
    out_ref = ref.apply(params, h, feat, basis, mask, h_src=h_src)
    out_fused = fused.apply(params, h, feat, basis, mask, h_src=h_src)
    for d in out_ref:
        np.testing.assert_allclose(
            out_fused[d], out_ref[d], rtol=2e-5, atol=2e-5,
            err_msg=f"degree {d}")

    def loss(mod, params, h, feat):
        out = mod.apply(params, h, feat, basis, mask, h_src=h_src)
        return sum(jnp.sum(out[d] ** 2) for d in out)

    g_ref = jax.grad(lambda p, hh, f: loss(ref, p, hh, f), argnums=(1, 2))(
        params, h, feat)
    g_fused = jax.grad(lambda p, hh, f: loss(fused, p, hh, f), argnums=(1, 2))(
        params, h, feat)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-5)


def test_se3_transformer_fused_gather_matches_xla():
    """The gather layout through SE3Transformer: invariant planes (feat/basis/
    mask) prepped ONCE and shared by all three GSE3Res layers, node features
    gathered directly in plane layout (gather_h_planes) — forward + grads."""
    B, L, S = 1, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(6), 7)
    h0 = jax.random.normal(ks[0], (B, L, 12, 1))
    h1 = jax.random.normal(ks[1], (B, L, 3, 3))
    src_idx = jax.random.randint(ks[2], (B, L, S), 0, L)
    edge = jax.random.normal(ks[3], (B, L, S, 16))
    rel = jax.random.normal(ks[4], (B, L, S, 3))
    mask = jax.random.bernoulli(ks[5], 0.8, (B, L, S)).at[..., 0].set(True)
    kw = dict(num_layers=2, num_channels=8, n_heads=2, div=2,
              l0_in_features=12, l0_out_features=8, num_edge_features=16)
    ref = jse3.SE3Transformer(impl="xla", **kw)
    fused = jse3.SE3Transformer(impl="pallas", **kw)
    params = ref.init(ks[6], h0, h1, edge, rel, mask, src_idx=src_idx)
    out_ref = ref.apply(params, h0, h1, edge, rel, mask, src_idx=src_idx)
    out_fused = fused.apply(params, h0, h1, edge, rel, mask, src_idx=src_idx)
    for d in out_ref:
        np.testing.assert_allclose(out_fused[d], out_ref[d],
                                   rtol=5e-5, atol=5e-5)

    def loss(mod, params, h0, h1, edge):
        out = mod.apply(params, h0, h1, edge, rel, mask, src_idx=src_idx)
        return sum(jnp.sum(out[d] ** 2) for d in out)

    g_ref = jax.grad(lambda p, a, b, e: loss(ref, p, a, b, e),
                     argnums=(0, 1, 2, 3))(params, h0, h1, edge)
    g_fused = jax.grad(lambda p, a, b, e: loss(fused, p, a, b, e),
                       argnums=(0, 1, 2, 3))(params, h0, h1, edge)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=5e-5)


@pytest.mark.parametrize("gather", [False, True])
def test_chunked_backward_matches_whole(gather, monkeypatch):
    """The row-chunked recompute backward (engaged automatically past 128 dst
    rows, where the whole-tensor xla_reference vjp's padded per-edge temps
    were the top allocations of the L=512 train-step OOM) is the exact slice
    decomposition of the whole-tensor vjp. Forced on at tiny shapes here with
    a chunk that does NOT divide the padded row count (exercises the row
    padding) and compared against the default whole-tensor backward."""
    from rosettafold_tpu.ops.pallas import se3_attend

    f_in, f_out = jse3.Fiber({0: 8, 1: 3}), jse3.Fiber({0: 8, 1: 8})
    B, L, S = 1, 16, 8
    h, h_src, feat, basis, mask = _make_inputs(
        jax.random.PRNGKey(9), B, L, S, f_in, gather)
    _, fused = _mods(f_in, f_out, n_heads=2, div=2)
    params = fused.init(jax.random.PRNGKey(10), h, feat, basis, mask,
                        h_src=h_src)

    def loss(params, h, feat):
        out = fused.apply(params, h, feat, basis, mask, h_src=h_src)
        return sum(jnp.sum(out[d] ** 2) for d in out)

    g_whole = jax.grad(loss, argnums=(0, 1, 2))(params, h, feat)
    monkeypatch.setattr(se3_attend, "_BWD_ROW_CHUNK", 6)
    g_chunk = jax.grad(loss, argnums=(0, 1, 2))(params, h, feat)
    flat_w, _ = jax.tree_util.tree_flatten(g_whole)
    flat_c, _ = jax.tree_util.tree_flatten(g_chunk)
    for a, b in zip(flat_w, flat_c):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_se3_transformer_fused_matches_xla():
    B, L = 1, 16
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    h0 = jax.random.normal(ks[0], (B, L, 12, 1))
    h1 = jax.random.normal(ks[1], (B, L, 3, 3))
    edge = jax.random.normal(ks[2], (B, L, L, 16))
    rel = jax.random.normal(ks[3], (B, L, L, 3))
    mask = jax.random.bernoulli(ks[4], 0.8, (B, L, L)).at[..., 0].set(True)
    kw = dict(num_layers=2, num_channels=8, n_heads=2, div=2,
              l0_in_features=12, l0_out_features=8, num_edge_features=16)
    ref = jse3.SE3Transformer(impl="xla", **kw)
    fused = jse3.SE3Transformer(impl="pallas", **kw)
    params = ref.init(jax.random.PRNGKey(5), h0, h1, edge, rel, mask)
    out_ref = ref.apply(params, h0, h1, edge, rel, mask)
    out_fused = fused.apply(params, h0, h1, edge, rel, mask)
    for d in out_ref:
        np.testing.assert_allclose(out_fused[d], out_ref[d],
                                   rtol=5e-5, atol=5e-5)
