"""Pallas kernel tests (run in interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rosettafold_tpu.models.msa import SoftTiedAttentionOverResidues
from rosettafold_tpu.ops.pallas.tied_attention import tied_flash_attention
from rosettafold_tpu.utils.testing import japply, jinit


def _ref_attention(q, k, v):
    s = jnp.einsum("bie,bje->bij", q, k, precision=jax.lax.Precision.HIGHEST)
    att = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjd->bid", att, v)


def test_tied_flash_matches_reference():
    BH, L, ND, NDv = 3, 256, 48, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (BH, L, ND)) * 0.3
    k = jax.random.normal(ks[1], (BH, L, ND)) * 0.3
    v = jax.random.normal(ks[2], (BH, L, NDv))
    out = jax.jit(tied_flash_attention)(q, k, v)
    ref = jax.jit(_ref_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tied_flash_gradients_match():
    BH, L, ND = 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (BH, L, ND)) * 0.3
    k = jax.random.normal(ks[1], (BH, L, ND)) * 0.3
    v = jax.random.normal(ks[2], (BH, L, ND))

    f_ker = jax.jit(jax.grad(lambda q, k, v: jnp.sum(tied_flash_attention(q, k, v) ** 2), (0, 1, 2)))
    f_ref = jax.jit(jax.grad(lambda q, k, v: jnp.sum(_ref_attention(q, k, v) ** 2), (0, 1, 2)))
    g_ker = f_ker(q, k, v)
    g_ref = f_ref(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_soft_tied_attention_pallas_matches_xla():
    """The module-level pallas path must agree with the XLA path exactly
    (same params, same inputs)."""
    B, N, L, D = 1, 4, 128, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, L, D))
    xla_mod = SoftTiedAttentionOverResidues(d_msa=D, n_heads=4, p_dropout=0.0)
    pal_mod = SoftTiedAttentionOverResidues(
        d_msa=D, n_heads=4, p_dropout=0.0, attn_impl="pallas"
    )
    params = jinit(xla_mod, jax.random.PRNGKey(1), x)
    out_xla = japply(xla_mod, params, x)
    out_pal = japply(pal_mod, params, x)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_xla), atol=5e-5
    )


def test_tied_flash_pad_shim_any_length():
    """L=250 (config-2 shape, not a 128 multiple) must use the kernel via the
    internal pad shim and match the reference computation (VERDICT r1 #7)."""
    BH, L, ND, NDv = 2, 250, 32, 48
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (BH, L, ND)) * 0.3
    k = jax.random.normal(ks[1], (BH, L, ND)) * 0.3
    v = jax.random.normal(ks[2], (BH, L, NDv))
    out = jax.jit(tied_flash_attention)(q, k, v)
    ref = jax.jit(_ref_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_soft_tied_attention_pallas_odd_length():
    B, N, L, D = 1, 3, 77, 48
    x = jax.random.normal(jax.random.PRNGKey(3), (B, N, L, D))
    xla_mod = SoftTiedAttentionOverResidues(d_msa=D, n_heads=4, p_dropout=0.0)
    pal_mod = SoftTiedAttentionOverResidues(
        d_msa=D, n_heads=4, p_dropout=0.0, attn_impl="pallas"
    )
    params = jinit(xla_mod, jax.random.PRNGKey(1), x)
    out_xla = japply(xla_mod, params, x)
    out_pal = japply(pal_mod, params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla), atol=5e-5)


def test_generalized_linear_attention_matches_xla():
    """Fused FAVOR+ kernel vs the einsum implementation (same projection)."""
    from rosettafold_tpu.ops.pallas.linear_attention import (
        generalized_linear_attention,
    )
    from rosettafold_tpu.ops.performer import favor_attention, gaussian_orthogonal_matrix

    P, L, dh, m = 5, 40, 16, 48
    proj = jnp.asarray(gaussian_orthogonal_matrix(m, dh, seed=0))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (P, L, dh))
    k = jax.random.normal(ks[1], (P, L, dh))
    v = jax.random.normal(ks[2], (P, L, dh))

    scale = dh**-0.25
    out = jax.jit(generalized_linear_attention, static_argnums=(4, 5))(
        q * scale, k * scale, v, proj, 1e-3, 2
    )
    ref = jax.jit(
        lambda q, k, v: favor_attention(q, k, v, proj, generalized=True)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_performer_module_pallas_matches_xla():
    from rosettafold_tpu.models.attention import PerformerSelfAttention

    # force the fused path at test-sized L (default crossover is L>=512)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 20, 24))
    xla_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32)
    pal_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32,
                                     attn_impl="pallas", fused_favor_min_l=1)
    params = jinit(xla_mod, jax.random.PRNGKey(1), x)
    out_xla = japply(xla_mod, params, x)
    out_pal = japply(pal_mod, params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla), atol=3e-5)


def test_performer_module_fused_gradients_match():
    """Fully fused layer kernel backward vs the XLA path, through the module
    (4D batch input like the axial pair attention uses)."""
    from rosettafold_tpu.models.attention import PerformerSelfAttention

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 21, 24))
    xla_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32)
    pal_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32,
                                     attn_impl="pallas", fused_favor_min_l=1)
    params = jinit(xla_mod, jax.random.PRNGKey(1), x)

    def loss(mod):
        return lambda p, x: jnp.sum(mod.apply(p, x) ** 2)

    g_xla = jax.jit(jax.grad(loss(xla_mod), argnums=(0, 1)))(params, x)
    g_pal = jax.jit(jax.grad(loss(pal_mod), argnums=(0, 1)))(params, x)
    # input grad
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_xla[1]),
                               atol=5e-5)
    # param grads (same tree structure by construction)
    flat_x = jax.tree.leaves(g_xla[0])
    flat_p = jax.tree.leaves(g_pal[0])
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_tied_flash_gradients_odd_length():
    """Flash backward through the pad shim (L not a 128 multiple)."""
    BH, L, ND = 2, 90, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (BH, L, ND)) * 0.3
    k = jax.random.normal(ks[1], (BH, L, ND)) * 0.3
    v = jax.random.normal(ks[2], (BH, L, ND))

    f_ker = jax.jit(jax.grad(lambda q, k, v: jnp.sum(tied_flash_attention(q, k, v) ** 2), (0, 1, 2)))
    f_ref = jax.jit(jax.grad(lambda q, k, v: jnp.sum(_ref_attention(q, k, v) ** 2), (0, 1, 2)))
    for a, b in zip(f_ker(q, k, v), f_ref(q, k, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_performer_module_fused_multirow_blocks():
    """TR > 1 path: at small L the fused layer kernel stacks several
    row-problems per grid program (R divisible by TR=4 at L_pad=128)."""
    from rosettafold_tpu.models.attention import PerformerSelfAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (8, 20, 24))
    xla_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32)
    pal_mod = PerformerSelfAttention(dim=24, heads=2, dim_head=16,
                                     generalized_attention=True, nb_features=32,
                                     attn_impl="pallas", fused_favor_min_l=1)
    params = jinit(xla_mod, jax.random.PRNGKey(1), x)
    out_xla = japply(xla_mod, params, x)
    out_pal = japply(pal_mod, params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               atol=3e-5)


def test_linear_attention_quadratic_association_matches():
    """Short attended axes use (phi_q phi_k^T) v — identical by associativity
    to the O(L) order (the MSA sequence-wise attention over N=8 homologs)."""
    from rosettafold_tpu.ops import performer as favor

    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    L, m, e = 8, 96, 32  # L*(m+e) < 2*m*e -> quadratic path
    qf = jax.nn.relu(jax.random.normal(ks[0], (5, 4, L, m))) + 1e-3
    kf = jax.nn.relu(jax.random.normal(ks[1], (5, 4, L, m))) + 1e-3
    v = jax.random.normal(ks[2], (5, 4, L, e))
    out = favor.linear_attention(qf, kf, v)
    # the linear association, inlined
    ksum = jnp.sum(kf, axis=-2)
    den = jnp.einsum("...lm,...m->...l", qf, ksum) + 1e-12
    ctx = jnp.einsum("...lm,...le->...me", kf, v)
    ref = jnp.einsum("...me,...lm->...le", ctx, qf) / den[..., None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_ln_performer_residual_matches_composed():
    """LN+residual-folded kernel vs the composed ops (LN in XLA, the fused
    layer's own XLA reference, explicit residual add)."""
    from rosettafold_tpu.ops.pallas.fused_performer import (
        _ln,
        fused_ln_performer_residual,
        xla_reference,
    )

    R, L, D, h, dh, m = 4, 20, 24, 2, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    x = jax.random.normal(ks[0], (R, L, D))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    beta = 0.1 * jax.random.normal(ks[2], (D,))
    wq = jax.random.normal(ks[3], (D, h * dh)) * 0.2
    wk = jax.random.normal(ks[4], (D, h * dh)) * 0.2
    wv = jax.random.normal(ks[5], (D, h * dh)) * 0.2
    wo = jax.random.normal(ks[6], (h * dh, D)) * 0.2
    bo = 0.1 * jax.random.normal(ks[7], (D,))
    proj = jax.random.normal(ks[8], (m, dh))
    scale = dh**-0.25

    out = jax.jit(fused_ln_performer_residual, static_argnums=(9, 10, 11, 12, 13))(
        x, gamma, beta, wq, wk, wv, wo, bo, proj, scale, 1e-3, h, dh, 1e-5)
    y = _ln(x, gamma, beta, 1e-5).astype(x.dtype)
    want = x + xla_reference(y, wq, wk, wv, wo, bo, proj, scale, 1e-3, h, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-5)


def test_fused_ln_performer_residual_gradients():
    from rosettafold_tpu.ops.pallas.fused_performer import (
        _ln,
        fused_ln_performer_residual,
        xla_reference,
    )

    R, L, D, h, dh, m = 2, 18, 24, 2, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(8), 9)
    x = jax.random.normal(ks[0], (R, L, D))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    beta = 0.1 * jax.random.normal(ks[2], (D,))
    wq = jax.random.normal(ks[3], (D, h * dh)) * 0.2
    wk = jax.random.normal(ks[4], (D, h * dh)) * 0.2
    wv = jax.random.normal(ks[5], (D, h * dh)) * 0.2
    wo = jax.random.normal(ks[6], (h * dh, D)) * 0.2
    bo = 0.1 * jax.random.normal(ks[7], (D,))
    proj = jax.random.normal(ks[8], (m, dh))
    scale = dh**-0.25
    args = (x, gamma, beta, wq, wk, wv, wo, bo)

    def loss_fused(*a):
        return jnp.sum(fused_ln_performer_residual(
            *a, proj, scale, 1e-3, h, dh, 1e-5) ** 2)

    def loss_ref(x_, g_, b_, *w):
        y = _ln(x_, g_, b_, 1e-5).astype(x_.dtype)
        return jnp.sum((x_ + xla_reference(
            y, *w, proj, scale, 1e-3, h, dh)) ** 2)

    g_f = jax.jit(jax.grad(loss_fused, argnums=tuple(range(8))))(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(8))))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_ln_performer_residual_axis1_matches():
    """The strided axis-1 LN+residual kernel (production RowWise path at the
    headline L=128 configs) vs the composed ops, forward AND gradients.
    L1=128 satisfies the `x.shape[1] % 128 == 0` gate in attention.py, so this
    exercises _fwd_kernel_t_lnres / _forward_axis1_lnres directly — the layer
    test at L=16 only reaches the swapaxes fallback (ADVICE r3, medium)."""
    from rosettafold_tpu.ops.pallas.fused_performer import (
        _ln,
        fused_ln_performer_residual_axis1,
        xla_reference,
    )

    B, L1, L2, D, h, dh, m = 1, 128, 8, 24, 2, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(12), 9)
    x = jax.random.normal(ks[0], (B, L1, L2, D))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    beta = 0.1 * jax.random.normal(ks[2], (D,))
    wq = jax.random.normal(ks[3], (D, h * dh)) * 0.2
    wk = jax.random.normal(ks[4], (D, h * dh)) * 0.2
    wv = jax.random.normal(ks[5], (D, h * dh)) * 0.2
    wo = jax.random.normal(ks[6], (h * dh, D)) * 0.2
    bo = 0.1 * jax.random.normal(ks[7], (D,))
    proj = jax.random.normal(ks[8], (m, dh))
    scale = dh**-0.25

    def composed(x_, g_, b_, wq_, wk_, wv_, wo_, bo_):
        xt = jnp.swapaxes(x_, 1, 2).reshape(B * L2, L1, D)
        y = _ln(xt, g_, b_, 1e-5).astype(xt.dtype)
        ot = xt + xla_reference(y, wq_, wk_, wv_, wo_, bo_, proj,
                                scale, 1e-3, h, dh)
        return jnp.swapaxes(ot.reshape(B, L2, L1, D), 1, 2)

    args = (x, gamma, beta, wq, wk, wv, wo, bo)
    out = jax.jit(fused_ln_performer_residual_axis1,
                  static_argnums=(9, 10, 11, 12, 13))(
        *args, proj, scale, 1e-3, h, dh, 1e-5)
    want = jax.jit(composed)(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-5)

    def loss_fused(*a):
        return jnp.sum(fused_ln_performer_residual_axis1(
            *a, proj, scale, 1e-3, h, dh, 1e-5) ** 2)

    def loss_ref(*a):
        return jnp.sum(composed(*a) ** 2)

    g_f = jax.jit(jax.grad(loss_fused, argnums=tuple(range(8))))(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(8))))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)


def test_fused_ff_matches_composed():
    from rosettafold_tpu.ops.pallas.fused_ff import (
        _xla_composed,
        fused_ln_ff_residual,
    )

    ks = jax.random.split(jax.random.PRNGKey(9), 7)
    B, L1, L2, D, F = 2, 6, 10, 24, 48
    x = jax.random.normal(ks[0], (B, L1, L2, D))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    beta = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = jax.random.normal(ks[3], (D, F)) * 0.2
    b1 = 0.1 * jax.random.normal(ks[4], (F,))
    w2 = jax.random.normal(ks[5], (F, D)) * 0.2
    b2 = 0.1 * jax.random.normal(ks[6], (D,))
    out = jax.jit(fused_ln_ff_residual, static_argnums=(7,))(
        x, gamma, beta, w1, b1, w2, b2, 1e-5)
    want = _xla_composed(x, gamma, beta, w1, b1, w2, b2, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, 1e-5) ** 3)

    g_f = jax.jit(jax.grad(loss(fused_ln_ff_residual), argnums=(0, 1, 2, 3, 4, 5, 6)))(
        x, gamma, beta, w1, b1, w2, b2)
    g_r = jax.jit(jax.grad(loss(_xla_composed), argnums=(0, 1, 2, 3, 4, 5, 6)))(
        x, gamma, beta, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_axial_layer_folded_pallas_matches_xla():
    """PairUpdateWithAxialAttentionLayer with the LN+residual-folded attention
    kernels AND the fused FF kernel vs the plain XLA module, same params."""
    from rosettafold_tpu.models.pair import PairUpdateWithAxialAttentionLayer

    B, L, d = 2, 16, 24
    x = jax.random.normal(jax.random.PRNGKey(10), (B, L, L, d))
    kw = dict(d_pair=d, d_ff=4 * d, n_heads=2, performer_dim_head=16,
              p_dropout=0.0)
    xla_mod = PairUpdateWithAxialAttentionLayer(**kw)
    pal_mod = PairUpdateWithAxialAttentionLayer(
        **kw, attn_impl="pallas", fused_favor_min_l=1, ff_fused_min_l=1)
    params = jinit(xla_mod, jax.random.PRNGKey(11), x)
    out_xla = japply(xla_mod, params, x)
    out_pal = japply(pal_mod, params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               atol=5e-5)

    def loss(mod):
        return lambda p, x: jnp.sum(mod.apply(p, x) ** 2)

    g_xla = jax.jit(jax.grad(loss(xla_mod), argnums=(0, 1)))(params, x)
    g_pal = jax.jit(jax.grad(loss(pal_mod), argnums=(0, 1)))(params, x)
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_xla[1]),
                               atol=5e-4)
    for a, b in zip(jax.tree.leaves(g_xla[0]), jax.tree.leaves(g_pal[0])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3)
