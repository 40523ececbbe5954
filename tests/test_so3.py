"""SO(3) math-layer tests: representation property, convention anchors,
spherical-harmonic equivariance, Q_J intertwining, basis equivariance.

Promotes the reference's hidden self-tests (SO3.py:203-289,
utils_steerable.py:72-75) to first-class pytest, per SURVEY.md §4.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rosettafold_tpu.ops import so3


def test_irr_repr_is_representation():
    for l in range(4):
        a1, b1, c1, a2, b2, c2 = np.random.default_rng(l).uniform(0, 2, 6)
        r1 = so3.irr_repr_np(l, a1, b1, c1)
        r2 = so3.irr_repr_np(l, a2, b2, c2)
        a, b, c = so3.compose_np(a1, b1, c1, a2, b2, c2)
        np.testing.assert_allclose(
            so3.irr_repr_np(l, a, b, c), r1 @ r2, atol=1e-12
        )


def test_irr_repr_is_orthogonal():
    for l in range(3):
        D = so3.irr_repr_np(l, 0.3, 1.1, 2.0)
        np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-12)


def test_wigner_d1_change_of_basis_to_rot():
    """A.T @ D_1 @ A == rot (the reference's anchor, SO3.py:249-267)."""
    A = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], float)
    for a, b, c in np.random.default_rng(0).uniform(0, 2 * math.pi, (5, 3)):
        np.testing.assert_allclose(
            A.T @ so3.irr_repr_np(1, a, b, c) @ A, so3.rot_np(a, b, c), atol=1e-12
        )


def _sph(order, alpha, beta):
    Y = so3.real_spherical_harmonics(
        order, jnp.asarray(math.pi - beta), jnp.asarray(alpha)
    )
    return np.asarray(Y[order])


@pytest.mark.parametrize("order", range(5))
def test_spherical_harmonics_equivariance(order):
    """Y(Z(a)Y(b)Z(c) x) = D(a,b,c) Y(x) (reference SO3.py:223-246)."""
    rng = np.random.default_rng(order)
    a, b = rng.uniform(0.1, 2.8, 2)
    alpha, beta, gamma = rng.uniform(0, 2 * math.pi, 3)
    ra, rb, _ = so3.compose_np(alpha, beta, gamma, a, b, 0.0)
    Yrx = _sph(order, ra, rb)
    DrY = so3.irr_repr_np(order, alpha, beta, gamma) @ _sph(order, a, b)
    np.testing.assert_allclose(Yrx, DrY, atol=1e-5)


def test_sh_against_scipy():
    """Cross-check the tesseral harmonics against scipy's complex SH."""
    from scipy.special import sph_harm_y  # (n, m, polar theta, azimuth phi)

    rng = np.random.default_rng(0)
    theta = rng.uniform(0.1, 3.0, size=(6,))
    phi = rng.uniform(0, 2 * math.pi, size=(6,))
    for l in range(4):
        mine = np.asarray(
            so3.real_spherical_harmonics(l, jnp.asarray(theta), jnp.asarray(phi))[l]
        )
        for m in range(-l, l + 1):
            Yc = sph_harm_y(l, abs(m), theta, phi)
            if m == 0:
                ref = Yc.real
            elif m > 0:
                ref = math.sqrt(2.0) * Yc.real
            else:
                ref = math.sqrt(2.0) * Yc.imag
            np.testing.assert_allclose(mine[:, m + l], ref, atol=1e-5)


def test_q_j_intertwines():
    """kron(D_out, D_in) Q_J = Q_J D_J at random angles (utils_steerable.py:72-75
    promoted to pytest)."""
    rng = np.random.default_rng(1)
    for (J, di, do) in [(0, 0, 0), (1, 0, 1), (1, 1, 0), (0, 1, 1), (1, 1, 1), (2, 1, 1)]:
        Q = so3.basis_transformation_Q_J(J, di, do)
        for a, b, c in rng.uniform(0, 2 * math.pi, (3, 3)):
            R_tensor = np.kron(so3.irr_repr_np(do, a, b, c), so3.irr_repr_np(di, a, b, c))
            np.testing.assert_allclose(
                R_tensor @ Q, Q @ so3.irr_repr_np(J, a, b, c), atol=1e-10
            )


def test_degree1_matches_raw_vectors():
    """In this convention Y_1(d) is proportional to -d: degree-1 features
    transform exactly like raw xyz vectors (the property the whole coordinate
    track relies on)."""
    rng = np.random.default_rng(2)
    d = rng.normal(size=(5, 3))
    _, alpha, beta = so3.spherical_from_cartesian(jnp.asarray(d, dtype=jnp.float32))
    Y1 = np.asarray(
        so3.real_spherical_harmonics(1, math.pi - np.asarray(beta), np.asarray(alpha))[1]
    )
    unit = d / np.linalg.norm(d, axis=-1, keepdims=True)
    scale = -math.sqrt(3.0 / (4.0 * math.pi))
    np.testing.assert_allclose(Y1, scale * unit, atol=1e-5)


def test_equivariant_basis_rotates():
    """basis(R d) = D_out basis(d) D_in^T per frequency, with D_1 acting as R."""
    rng = np.random.default_rng(3)
    d = rng.normal(size=(7, 3)).astype(np.float32)
    R = so3.rot_np(0.3, 1.0, 2.2)
    b0 = so3.equivariant_basis(jnp.asarray(d), 1)
    b1 = so3.equivariant_basis(jnp.asarray(d @ R.T), 1)
    for key in b0:
        di, do = (int(x) for x in key.split(","))
        Din = np.eye(2 * di + 1) if di == 0 else R
        Dout = np.eye(2 * do + 1) if do == 0 else R
        rhs = np.einsum("ab,ebcf,dc->eadf", Dout, np.asarray(b0[key]), Din)
        np.testing.assert_allclose(np.asarray(b1[key]), rhs, atol=3e-3)


def test_xyz_vector_basis_change():
    # reference SO3.py:146-156: irr_repr(1) @ A == A @ rot at random angles
    A = so3.xyz_vector_basis_to_spherical_basis()
    rng = np.random.default_rng(7)
    for _ in range(5):
        a, b, c = rng.uniform(0, 2 * math.pi, 3)
        assert np.allclose(so3.irr_repr_np(1, a, b, c) @ A,
                           A @ so3.rot_np(a, b, c), atol=1e-12)
    assert np.allclose(A @ A.T, np.eye(3))


def test_tensor3x3_repr_is_representation():
    rng = np.random.default_rng(8)
    a1, b1, c1 = rng.uniform(0, 2 * math.pi, 3)
    T = rng.normal(size=(3, 3))
    R = so3.rot_np(a1, b1, c1)
    # kron(R, R) @ vec(T) == vec(R T R^T) with row-major vec
    lhs = so3.tensor3x3_repr_np(a1, b1, c1) @ T.reshape(-1)
    assert np.allclose(lhs, (R @ T @ R.T).reshape(-1), atol=1e-12)


def test_tensor3x3_basis_change_decomposes_1_3_5():
    # reference SO3.py:167-195: the 3x3 tensor rep decomposes into l=0,1,2
    to1, to3, to5 = so3.tensor3x3_repr_basis_to_spherical_basis()
    rng = np.random.default_rng(9)
    for order, A in ((0, to1), (1, to3), (2, to5)):
        a, b, c = rng.uniform(0, 2 * math.pi, 3)
        assert np.allclose(so3.irr_repr_np(order, a, b, c) @ A,
                           A @ so3.tensor3x3_repr_np(a, b, c), atol=1e-10)
    assert to1.shape == (1, 9) and to3.shape == (3, 9) and to5.shape == (5, 9)


def test_scalar_activation_module():
    # reference ScalarActivation3rdDim (utils_steerable.py:317-347)
    import jax
    from rosettafold_tpu.models.se3 import ScalarActivation

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 5, 4)), jnp.float32)
    mod = ScalarActivation(n_dim=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    assert np.allclose(np.asarray(y), np.maximum(np.asarray(x), 0.0))
    # bias participates: shift the bias, the pre-activation shifts with it
    shifted = jax.tree_util.tree_map(lambda p: p + 1.0, params)
    y2 = mod.apply(shifted, x)
    assert np.allclose(np.asarray(y2), np.maximum(np.asarray(x) + 1.0, 0.0))
