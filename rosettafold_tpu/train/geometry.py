"""Backbone geometry: virtual CB, 6D inter-residue features, binned labels, lDDT.

The reference promises training via Lightning hooks but implements none
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1291-1298). This module
supplies the label pipeline the heads need (theta/phi/omega 37/37/37 bins, phi 19
bins; see PredictionHead, reference :1142-1157), using the standard trRosetta /
RoseTTAFold 6D definitions:

  dist  = |CB_i - CB_j|                 36 bins of 0.5 A over [2, 20) + no-contact
  omega = dihedral(CA_i, CB_i, CB_j, CA_j)   36 bins of 10 deg + no-contact
  theta = dihedral(N_i, CA_i, CB_i, CB_j)    36 bins of 10 deg + no-contact
  phi   = angle(CA_i, CB_i, CB_j)            18 bins of 10 deg + no-contact

CB is the standard virtual C-beta built from the N/CA/C frame. Everything is
static-shape jnp, usable inside jit.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

N_IDX, CA_IDX, C_IDX = 0, 1, 2

DIST_BINS = 37
OMEGA_BINS = 37
THETA_BINS = 37
PHI_BINS = 19
NO_CONTACT_CUTOFF = 20.0


def virtual_cb(xyz: jnp.ndarray) -> jnp.ndarray:
    """Ideal C-beta position from backbone N/CA/C (B, L, 3, 3) -> (B, L, 3).

    Standard construction: b = CA - N, c = C - CA, a = b x c,
    CB = -0.58273431*a + 0.56802827*b - 0.54067466*c + CA.
    """
    n, ca, c = xyz[..., N_IDX, :], xyz[..., CA_IDX, :], xyz[..., C_IDX, :]
    b = ca - n
    cc = c - ca
    a = jnp.cross(b, cc)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * cc + ca


def _dihedral(p0, p1, p2, p3, eps=1e-8):
    """Dihedral angle (radians, in (-pi, pi]) for batched points (..., 3)."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = b1 / (jnp.linalg.norm(b1, axis=-1, keepdims=True) + eps)
    v = b0 - jnp.sum(b0 * b1n, axis=-1, keepdims=True) * b1n
    w = b2 - jnp.sum(b2 * b1n, axis=-1, keepdims=True) * b1n
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1n, v) * w, axis=-1)
    return jnp.arctan2(y, x + eps)


def _planar_angle(p0, p1, p2, eps=1e-8):
    """Angle at p1 in [0, pi] for batched points (..., 3)."""
    v1 = p0 - p1
    v2 = p2 - p1
    v1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + eps)
    v2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + eps)
    return jnp.arccos(jnp.clip(jnp.sum(v1 * v2, axis=-1), -1.0, 1.0))


def sixd_labels(xyz: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Binned 6D geometry labels from true backbone coords (B, L, 3, 3).

    Returns int32 labels: dist/omega/theta (B, L, L) in [0, 36], phi in [0, 18].
    The last bin of each head is the no-contact bin (CB distance >= 20 A, and the
    diagonal)."""
    ca = xyz[..., CA_IDX, :]
    n = xyz[..., N_IDX, :]
    cb = virtual_cb(xyz)

    B, L = ca.shape[:2]
    cb_i = cb[:, :, None, :]
    cb_j = cb[:, None, :, :]
    dist = jnp.sqrt(jnp.sum((cb_i - cb_j) ** 2, axis=-1) + 1e-8)

    eye = jnp.eye(L, dtype=bool)[None]
    no_contact = (dist >= NO_CONTACT_CUTOFF) | eye

    dist_bin = jnp.clip(((dist - 2.0) / 0.5).astype(jnp.int32), 0, 35)
    dist_lab = jnp.where(no_contact, DIST_BINS - 1, dist_bin)

    ca_i, ca_j = ca[:, :, None, :], ca[:, None, :, :]
    n_i = n[:, :, None, :]

    omega = _dihedral(ca_i, cb_i, cb_j, ca_j)  # (-pi, pi]
    theta = _dihedral(n_i, ca_i, cb_i, cb_j)
    phi = _planar_angle(ca_i, cb_i, cb_j)  # [0, pi]

    def _angle_bin(x, n_bins):  # x in (-pi, pi], n_bins over full circle
        deg = jnp.degrees(x) + 180.0
        return jnp.clip((deg / 10.0).astype(jnp.int32), 0, n_bins - 1)

    omega_lab = jnp.where(no_contact, OMEGA_BINS - 1, _angle_bin(omega, 36))
    theta_lab = jnp.where(no_contact, THETA_BINS - 1, _angle_bin(theta, 36))
    phi_bin = jnp.clip((jnp.degrees(phi) / 10.0).astype(jnp.int32), 0, 17)
    phi_lab = jnp.where(no_contact, PHI_BINS - 1, phi_bin)

    return {
        "dist": dist_lab,
        "omega": omega_lab,
        "theta": theta_lab,
        "phi": phi_lab,
        "mask_2d": ~eye & jnp.ones((B, L, L), bool),
    }


def lddt_ca(
    pred_xyz: jnp.ndarray,
    true_xyz: jnp.ndarray,
    cutoff: float = 15.0,
    residue_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Per-residue CA lDDT in [0, 1] (B, L): fraction of preserved local distances
    at thresholds 0.5/1/2/4 A among true-structure neighbors within `cutoff`.

    residue_mask (B, L) bool: padded residues are excluded from the neighbor sets
    (their own rows are arbitrary and must be masked out by the caller)."""
    def pdist(x):
        d = x[:, :, None, :] - x[:, None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)

    dt = pdist(true_xyz[..., CA_IDX, :])
    dp = pdist(pred_xyz[..., CA_IDX, :])
    L = dt.shape[1]
    incl = (dt < cutoff) & ~jnp.eye(L, dtype=bool)[None]
    if residue_mask is not None:
        incl = incl & residue_mask[:, None, :].astype(bool)
    diff = jnp.abs(dt - dp)
    score = sum((diff < t).astype(jnp.float32) for t in (0.5, 1.0, 2.0, 4.0)) / 4.0
    denom = jnp.maximum(jnp.sum(incl, axis=-1), 1)
    return jnp.sum(score * incl, axis=-1) / denom


def drmsd(
    pred_xyz: jnp.ndarray,
    true_xyz: jnp.ndarray,
    residue_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Superposition-free distance-matrix RMSD over CA atoms (scalar per batch).

    residue_mask (B, L) bool: only valid x valid off-diagonal pairs contribute."""
    def pdist(x):
        d = x[:, :, None, :] - x[:, None, :, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)

    dt = pdist(true_xyz[..., CA_IDX, :])
    dp = pdist(pred_xyz[..., CA_IDX, :])
    L = dt.shape[1]
    off = ~jnp.eye(L, dtype=bool)[None]
    if residue_mask is not None:
        m = residue_mask.astype(bool)
        off = off & m[:, :, None] & m[:, None, :]
    sq = jnp.where(off, (dt - dp) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(sq, axis=(1, 2)) / jnp.maximum(jnp.sum(off, axis=(1, 2)), 1))
