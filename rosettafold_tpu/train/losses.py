"""Training losses: 6D geometry cross-entropy + coordinate + plDDT terms.

Fulfils what the reference's Lightning stubs promise but never deliver
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1291-1298), per
BASELINE.json config 5: CE over theta/phi/omega/dist bins, a superposition-free
coordinate term (dRMSD), and a plDDT regression term against the true per-residue
CA lDDT.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import geometry


def binned_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean CE. logits (B, L, L, bins), labels int (B, L, L), mask bool."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return -jnp.sum(jnp.where(mask, ll, 0.0)) / denom


def plddt_loss(
    plddt_logits: jnp.ndarray,
    pred_xyz: jnp.ndarray,
    true_xyz: jnp.ndarray,
    residue_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """MSE between sigmoid(plddt head) and the true per-residue CA lDDT.

    The head emits raw linear outputs (reference :1114,:1124-1126 applies no
    activation); we interpret them through a sigmoid for the [0,1] target.
    Padded residues (residue_mask False) are excluded from the mean."""
    target = jax.lax.stop_gradient(
        geometry.lddt_ca(pred_xyz, true_xyz, residue_mask=residue_mask)
    )
    err = (jax.nn.sigmoid(plddt_logits) - target) ** 2
    if residue_mask is None:
        return jnp.mean(err)
    m = residue_mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1)


DEFAULT_WEIGHTS = {
    "dist": 1.0,
    "omega": 0.5,
    "theta": 0.5,
    "phi": 0.5,
    "xyz": 1.0,
    "plddt": 0.1,
}


def rosettafold_loss(
    outputs: Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray],
    true_xyz: jnp.ndarray,
    residue_mask: jnp.ndarray = None,
    weights: Dict[str, float] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss from model outputs (logits, xyz, plddt) and true backbone coords.

    Labels are derived on the fly from true_xyz (B, L, 3, 3) via the 6D geometry
    pipeline — the natural self-supervised setup for PDB training data.

    residue_mask (B, L) bool/float marks valid (non-padded) residues; padded
    positions carry zeroed coordinates in the dataset (data/dataset.py) and are
    excluded from every term (CE pairs, dRMSD pairs, lDDT neighbors and plDDT
    positions) so variable-length crops train uncorrupted.
    """
    w = dict(DEFAULT_WEIGHTS)
    if weights:
        w.update(weights)
    logits, pred_xyz, plddt = outputs
    labels = geometry.sixd_labels(true_xyz)
    mask = labels["mask_2d"]
    if residue_mask is not None:
        m = residue_mask.astype(bool)
        mask = mask & m[:, :, None] & m[:, None, :]

    metrics = {}
    total = 0.0
    for head in ("dist", "omega", "theta", "phi"):
        ce = binned_cross_entropy(logits[head], labels[head], mask)
        metrics[f"ce_{head}"] = ce
        total = total + w[head] * ce

    xyz_term = jnp.mean(geometry.drmsd(pred_xyz, true_xyz, residue_mask=residue_mask))
    metrics["drmsd"] = xyz_term
    total = total + w["xyz"] * xyz_term

    pl = plddt_loss(plddt, pred_xyz, true_xyz, residue_mask=residue_mask)
    metrics["plddt_mse"] = pl
    total = total + w["plddt"] * pl

    metrics["total"] = total
    return total, metrics
