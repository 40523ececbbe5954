"""Generate synthetic (A3M, PDB) training pairs for the train_cli demo.

Zero-egress image: no real PDB/MSA data can be fetched, so this synthesizes
targets with the right statistics for the training pipeline — CASP-style A3Ms
(see make_demo_a3m.py) and backbone PDBs whose CA trace is a smooth 3.8 Å/step
self-avoiding-ish curve with helix-like local geometry, N/C placed at standard
bond lengths from CA. The 6D-geometry losses (train/losses.py) bin real
distances/angles from these coordinates, so a training run on them exercises
every loss term with realistic magnitudes.

Usage: python examples/make_demo_pairs.py OUT_DIR [n_pairs] [L] [seed]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_demo_a3m import AA, FREQ, make as make_a3m  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rosettafold_tpu.data.pdb import write_pdb  # noqa: E402
from rosettafold_tpu.data.vocab import AA_ORDER  # noqa: E402


def make_backbone(L: int, rng: np.random.Generator) -> np.ndarray:
    """(L, 3, 3) N/CA/C coords: CA trace = smooth random curve, 3.8 A steps."""
    # direction random-walks on the sphere with inertia -> locally helix-like
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    ca = [np.zeros(3)]
    for _ in range(L - 1):
        d = d + 0.55 * rng.normal(size=3)
        d /= np.linalg.norm(d)
        ca.append(ca[-1] + 3.8 * d)
    ca = np.stack(ca)                                   # (L, 3)

    xyz = np.zeros((L, 3, 3))
    xyz[:, 1] = ca
    for i in range(L):
        prev_d = ca[i] - ca[i - 1] if i > 0 else ca[i] - ca[i + 1]
        next_d = ca[i + 1] - ca[i] if i < L - 1 else ca[i] - ca[i - 1]
        prev_d = prev_d / (np.linalg.norm(prev_d) + 1e-9)
        next_d = next_d / (np.linalg.norm(next_d) + 1e-9)
        perp = np.cross(prev_d, next_d)
        if np.linalg.norm(perp) < 1e-6:
            perp = np.cross(prev_d, np.array([0.0, 0.0, 1.0]))
        perp = perp / (np.linalg.norm(perp) + 1e-9)
        # N ~1.46 A from CA opposing the chain direction, C ~1.52 A along it
        xyz[i, 0] = ca[i] - 1.46 * (0.8 * prev_d + 0.6 * perp)
        xyz[i, 2] = ca[i] + 1.52 * (0.8 * next_d + 0.6 * perp)
    return xyz


def main(out_dir: str, n_pairs: int = 8, L: int = 64, seed: int = 0):
    os.makedirs(out_dir, exist_ok=True)
    aa_to_idx = {a: i for i, a in enumerate(AA_ORDER)}
    for i in range(n_pairs):
        rng = np.random.default_rng(seed * 1000 + i)
        stem = os.path.join(out_dir, f"target_{i:02d}")
        make_a3m(stem + ".a3m", L=L, n_seq=32, seed=seed * 1000 + i)
        with open(stem + ".a3m") as f:
            f.readline()
            query = f.readline().strip()
        tokens = np.array([aa_to_idx.get(c, 20) for c in query])
        write_pdb(stem + ".pdb", make_backbone(len(query), rng), tokens)
    print(f"wrote {n_pairs} (a3m, pdb) pairs (L={L}) to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "examples/demo_train",
         int(sys.argv[2]) if len(sys.argv) > 2 else 8,
         int(sys.argv[3]) if len(sys.argv) > 3 else 64,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
