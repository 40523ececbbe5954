"""File-based training dataset: (A3M, PDB) pairs -> fixed-shape batches.

The reference ships no data/training pipeline at all (SURVEY.md §1); this
supplies the loader feeding train/loop.py. Every example is cropped/padded to
static (n_seq, crop_len) shapes so one jit-compiled train step serves the whole
dataset. Host-side numpy only; arrays are device-put by the step/mesh layer.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .a3m import load_a3m, msa_features
from .pdb import read_pdb_backbone
from .vocab import GAP, tokenize


@dataclasses.dataclass
class Example:
    msa: np.ndarray  # (N, L) int32
    xyz: np.ndarray  # (L, 3, 3) float32
    aa_idx: np.ndarray  # (L,) int32
    mask: np.ndarray  # (L,) bool - valid residues (False = padding)


def load_example(a3m_path: str, pdb_path: str, chain: Optional[str] = None) -> Example:
    tokens = load_a3m(a3m_path)
    xyz, _seq = read_pdb_backbone(pdb_path, chain)
    L = min(tokens.shape[1], xyz.shape[0])
    return Example(
        msa=tokens[:, :L].astype(np.int32),
        xyz=xyz[:L],
        aa_idx=np.arange(L, dtype=np.int32),
        mask=np.ones(L, bool),
    )


def crop_pad(ex: Example, n_seq: int, crop_len: int, rng: np.random.Generator) -> Example:
    """Random contiguous crop to crop_len (pad with gap tokens / zeros)."""
    N, L = ex.msa.shape
    if L > crop_len:
        start = int(rng.integers(0, L - crop_len + 1))
        sl = slice(start, start + crop_len)
        msa, xyz, aa, mask = ex.msa[:, sl], ex.xyz[sl], ex.aa_idx[sl], ex.mask[sl]
    else:
        pad = crop_len - L
        msa = np.pad(ex.msa, ((0, 0), (0, pad)), constant_values=GAP)
        xyz = np.pad(ex.xyz, ((0, pad), (0, 0), (0, 0)))
        aa = np.pad(ex.aa_idx, (0, pad), constant_values=ex.aa_idx[-1] if L else 0)
        mask = np.pad(ex.mask, (0, pad))

    if msa.shape[0] >= n_seq:
        keep = np.concatenate([[0], 1 + rng.permutation(msa.shape[0] - 1)[: n_seq - 1]])
        msa = msa[np.sort(keep)]
    else:
        msa = np.pad(msa, ((0, n_seq - msa.shape[0]), (0, 0)), constant_values=GAP)
    return Example(msa=msa, xyz=xyz, aa_idx=aa, mask=mask)


def batches(
    pairs: Sequence[Tuple[str, str]],
    batch_size: int = 4,
    n_seq: int = 16,
    crop_len: int = 128,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Yield shuffled fixed-shape batches forever (or for `epochs` passes).

    Batch dict matches train/step.py: msa (B,N,L) int32, seq (B,L), aa_idx
    (B,L), xyz (B,L,3,3) f32 — plus mask (B,L)."""
    rng = np.random.default_rng(seed)
    cache: List[Example] = [load_example(a, p) for a, p in pairs]
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(cache))
        buf: List[Example] = []
        for i in order:
            buf.append(crop_pad(cache[i], n_seq, crop_len, rng))
            if len(buf) == batch_size:
                yield {
                    "msa": np.stack([e.msa for e in buf]),
                    "seq": np.stack([e.msa[0] for e in buf]),
                    "aa_idx": np.stack([e.aa_idx for e in buf]),
                    "xyz": np.stack([e.xyz for e in buf]),
                    "mask": np.stack([e.mask for e in buf]),
                }
                buf = []
        epoch += 1
