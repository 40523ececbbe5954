"""File-based training dataset: (A3M, PDB) pairs -> fixed-shape batches.

The reference ships no data/training pipeline at all (SURVEY.md §1); this
supplies the loader feeding train/loop.py. Every example is cropped/padded to
static (n_seq, crop_len) shapes so one jit-compiled train step serves the whole
dataset. Host-side numpy only; arrays are device-put by the step/mesh layer.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .a3m import load_a3m, msa_features
from .pdb import read_pdb_backbone
from .sampling import subsample_rows
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


def crop_pad(
    ex: Example,
    n_seq: int,
    crop_len: int,
    rng: np.random.Generator,
    subsample: str = "uniform",
) -> Example:
    """Random contiguous crop to crop_len (pad with gap tokens / zeros).

    `subsample` picks the MSA row-selection strategy when the alignment is
    deeper than n_seq — see data.sampling.subsample_rows."""
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
        msa = msa[subsample_rows(msa, n_seq, rng, subsample)]
    else:
        msa = np.pad(msa, ((0, n_seq - msa.shape[0]), (0, 0)), constant_values=GAP)
    return Example(msa=msa, xyz=xyz, aa_idx=aa, mask=mask)


def prefetch(it: Iterator[dict], size: int = 2) -> Iterator[dict]:
    """Run `it` on a background thread, keeping up to `size` batches ready.

    Overlaps host-side example assembly (crop/pad/subsample — pure numpy)
    with the device step: while the chip runs step i, the loader builds
    batch i+1. Worker exceptions re-raise at the consuming `next()`."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END, _ERR = object(), object()

    def _worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 - relayed to the consumer
            q.put((_ERR, e))

    threading.Thread(target=_worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item


def batches(
    pairs: Sequence[Tuple[str, str]],
    batch_size: int = 4,
    n_seq: int = 16,
    crop_len: int = 128,
    seed: int = 0,
    epochs: Optional[int] = None,
    subsample: str = "uniform",
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[dict]:
    """Yield shuffled fixed-shape batches forever (or for `epochs` passes).

    Batch dict matches train/step.py: msa (B,N,L) int32, seq (B,L), aa_idx
    (B,L), xyz (B,L,3,3) f32 — plus mask (B,L).

    Multi-host: pass process_index=jax.process_index(),
    process_count=jax.process_count() and the SAME seed on every host — all
    hosts then draw one shared per-epoch permutation and host i consumes the
    strided slice order[i::process_count], so the global batch is a disjoint
    cover of the dataset with no inter-host coordination (each host feeds its
    local devices; the 'dp' mesh axis does the gradient psum). batch_size is
    the PER-HOST batch. Per-host crop/subsample randomness is decorrelated by
    folding process_index into the augmentation rng."""
    if not (0 <= process_index < process_count):
        raise ValueError(f"process_index {process_index} outside "
                         f"[0, {process_count})")
    # shared stream: identical on every host (epoch shuffle must agree)
    shuffle_rng = np.random.default_rng(seed)
    # per-host stream: crop offsets / row subsampling diverge across hosts
    rng = np.random.default_rng((seed, process_index))
    cache: List[Example] = [load_example(a, p) for a, p in pairs]
    epoch = 0
    while epochs is None or epoch < epochs:
        order = shuffle_rng.permutation(len(cache))[process_index::process_count]
        buf: List[Example] = []
        for i in order:
            buf.append(crop_pad(cache[i], n_seq, crop_len, rng,
                                subsample=subsample))
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
