"""A3M / FASTA MSA loading.

The reference ships no data pipeline (SURVEY.md §1 "What does NOT exist"); this
supplies BASELINE config 2 (inference from a real A3M). The hot path is a native
C++ parser (native/a3m_parser.cpp) bound via ctypes — compiled on demand with
g++ and cached — with a pure-Python fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from .vocab import tokenize

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "a3m_parser.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "liba3m.so")

_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_native_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib_handle, _native_failed
    with _lock:
        if _lib_handle is not None or _native_failed:
            return _lib_handle
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.a3m_parse.restype = ctypes.c_int
            lib.a3m_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib_handle = lib
        except Exception:
            _native_failed = True
        return _lib_handle


def _parse_python(path: str, max_seqs: int) -> np.ndarray:
    """Pure-Python fallback parser (same semantics as the native one)."""
    seqs = []
    cur: list = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
                if len(seqs) >= max_seqs:
                    break
            elif line:
                cur.append("".join(c for c in line if not (c.islower() or c == ".")))
    if cur and len(seqs) < max_seqs:
        seqs.append("".join(cur))
    if not seqs:
        raise ValueError(f"no sequences in {path}")
    L = len(seqs[0])
    if any(len(s) != L for s in seqs):
        raise ValueError(f"ragged alignment in {path}")
    return np.stack([tokenize(s) for s in seqs]).astype(np.int8)


def load_a3m(
    path: str, max_seqs: int = 10000, max_len: int = 8192, use_native: bool = True
) -> np.ndarray:
    """Parse an A3M/FASTA file -> (n_seqs, L) int8 token matrix (query row 0)."""
    lib = _load_native() if use_native else None
    if lib is None:
        return _parse_python(path, max_seqs)

    out = np.zeros((max_seqs, max_len), dtype=np.int8)
    n_seqs = ctypes.c_int(0)
    seq_len = ctypes.c_int(0)
    rc = lib.a3m_parse(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        max_seqs,
        max_len,
        ctypes.byref(n_seqs),
        ctypes.byref(seq_len),
    )
    if rc == 1:
        raise IOError(f"cannot read {path}")
    if rc == 2:
        raise ValueError(f"no sequences in {path}")
    if rc == 3:
        raise ValueError(f"ragged alignment or sequence > {max_len} in {path}")
    return np.ascontiguousarray(out[: n_seqs.value, : seq_len.value])


def msa_features(
    tokens: np.ndarray,
    n_seq: int = 64,
    crop_len: Optional[int] = None,
    subsample: str = "first",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token matrix -> model inputs (msa (1, N, L), seq (1, L), aa_idx (1, L)).

    Keeps the query plus n_seq-1 alignment rows (deduplicated), optionally
    cropping to crop_len residues. `subsample` picks WHICH rows when the
    alignment is deeper than n_seq: "first" (the default — alignment order,
    i.e. search-tool ranking) or any data.sampling strategy
    ("uniform"/"weighted"/"diversity" — e.g. diversity-maximized coverage of
    a deep alignment). `seed` only matters for the stochastic strategies;
    the default keeps inference deterministic.
    """
    _, uniq_idx = np.unique(
        tokens.view([("", tokens.dtype)] * tokens.shape[1]), return_index=True
    )
    keep = np.sort(uniq_idx)
    if keep[0] != 0:
        keep = np.concatenate([[0], keep[keep != 0]])
    tokens = tokens[keep]
    if subsample == "first" or tokens.shape[0] <= n_seq:
        tokens = tokens[:n_seq]
    else:
        from .sampling import subsample_rows

        tokens = tokens[subsample_rows(
            tokens, n_seq, np.random.default_rng(seed), subsample)]

    if crop_len is not None:
        tokens = tokens[:, :crop_len]
    msa = tokens[None].astype(np.int32)
    seq = msa[:, 0]
    aa_idx = np.arange(msa.shape[-1], dtype=np.int32)[None]
    return msa, seq, aa_idx
