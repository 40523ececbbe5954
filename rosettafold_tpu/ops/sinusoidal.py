"""Sinusoidal positional-encoding tables.

Behavioral contract follows the reference tables
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:57-103): interleaved
sin/cos with denominator exp(log(1e4) * (2k)/dim). Unlike the reference (which keeps
the table as a plain attribute and gathers with a Python loop, :63,:73), we build the
table once at trace time as a constant and gather with a single XLA take().
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_table(max_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(max_len, dim) table; even columns sin(pos/denom), odd columns cos(pos/denom)."""
    denom = np.exp(np.log(10000.0) * np.arange(0, dim, 2, dtype=np.float64) / dim)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    table = np.zeros((max_len, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(pos / denom)
    # The cos half uses the same denominator sequence as the sin half (reference :67-68).
    table[:, 1::2] = np.cos(pos / denom[: table[:, 1::2].shape[1]])
    return jnp.asarray(table, dtype=dtype)


def gather_pe(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of the PE table: idx (..., L) int -> (..., L, dim)."""
    return jnp.take(table, idx, axis=0)
