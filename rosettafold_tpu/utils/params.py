"""Parameter utilities: counting, summaries, gradient-norm logging.

Covers the reference's utils_logging surface (count_parameters,
utils_logging.py:33-41; log_gradient_norm/get_average, :103-125) in functional
JAX style: gradient norms are returned as metrics from the train step instead of
backward-hook side effects.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params: Any) -> int:
    """Total number of parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def parameter_summary(params: Any, depth: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by the first `depth` levels of the tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict[str, int] = {}
    for path, leaf in flat:
        key = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path[:depth]
        )
        out[key] = out.get(key, 0) + int(np.prod(leaf.shape))
    return dict(sorted(out.items()))


def tree_norms(tree: Any) -> Dict[str, float]:
    """Per-top-level-module L2 norms (e.g. of a gradient pytree)."""
    out = {}
    for name, sub in tree.items():
        sq = sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(sub))
        out[name] = jnp.sqrt(sq)
    return out
