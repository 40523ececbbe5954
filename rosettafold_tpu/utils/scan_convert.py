"""Convert parameter trees between the unscanned and scan_blocks layouts.

`scan_blocks=True` (config.py) traces the repeated two-/three-track blocks
once via nn.scan, so their parameters are STACKED along a leading axis under
`two_track_scan/block` / `three_track_scan/block`, while the default layout
names them `two_track_{i}` / `three_track_{i}`. The reference serves every
mode from one state_dict (rosettafold_pytorch.py:1175-1298); these converters
restore that property for the TPU build: checkpoints trained or torch-imported
in either layout can be served in the other (predict --preset fast,
utils/torch_import).

Numerics note: the parameter trees convert exactly — the only behavioral
difference between the modes is the FAVOR+ random-feature seeds (constants,
not parameters), which scan mode shares across blocks (models/rosettafold.py
`_ScannedTwoTrack` docstring).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _is_scanned(tree: Any) -> bool:
    return "two_track_scan" in tree or "three_track_scan" in tree


def unstack_block_params(tree: Any) -> Any:
    """scan_blocks layout -> unscanned layout.

    tree: the "params" dict (or any dict containing two_track_scan /
    three_track_scan entries). Returns a new dict with per-block entries.
    """
    out = {k: v for k, v in tree.items()
           if k not in ("two_track_scan", "three_track_scan")}
    if "two_track_scan" in tree:
        block = tree["two_track_scan"]["block"]
        n = jax.tree.leaves(block)[0].shape[0]
        for i in range(n):
            out[f"two_track_{i}"] = jax.tree.map(lambda a, i=i: a[i], block)
    if "three_track_scan" in tree:
        block = tree["three_track_scan"]["block"]
        n = jax.tree.leaves(block)[0].shape[0]
        for i in range(n):
            out[f"three_track_{i}"] = jax.tree.map(lambda a, i=i: a[i], block)
    return out


def stack_block_params(tree: Any) -> Any:
    """Unscanned layout -> scan_blocks layout (inverse of
    unstack_block_params)."""
    out = {}
    two, three = {}, {}
    for k, v in tree.items():
        if k.startswith("two_track_") and k[len("two_track_"):].isdigit():
            two[int(k[len("two_track_"):])] = v
        elif k.startswith("three_track_") and k[len("three_track_"):].isdigit():
            three[int(k[len("three_track_"):])] = v
        else:
            out[k] = v
    if two:
        blocks = [two[i] for i in sorted(two)]
        out["two_track_scan"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
        }
    if three:
        blocks = [three[i] for i in sorted(three)]
        out["three_track_scan"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
        }
    return out


def adapt_params(variables: Any, want_scanned: bool) -> Any:
    """Convert a full variables dict ({"params": ...}) to the requested layout
    if needed; no-op when the layout already matches."""
    params = variables["params"] if "params" in variables else variables
    is_scanned = _is_scanned(params)
    if is_scanned == want_scanned:
        return variables
    params = (unstack_block_params(params) if is_scanned
              else stack_block_params(params))
    if "params" in variables:
        out = dict(variables)
        out["params"] = params
        return out
    return params
