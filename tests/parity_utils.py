"""Helpers for the reference-parity suite (tests/test_parity.py).

Runs the *actual* PyTorch reference from /root/reference (via the runnable stubs
in tests/reference_stubs.py), exports its weights — including the parameters the
reference itself loses to the plain-Python-list bug
(rosettafold_pytorch.py:602-605, 699-702) — and imports them into this repo's
flax params through rosettafold_tpu.utils.torch_import.
"""

from __future__ import annotations

import re

import numpy as np
import torch
import torch.nn as nn

from tests import reference_stubs as rs
from rosettafold_tpu.utils.torch_import import import_state_dict

ATOL = 1e-4

# torch state_dict keys that legitimately have no flax destination:
#   * FAVOR+ projection buffers (constants on the flax side),
#   * the duplicate registrations inside PairUpdateWithAxialAttentionLayer.layer
#     (row_attn/col_attn/ff are also registered directly; same tensors).
EXPECTED_UNMAPPED = (
    r"projection_matrix$",
    r"\.layer\.[0-2]\.fn\.1\.",
)


def load_reference():
    return rs.load_reference()


def _plain_module_lists(module: nn.Module):
    """Yield (qualified_prefix, submodule) for modules held in plain Python lists
    (invisible to state_dict/eval; the reference bug at :602-605, :699-702)."""
    for mod_name, mod in module.named_modules():
        for attr, val in vars(mod).items():
            if (
                isinstance(val, list)
                and val
                and all(isinstance(x, nn.Module) for x in val)
            ):
                base = f"{mod_name}.{attr}" if mod_name else attr
                for i, sub in enumerate(val):
                    yield f"{base}.{i}", sub


def eval_all(module: nn.Module) -> nn.Module:
    """module.eval() including the plain-list submodules .eval() misses."""
    module.eval()
    for _, sub in _plain_module_lists(module):
        eval_all(sub)
    return module


def full_state_dict(module: nn.Module, prefix: str = "") -> dict:
    """state_dict as numpy, including plain-list submodule params (recursive)."""
    sd = {
        prefix + k: v.detach().cpu().numpy()
        for k, v in module.state_dict().items()
    }
    for qual, sub in _plain_module_lists(module):
        sd.update(full_state_dict(sub, f"{prefix}{qual}."))
    return sd


def _nest(tree, dotted: str):
    for part in reversed(dotted.split(".")):
        tree = {part: tree}
    return tree


def _unnest(tree, dotted: str):
    for part in dotted.split("."):
        tree = tree[part]
    return tree


def import_module_params(
    torch_module: nn.Module,
    flax_params: dict,
    torch_prefix: str,
    flax_nest: str = "",
    extra_unmapped: tuple = (),
) -> dict:
    """Map a reference submodule's weights onto standalone flax module params.

    torch_prefix / flax_nest place both sides at the full-model qualified name
    so torch_import's name-rewrite rules apply (e.g. torch
    'two_track_blocks.0.msa_update_using_self_att.' <-> flax
    'two_track_0.msa_update_using_self_att.').
    """
    sd = full_state_dict(torch_module, torch_prefix)
    nested = _nest(dict(flax_params), flax_nest) if flax_nest else dict(flax_params)
    new_params, report = import_state_dict(sd, nested)

    allowed = EXPECTED_UNMAPPED + tuple(extra_unmapped)
    bad = [
        k for k in report["unmapped"] if not any(re.search(p, k) for p in allowed)
    ]
    assert not bad, f"unmapped torch keys: {bad[:20]}"
    missing = report["missing"]
    assert not missing, f"flax leaves not covered by the reference: {missing[:20]}"
    return _unnest(new_params, flax_nest) if flax_nest else new_params


# ---------------------------------------------------------------------------
# FAVOR+ feature-seed layout of the flax model (models/rosettafold.py):
#   block seed S = 42 + 1000 * block_index (two-track blocks first, then
#   three-track), final block S = 42 + 9000.
#   sequence-wise encoder layer j           -> S + j
#   axial layer j: row_attn -> S + 100 + 2j, col_attn -> S + 100 + 2j + 1
# ---------------------------------------------------------------------------


def block_seed(cfg_n_two: int, name: str) -> int:
    m = re.match(r"two_track_blocks\.(\d+)", name)
    if m:
        return 42 + 1000 * int(m.group(1))
    m = re.match(r"three_track_blocks\.(\d+)", name)
    if m:
        return 42 + 1000 * (cfg_n_two + int(m.group(1)))
    if name.startswith("final_block"):
        return 42 + 9000
    raise ValueError(name)


def performer_seed_fn(n_two_track_blocks: int, base_seed: int = None):
    """Map a torch FastAttention qualified name -> flax feature seed."""

    def fn(qualname: str) -> int:
        s = base_seed
        if s is None:
            s = block_seed(n_two_track_blocks, qualname)
        m = re.search(r"sequence_wise_encoder_layers\.(\d+)\.", qualname)
        if m:
            return s + int(m.group(1))
        m = re.search(r"layers\.(\d+)\.(row|col)_attn\.", qualname)
        if m:
            return s + 100 + 2 * int(m.group(1)) + (m.group(2) == "col")
        if base_seed is not None:
            return s
        raise ValueError(f"unrecognized performer site: {qualname}")

    return fn


def sync_performer(torch_module: nn.Module, seed_fn):
    with torch.no_grad():
        rs.set_performer_projection(torch_module, seed_fn)


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


def n(x) -> np.ndarray:
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def assert_close(jax_out, torch_out, atol: float = ATOL, label: str = ""):
    a, b = n(jax_out), n(torch_out)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    _record(label, float(np.max(np.abs(a - b))))
    np.testing.assert_allclose(a, b, atol=atol, rtol=0, err_msg=label)


def _record(label: str, maxdiff: float):
    """Append measured max|delta| to $RFTPU_PARITY_REPORT (jsonl) if set, for
    the PARITY.md per-module table."""
    import json
    import os

    path = os.environ.get("RFTPU_PARITY_REPORT")
    if path and label:
        with open(path, "a") as f:
            f.write(json.dumps({"label": label, "max_abs_diff": maxdiff}) + "\n")


def max_abs_diff(jax_out, torch_out) -> float:
    return float(np.max(np.abs(n(jax_out) - n(torch_out))))
