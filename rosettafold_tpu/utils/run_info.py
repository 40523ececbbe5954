"""Run-directory bookkeeping: write an info file with git state + param counts.

Functional equivalent of the reference's (uncalled) write_info_file/make_logdir
(utils/utils_logging.py:21-100).
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from typing import Any, Optional


def _git(*args: str) -> str:
    try:
        return subprocess.run(
            ["git", *args], capture_output=True, text=True, timeout=10
        ).stdout.strip()
    except Exception:
        return ""


def make_logdir(base: str, name: str) -> str:
    logdir = os.path.join(base, f"{name}-{time.strftime('%Y%m%d-%H%M%S')}")
    os.makedirs(logdir, exist_ok=True)
    return logdir


def write_info_file(logdir: str, params: Optional[Any] = None, extra: dict = None) -> str:
    """Write run metadata (git commit/diff stat, device info, param count)."""
    import jax

    info = {
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "git_commit": _git("rev-parse", "HEAD"),
        "git_diff_stat": _git("diff", "--stat"),
        "devices": [str(d) for d in jax.devices()],
        "backend": jax.default_backend(),
    }
    if params is not None:
        from .params import count_parameters

        info["n_parameters"] = count_parameters(params)
    if extra:
        info.update(extra)
    path = os.path.join(logdir, "run_info.json")
    with open(path, "w") as f:
        json.dump(info, f, indent=2)
    return path
