"""Tracing / profiling utilities.

Replaces the reference's line_profiler shim (utils/utils_profiling.py:1-5 — a
no-op @profile decorator) with jax-native tooling: named_scope annotations that
show up in XLA/TPU profiler traces, a trace() context manager around
jax.profiler, and a simple wall-clock timer registry.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

import jax

_timings: Dict[str, list] = defaultdict(list)


def profile(fn=None, *, name: str = None):
    """Decorator: wraps fn in a jax.named_scope (visible in profiler traces) and
    records host wall-clock. Drop-in for the reference's @profile annotations."""
    if fn is None:
        return functools.partial(profile, name=name)
    scope = name or fn.__qualname__

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        with jax.named_scope(scope):
            out = fn(*args, **kwargs)
        _timings[scope].append(time.perf_counter() - t0)
        return out

    return wrapper


def get_timings() -> Dict[str, float]:
    """Mean host wall-clock per annotated scope (trace time for jitted code)."""
    return {k: sum(v) / len(v) for k, v in _timings.items() if v}


def clear_timings() -> None:
    _timings.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
