"""Jitted init/apply helpers for tests and scripts.

Eager per-op dispatch costs ~0.3 s/op in this environment, so module forwards
must always run under jit. Jitted callables are cached per (module, static
kwargs) so repeat calls hit the jit cache instead of re-tracing.
"""

import functools

import jax

_CACHE = {}


def _cached(kind, mod, **kwargs):
    key = (kind, mod, tuple(sorted(kwargs.items())))
    if key not in _CACHE:
        fn = getattr(mod, kind)
        _CACHE[key] = jax.jit(functools.partial(fn, **kwargs))
    return _CACHE[key]


def jinit(mod, key, *args, **kwargs):
    return _cached("init", mod, **kwargs)(key, *args)


def jinit_out(mod, key, *args, **kwargs):
    """jit-compiled init_with_output -> (output, variables)."""
    return _cached("init_with_output", mod, **kwargs)(key, *args)


def japply(mod, params, *args, rngs=None, **kwargs):
    fn = _cached("apply", mod, **kwargs)
    if rngs is not None:
        return fn(params, *args, rngs=rngs)
    return fn(params, *args)
