"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device tests run on a simulated mesh via
--xla_force_host_platform_device_count (no pod needed), mirroring the test
strategy gap in the reference (it has no distributed tests at all; SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# A sitecustomize in this image forces JAX_PLATFORMS=axon (the TPU tunnel); the
# config update below overrides it so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# XLA:CPU (jax/jaxlib 0.9.0) segfaults INSIDE backend_compile of an
# interpret-mode Pallas executable (se3_attend grads) once one process has
# accumulated ~10 test files' worth of compiled programs — first seen as a
# cache-writer crash at ~test 143/178, then reproduced with the cache fully
# disabled at ~test 70 (the same file passes standalone, so it needs
# accumulated in-process state, not any particular test). Two mitigations:
# pytest-xdist worker processes (pyproject addopts: -n 4 --dist loadfile)
# keep each process under the threshold, and the module-boundary
# jax.clear_caches() fixture below bounds the accumulation for plain
# single-process runs too.
#
# Persistent compilation cache: OFF by default (a one-shot CI run is all
# cold writes, and the writer also crashed under two concurrent processes).
# Opt back in for local iterative runs, where warm READS are the win:
#   RFTPU_TEST_COMPILE_CACHE=1 python -m pytest tests/ -q
if os.environ.get("RFTPU_TEST_COMPILE_CACHE", "0") == "1":
    # NOT the TPU benches' dir (/tmp/rftpu_jax_cache): concurrent writers
    # from two processes also segfaulted the cache writer.
    jax.config.update("jax_compilation_cache_dir", "/tmp/rftpu_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the accumulated in-process XLA:CPU state (see the segfault note
    above). Runs after each test module; within a module caches persist."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

