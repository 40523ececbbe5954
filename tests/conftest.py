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
# Persistent compilation cache: OFF by default for the suite. Mid-suite,
# XLA:CPU's executable.serialize() segfaulted deterministically while writing
# the cache entry for an interpret-mode Pallas executable (se3_attend, ~test
# 143 of 178; jax/jaxlib 0.9.0) — reproducible three runs in a row, but not
# when the same test file runs alone, so it needs accumulated process state.
# A one-shot CI run gains little from the cache anyway (every entry is a
# cold write). Opt back in for local iterative runs, where warm READS are the
# win and crashy writes have already happened:
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


@pytest.fixture
def rng():
    return np.random.default_rng(0)

