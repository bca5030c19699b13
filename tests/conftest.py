"""
Test-global JAX configuration: run on CPU with 8 virtual devices so sharding
tests emulate an 8-chip slice without TPU hardware (the same emulation the
driver uses for the multichip dry-run).

Note: an environment sitecustomize may have force-registered a TPU plugin
backend and overridden ``jax_platforms`` via ``jax.config.update`` at
interpreter start, so setting the JAX_PLATFORMS env var is NOT sufficient —
the config must be re-updated after jax import (backends initialize lazily,
so doing this before any device use is effective). Set SMQTK_TPU_TESTS=1 to
run the suite against the real TPU backend instead.
"""
import os

import pytest

if not os.environ.get("SMQTK_TPU_TESTS"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_compile_state():
    """Drop JAX/XLA compilation caches between test modules.

    The ~900-test suite compiles thousands of distinct XLA:CPU programs in a
    single process; retained executables/LLVM JIT state accumulated until the
    CPU backend segfaulted deterministically inside ``backend_compile_and_load``
    at ~88% of the run (rc=139, twice, same stack — see VERDICT round 4).
    Clearing per-module bounds the live compile state; re-compiles of shared
    programs in later modules are cheap relative to the suite.
    """
    yield
    import jax

    jax.clear_caches()
