"""
Test-global JAX configuration: run on CPU with 8 virtual devices so sharding
tests emulate an 8-chip slice without TPU hardware (the same emulation the
driver uses for the multichip dry-run).

Must run before any jax import in the test session.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
