"""
Root pytest configuration: the doctest pass collects modules from the
``smqtk_indexing_tpu`` package itself (pyproject testpaths), whose imports
touch jax — so the CPU/virtual-device pinning must happen HERE, before any
package module is imported, not only in tests/conftest.py.

See tests/conftest.py for why the env var alone is insufficient (an
environment sitecustomize force-registers a TPU plugin backend).
"""
import os

if not os.environ.get("SMQTK_TPU_TESTS"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

collect_ignore = ["examples", "tools", "bench.py", "bench_all.py",
                  "__graft_entry__.py"]
