"""
Multi-chip indexes on an emulated 8-device mesh.

Run (the emulation env must be set before jax initializes):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py
On a real TPU slice, drop the env var — `n_devices` uses the slice's chips.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from smqtk_indexing_tpu.data.descriptor import (  # noqa: E402
    DescriptorMemoryElement,
)
from smqtk_indexing_tpu.models.nn_index.flat import (  # noqa: E402
    FlatNearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.nn_index.ivf import (  # noqa: E402
    IvfNearestNeighborsIndex,
)


def main() -> None:
    # make_mesh falls back to the virtual CPU host platform automatically
    # when the default backend has fewer than n_devices chips.
    print(f"default devices: {len(jax.devices())} "
          f"({jax.devices()[0].platform})")
    rng = np.random.default_rng(0)
    elems = [DescriptorMemoryElement(i, rng.normal(size=64).astype(np.float32))
             for i in range(4096)]

    # Exhaustive scan row-sharded over 8 devices: per-shard fused top-k,
    # ICI all-gather merge.
    flat = FlatNearestNeighborsIndex(n_devices=8)
    flat.build_index(elems)
    res, dists = flat.nn(elems[7], 5)
    print("sharded flat top-5:",
          [(e.uuid(), round(d, 3)) for e, d in zip(res, dists)])

    # IVF sharded by contiguous row spans of the list-sorted layout.
    ivf = IvfNearestNeighborsIndex(n_devices=8, n_lists=16, nprobe=16,
                                   kmeans_iterations=5, random_seed=0)
    ivf.build_index(elems)
    res, dists = ivf.nn(elems[7], 5)
    print("sharded ivf  top-5:",
          [(e.uuid(), round(d, 3)) for e, d in zip(res, dists)])


if __name__ == "__main__":
    main()
