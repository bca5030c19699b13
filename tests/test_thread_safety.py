"""
Thread-safety contract (reference interfaces mandate it,
nearest_neighbor_index.py:22-24): concurrent queries during mutations must
never crash or return malformed results — the lock-around-swap discipline
on immutable device arrays.
"""
import threading

import numpy as np

from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex


import pytest


@pytest.mark.parametrize("kwargs", [
    {},                                  # f32 HBM-resident
    {"dtype": "sq8"},                    # codec tier (train-per-build)
    {"dtype": "pq8"},                    # PQ codec tier
    {"storage": "host_stream"},          # >HBM streamed tier
])
def test_concurrent_queries_and_mutations(kwargs):
    rng = np.random.default_rng(0)
    elems = [DescriptorMemoryElement(j, rng.normal(size=16).astype(np.float32))
             for j in range(256)]
    idx = FlatNearestNeighborsIndex(**kwargs)
    idx.build_index(elems)

    errors = []
    stop = threading.Event()

    def query_loop():
        try:
            while not stop.is_set():
                res, dists = idx.nn(elems[rng.integers(0, 128)], 3)
                assert len(res) == len(dists) <= 3
                assert list(dists) == sorted(dists)
        except Exception as e:  # pragma: no cover - failure capture
            errors.append(e)

    def mutate_loop():
        try:
            for i in range(10):
                uid = f"new-{i}"
                idx.update_index([DescriptorMemoryElement(
                    uid, rng.normal(size=16).astype(np.float32))])
                idx.remove_from_index([uid])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=query_loop) for _ in range(4)]
    m = threading.Thread(target=mutate_loop)
    for t in threads:
        t.start()
    m.start()
    m.join()
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors
    assert idx.count() == 256
