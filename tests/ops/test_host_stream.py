"""
Host-streamed (>HBM) store tier: block-streamed exact scans must match the
device-resident store exactly, across block boundaries, mutations, and
metrics.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex
from smqtk_indexing_tpu.ops.store import (
    HostStreamedVectorStore, VectorStore,
)


@pytest.mark.parametrize("metric", ["euclidean", "cosine",
                                    "inner_product", "hik"])
def test_streamed_matches_device_store(metric):
    rng = np.random.default_rng(0)
    n, d = 5000, 24
    db = rng.random((n, d)).astype(np.float32)
    dev = VectorStore()
    hst = HostStreamedVectorStore(block_rows=1024)  # forces 5 blocks
    dev.build(db, list(range(n)))
    hst.build(db, list(range(n)))
    q = rng.random((7, d)).astype(np.float32)
    d1, u1, _ = dev.knn(q, 9, metric)
    d2, u2, _ = hst.knn(q, 9, metric)
    np.testing.assert_allclose(d2, d1, atol=1e-5)
    assert u1 == u2


def test_streamed_mutations_and_masking():
    rng = np.random.default_rng(1)
    n, d = 3000, 16
    db = rng.random((n, d)).astype(np.float32)
    hst = HostStreamedVectorStore(block_rows=1024)
    hst.build(db, list(range(n)))
    hst.add(db[:2] + 0.5, ["a", "b"])
    hst.remove([0, 1])
    assert not hst.has_uid(0) and hst.has_uid("a")
    # Row 2's own vector must now be its nearest neighbor.
    _, uids, _ = hst.knn(db[2:3], 1)
    assert uids[0][0] == 2
    # Masked rows never returned even across block boundaries.
    _, uids, _ = hst.knn(db[0:1], 3)
    assert 0 not in uids[0] and 1 not in uids[0]


def test_streamed_rejects_bad_config():
    with pytest.raises(ValueError, match="float32/bfloat16"):
        HostStreamedVectorStore(dtype="sq8")
    with pytest.raises(ValueError, match="power of two"):
        HostStreamedVectorStore(block_rows=1000)


def test_flat_index_host_stream_storage():
    rng = np.random.default_rng(2)
    n, d = 2000, 16
    db = rng.random((n, d)).astype(np.float32)
    elems = [DescriptorMemoryElement(i, db[i]) for i in range(n)]
    idx = FlatNearestNeighborsIndex(storage="host_stream")
    assert isinstance(idx._store, HostStreamedVectorStore)
    idx.build_index(elems)
    e, dd = idx.nn(elems[7], 3)
    assert e[0].uuid() == 7 and dd[0] < 1e-6
    assert idx.get_config()["storage"] == "host_stream"
    ref = FlatNearestNeighborsIndex()
    ref.build_index(elems)
    q = DescriptorMemoryElement("q", rng.random(d).astype(np.float32))
    r1 = idx.nn(q, 5)
    r2 = ref.nn(q, 5)
    assert [x.uuid() for x in r1[0]] == [x.uuid() for x in r2[0]]
    with pytest.raises(ValueError, match="one device"):
        FlatNearestNeighborsIndex(storage="host_stream", n_devices=8)
