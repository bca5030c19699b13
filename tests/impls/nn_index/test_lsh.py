"""
LSHNearestNeighborIndex tests, mirroring the reference behavioral suite
(/root/reference/tests/impls/nn_index/test_lsh.py): a deterministic dummy
functor for semantics tests, random/unit-vector geometry for retrieval
correctness, mutation + shared-hash removal semantics, config round-trips.
"""
from typing import Any, Dict

import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.descriptor import (
    DescriptorMemoryElement, MemoryDescriptorSet,
)
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError
from smqtk_indexing_tpu.data.key_value import MemoryKeyValueStore
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (
    NearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.hash_index.linear import LinearHashIndex
from smqtk_indexing_tpu.models.lsh_functor.itq import ItqFunctor
from smqtk_indexing_tpu.models.nn_index.lsh import LSHNearestNeighborIndex
from smqtk_indexing_tpu.interfaces.lsh_functor import LshFunctor
from smqtk_indexing_tpu.utils.bits import int_to_bit_vector_large


class DummyHashFunctor (LshFunctor):
    """Deterministic functor: 8-bit code from the integer sum of the vector
    (same shape as the reference's test functor, test_lsh.py:28-50)."""

    @classmethod
    def is_usable(cls):
        return True

    def get_config(self) -> Dict[str, Any]:
        return {}

    def get_hash(self, descriptor: np.ndarray) -> np.ndarray:
        return int_to_bit_vector_large(
            int(np.sum(descriptor)) % 256, 8)


def _elem(uid, vec):
    return DescriptorMemoryElement(uid, np.asarray(vec, dtype=np.float32))


def _mk_index(**kwargs):
    kwargs.setdefault("lsh_functor", DummyHashFunctor())
    kwargs.setdefault("descriptor_set", MemoryDescriptorSet())
    kwargs.setdefault("hash2uuids_kvstore", MemoryKeyValueStore())
    return LSHNearestNeighborIndex(**kwargs)


class TestLshIndex:
    def test_plugin_discoverable(self):
        assert LSHNearestNeighborIndex in NearestNeighborsIndex.get_impls()

    def test_configuration_roundtrip(self):
        i = _mk_index(hash_index=LinearHashIndex(),
                      distance_method="euclidean")
        for inst in configuration_test_helper(i):
            assert isinstance(inst, LSHNearestNeighborIndex)
            assert inst.distance_method == "euclidean"
            assert isinstance(inst.hash_index, LinearHashIndex)

    def test_config_json_serializable(self):
        import json
        i = _mk_index()
        json.dumps(i.get_config())

    def test_invalid_distance_method(self):
        with pytest.raises(ValueError):
            _mk_index(distance_method="bogus")

    def test_count_empty(self):
        assert _mk_index().count() == 0

    def test_build_and_count(self):
        i = _mk_index()
        i.build_index([_elem(j, [j, j]) for j in range(10)])
        assert i.count() == 10

    def test_build_empty_raises(self):
        with pytest.raises(ValueError):
            _mk_index().build_index([])

    def test_read_only(self):
        i = _mk_index(read_only=True)
        with pytest.raises(ReadOnlyError):
            i.build_index([_elem(0, [0, 0])])

    def test_query_self_retrieval_euclidean(self):
        rng = np.random.default_rng(0)
        elems = [_elem(j, rng.normal(size=16)) for j in range(100)]
        i = _mk_index(distance_method="euclidean")
        i.build_index(elems)
        for j in (0, 13, 99):
            res, dists = i.nn(elems[j], 3)
            assert res[0].uuid() == j
            assert dists[0] == pytest.approx(0.0, abs=1e-5)
            assert list(dists) == sorted(dists)

    def test_query_with_hash_index(self):
        rng = np.random.default_rng(1)
        elems = [_elem(j, rng.normal(size=16)) for j in range(100)]
        i = _mk_index(distance_method="euclidean",
                      hash_index=LinearHashIndex())
        i.build_index(elems)
        res, dists = i.nn(elems[7], 5)
        assert res[0].uuid() == 7
        assert dists[0] == pytest.approx(0.0, abs=1e-5)

    def test_query_unit_vectors_cosine(self):
        # Orthogonal unit vectors: all cross distances exactly 1.0 under
        # angular distance (reference test_lsh.py:837-883).
        dim = 8
        elems = [_elem(j, np.eye(dim)[j]) for j in range(dim)]
        i = _mk_index(distance_method="cosine")
        i.build_index(elems)
        q = _elem("q", np.eye(dim)[0])
        res, dists = i.nn(q, dim)
        assert res[0].uuid() == 0
        assert dists[0] == pytest.approx(0.0, abs=1e-6)

    def test_update_index(self):
        i = _mk_index(distance_method="euclidean")
        i.build_index([_elem(j, [j, j]) for j in range(5)])
        i.update_index([_elem(5 + j, [50 + j, 50 + j]) for j in range(3)])
        assert i.count() == 8
        res, dists = i.nn(_elem("q", [51, 51]), 1)
        assert res[0].uuid() == 6

    def test_update_on_empty(self):
        i = _mk_index()
        i.update_index([_elem(0, [1, 2])])
        assert i.count() == 1

    def test_remove_from_index(self):
        i = _mk_index(distance_method="euclidean")
        i.build_index([_elem(j, [j, j]) for j in range(10)])
        i.remove_from_index([3, 4])
        assert i.count() == 8
        res, dists = i.nn(_elem("q", [3, 3]), 1)
        assert res[0].uuid() not in (3, 4)

    def test_remove_missing_keyerror_no_mutation(self):
        i = _mk_index()
        i.build_index([_elem(j, [j, j]) for j in range(5)])
        with pytest.raises(KeyError):
            i.remove_from_index([2, 77])
        assert i.count() == 5

    def test_remove_shared_hash_keeps_code(self):
        # Two descriptors sharing a hash bucket: removing one must keep the
        # code alive in KV store and hash index (reference
        # test_lsh.py:616-723 semantics).
        hi = LinearHashIndex()
        i = _mk_index(hash_index=hi, distance_method="euclidean")
        # sum 10 -> same 8-bit code for both
        i.build_index([_elem("a", [4, 6]), _elem("b", [5, 5]),
                       _elem("c", [100, 100])])
        assert hi.count() == 2  # two distinct codes
        i.remove_from_index(["a"])
        assert i.count() == 2
        assert hi.count() == 2  # code shared with "b" survives
        i.remove_from_index(["b"])
        assert hi.count() == 1  # now the code is dead

    def test_remove_then_query(self):
        rng = np.random.default_rng(3)
        elems = [_elem(j, rng.normal(size=8)) for j in range(20)]
        i = _mk_index(distance_method="euclidean")
        i.build_index(elems)
        i.remove_from_index([0])
        res, dists = i.nn(elems[0], 1)
        assert res[0].uuid() != 0

    def test_itq_integration_recall(self):
        # End-to-end with a real ITQ functor: clustered points should
        # retrieve their own cluster.
        rng = np.random.default_rng(4)
        centers = rng.normal(size=(4, 32)) * 10
        elems = []
        for ci, c in enumerate(centers):
            for j in range(25):
                elems.append(_elem(f"{ci}-{j}",
                                   c + rng.normal(size=32) * 0.5))
        functor = ItqFunctor(bit_length=16, itq_iterations=20, random_seed=0)
        functor.fit(elems)
        i = LSHNearestNeighborIndex(
            lsh_functor=functor,
            descriptor_set=MemoryDescriptorSet(),
            hash2uuids_kvstore=MemoryKeyValueStore(),
            distance_method="euclidean")
        i.build_index(elems)
        res, dists = i.nn(elems[0], 5)
        assert res[0].uuid() == "0-0"
        # All top-5 from the query's own cluster.
        assert all(r.uuid().startswith("0-") for r in res)


class TestLshBatched:
    def test_nn_many_matches_nn(self):
        rng = np.random.default_rng(11)
        elems = [_elem(j, rng.normal(size=16)) for j in range(100)]
        i = _mk_index(distance_method="euclidean")
        i.build_index(elems)
        batch = i.nn_many(elems[:8], 4)
        for j, (res, dists) in enumerate(batch):
            r1, d1 = i.nn(elems[j], 4)
            assert [e.uuid() for e in res] == [e.uuid() for e in r1]
            np.testing.assert_allclose(dists, d1, atol=1e-5)

    def test_nn_many_with_hash_index(self):
        rng = np.random.default_rng(12)
        elems = [_elem(j, rng.normal(size=16)) for j in range(64)]
        i = _mk_index(distance_method="cosine", hash_index=LinearHashIndex())
        i.build_index(elems)
        batch = i.nn_many(elems[:4], 3)
        assert len(batch) == 4
        for j, (res, dists) in enumerate(batch):
            assert res[0].uuid() == j


class TestFallbackCache:
    def test_fallback_cached_and_invalidated(self):
        i = _mk_index(distance_method="euclidean")
        i.build_index([_elem(j, [j, j]) for j in range(10)])
        i.nn(_elem("q", [3, 3]), 2)
        first = i._fallback_hi
        assert first is not None
        i.nn(_elem("q", [4, 4]), 2)
        assert i._fallback_hi is first  # reused
        i.update_index([_elem(99, [99, 99])])
        assert i._fallback_hi is None   # invalidated
        res, _ = i.nn(_elem("q", [99, 99]), 1)
        assert res[0].uuid() == 99
        i.remove_from_index([99])
        assert i._fallback_hi is None
        res, _ = i.nn(_elem("q", [99, 99]), 1)
        assert res[0].uuid() != 99


def test_nn_with_stale_hash_index_returns_empty():
    # Review regression: a hash index disjoint from the KV mapping must
    # yield an empty result, not a ValueError from np.vstack([]).
    from smqtk_indexing_tpu.utils.bits import int_to_bit_vector_large
    hi = LinearHashIndex()
    hi.build_index(np.vstack([int_to_bit_vector_large(c, 8)
                              for c in (200, 201)]))
    i = _mk_index(hash_index=hi, distance_method="euclidean")
    # KV store maps different codes than the hash index contains.
    i.descriptor_set.add_descriptor(_elem(0, [1, 1]))
    i.hash2uuids_kvstore.add(2, {0})
    res, dists = i.nn(_elem("q", [1, 1]), 3)
    assert res == () and dists == ()
