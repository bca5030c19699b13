"""
MRPTNearestNeighborsIndex tests, mirroring the reference's behavioral
patterns (/root/reference/tests/impls/nn_index/test_mrpt.py:260-334,
including the pathological all-duplicates fixture at :231).
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (
    NearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.nn_index.mrpt import MRPTNearestNeighborsIndex
from smqtk_indexing_tpu.ops.mrpt import build_trees


def _elem(uid, vec):
    return DescriptorMemoryElement(uid, np.asarray(vec, dtype=np.float32))


class TestBuildTrees:
    def test_balanced_partition(self):
        rng = np.random.default_rng(0)
        projs = rng.normal(size=(100, 3, 4)).astype(np.float32)
        splits, leaf_table, offsets = build_trees(projs, 4)
        assert splits.shape == (3, 15)
        assert leaf_table.shape == (3, 100)
        assert offsets.shape == (17,)
        sizes = np.diff(offsets)
        assert sizes.min() >= 6 and sizes.max() <= 7
        # Each tree's leaf table is a permutation.
        for t in range(3):
            assert sorted(leaf_table[t]) == list(range(100))

    def test_split_separates(self):
        # Leaf content must respect the split ordering at the root.
        rng = np.random.default_rng(1)
        projs = rng.normal(size=(64, 1, 1)).astype(np.float32)
        splits, leaf_table, offsets = build_trees(projs, 1)
        left = leaf_table[0][offsets[0]:offsets[1]]
        right = leaf_table[0][offsets[1]:offsets[2]]
        assert projs[left, 0, 0].max() <= splits[0, 0]
        assert projs[right, 0, 0].min() >= splits[0, 0]


class TestMRPTIndex:
    def test_plugin_discoverable(self):
        assert MRPTNearestNeighborsIndex in NearestNeighborsIndex.get_impls()

    def test_configuration_roundtrip(self):
        i = MRPTNearestNeighborsIndex(num_trees=5, depth=3, random_seed=7)
        for inst in configuration_test_helper(i):
            assert isinstance(inst, MRPTNearestNeighborsIndex)
            assert inst.num_trees == 5
            assert inst.depth == 3
            assert inst.random_seed == 7

    def test_build_and_self_retrieval(self):
        rng = np.random.default_rng(0)
        elems = [_elem(j, rng.normal(size=16)) for j in range(256)]
        i = MRPTNearestNeighborsIndex(num_trees=8, depth=3, random_seed=0)
        i.build_index(elems)
        assert i.count() == 256
        for j in (0, 100, 255):
            res, dists = i.nn(elems[j], 3)
            assert res[0].uuid() == j
            assert dists[0] == pytest.approx(0.0, abs=1e-5)
            assert list(dists) == sorted(dists)

    def test_no_duplicate_results(self):
        # Leaf union across trees must be deduplicated.
        rng = np.random.default_rng(1)
        elems = [_elem(j, rng.normal(size=8)) for j in range(64)]
        i = MRPTNearestNeighborsIndex(num_trees=10, depth=1, random_seed=0)
        i.build_index(elems)
        res, dists = i.nn(elems[0], 30)
        uids = [e.uuid() for e in res]
        assert len(uids) == len(set(uids))

    def test_all_duplicate_points(self):
        # Pathological: every vector identical (reference test_mrpt.py:231).
        elems = [_elem(j, [1.0, 2.0, 3.0, 4.0]) for j in range(20)]
        i = MRPTNearestNeighborsIndex(num_trees=3, depth=2, random_seed=0)
        i.build_index(elems)
        res, dists = i.nn(elems[0], 5)
        assert len(res) == 5
        assert all(d == pytest.approx(0.0, abs=1e-6) for d in dists)

    def test_depth_clamp_warning(self):
        elems = [_elem(j, np.random.default_rng(j).normal(size=8))
                 for j in range(8)]
        i = MRPTNearestNeighborsIndex(num_trees=2, depth=10, random_seed=0)
        with pytest.warns(UserWarning, match="clamping"):
            i.build_index(elems)
        res, _ = i.nn(elems[2], 1)
        assert res[0].uuid() == 2

    def test_update_rebuilds(self):
        rng = np.random.default_rng(2)
        elems = [_elem(j, rng.normal(size=8)) for j in range(32)]
        i = MRPTNearestNeighborsIndex(num_trees=6, depth=2, random_seed=0)
        i.build_index(elems[:16])
        i.update_index(elems[16:])
        assert i.count() == 32
        res, dists = i.nn(elems[20], 1)
        assert res[0].uuid() == 20

    def test_update_on_empty_builds(self):
        i = MRPTNearestNeighborsIndex(num_trees=2, depth=1, random_seed=0)
        i.update_index([_elem(0, [1, 2, 3, 4])])
        assert i.count() == 1

    def test_remove_rebuilds(self):
        rng = np.random.default_rng(3)
        elems = [_elem(j, rng.normal(size=8)) for j in range(32)]
        i = MRPTNearestNeighborsIndex(num_trees=6, depth=2, random_seed=0)
        i.build_index(elems)
        i.remove_from_index([0, 1])
        assert i.count() == 30
        res, _ = i.nn(elems[0], 1)
        assert res[0].uuid() not in (0, 1)

    def test_remove_missing_keyerror_no_mutation(self):
        elems = [_elem(j, [j, j]) for j in range(8)]
        i = MRPTNearestNeighborsIndex(num_trees=2, depth=1, random_seed=0)
        i.build_index(elems)
        with pytest.raises(KeyError):
            i.remove_from_index([2, "bogus"])
        assert i.count() == 8

    def test_remove_all_empties(self):
        elems = [_elem(j, [j, j]) for j in range(4)]
        i = MRPTNearestNeighborsIndex(num_trees=2, depth=1, random_seed=0)
        i.build_index(elems)
        i.remove_from_index([0, 1, 2, 3])
        assert i.count() == 0

    def test_read_only(self):
        i = MRPTNearestNeighborsIndex(read_only=True)
        with pytest.raises(ReadOnlyError):
            i.build_index([_elem(0, [0, 0])])

    def test_persistence_roundtrip(self):
        cache = DataMemoryElement()
        rng = np.random.default_rng(4)
        elems = [_elem(j, rng.normal(size=12)) for j in range(64)]
        i = MRPTNearestNeighborsIndex(index_element=cache, num_trees=4,
                                      depth=2, random_seed=0)
        i.build_index(elems)
        assert not cache.is_empty()
        i2 = MRPTNearestNeighborsIndex(index_element=cache, num_trees=4,
                                       depth=2, random_seed=0)
        assert i2.count() == 64
        res, dists = i2.nn(elems[9], 1)
        assert res[0].uuid() == 9
        assert dists[0] == pytest.approx(0.0, abs=1e-5)

    def test_colinear_ordering(self):
        # Colinear points [j, 2j] must return in index order from the query
        # origin-ward (reference test geometry, test_lsh.py:924-961 trio).
        elems = [_elem(j, [j + 1.0, 2.0 * (j + 1.0)]) for j in range(16)]
        i = MRPTNearestNeighborsIndex(num_trees=4, depth=1, random_seed=0)
        i.build_index(elems)
        res, dists = i.nn(elems[0], 5)
        assert [e.uuid() for e in res] == [0, 1, 2, 3, 4]
