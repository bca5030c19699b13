"""
BallTreeHashIndex tests: reference SkLearnBallTreeHashIndex surface
(/root/reference/tests/impls/hash_index/test_balltree.py patterns) executing
on the packed-scan engine.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.interfaces.hash_index import HashIndex
from smqtk_indexing_tpu.models.hash_index.block import BallTreeHashIndex
from smqtk_indexing_tpu.utils.bits import int_to_bit_vector_large


def _codes(ints, bits=8):
    return np.vstack([int_to_bit_vector_large(i, bits) for i in ints])


class TestBallTreeHashIndex:
    def test_plugin_discoverable(self):
        assert BallTreeHashIndex in HashIndex.get_impls()

    def test_configuration_roundtrip(self):
        i = BallTreeHashIndex(cache_element=DataMemoryElement(),
                              leaf_size=52, random_seed=7)
        for inst in configuration_test_helper(i):
            assert isinstance(inst, BallTreeHashIndex)
            assert inst.leaf_size == 52
            assert inst.random_seed == 7

    def test_build_query(self):
        i = BallTreeHashIndex()
        i.build_index(_codes([0b0001, 0b0011, 0b1111], bits=4))
        codes, dists = i.nn(int_to_bit_vector_large(0b0001, 4), 3)
        assert dists[0] == 0.0
        assert dists == tuple(sorted(dists))
        # Normalized by bit length.
        assert all(0.0 <= d <= 1.0 for d in dists)

    def test_update_remove(self):
        i = BallTreeHashIndex()
        i.build_index(_codes([1, 2]))
        i.update_index(_codes([4, 8]))
        assert i.count() == 4
        i.remove_from_index(_codes([1, 8]))
        assert i.count() == 2
        with pytest.raises(KeyError):
            i.remove_from_index(_codes([1]))

    def test_save_load_cache(self):
        cache = DataMemoryElement()
        i = BallTreeHashIndex(cache_element=cache)
        i.build_index(_codes([5, 6, 7]))
        i2 = BallTreeHashIndex(cache_element=cache)
        assert i2.count() == 3
        codes, dists = i2.nn(int_to_bit_vector_large(6, 8), 1)
        assert dists[0] == 0.0
