"""
LinearHashIndex behavior tests, mirroring the reference suite's patterns
(/root/reference/tests/impls/hash_index/test_linear.py): plugin
discoverability, config round-trip, build/update/remove semantics with cache
write-through, normalized-Hamming nn results.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.interfaces.hash_index import HashIndex
from smqtk_indexing_tpu.models.hash_index.linear import LinearHashIndex
from smqtk_indexing_tpu.utils.bits import int_to_bit_vector_large


def _codes(ints, bits=8):
    return np.vstack([int_to_bit_vector_large(i, bits) for i in ints])


class TestLinearHashIndex:
    def test_is_usable(self):
        assert LinearHashIndex.is_usable()

    def test_plugin_discoverable(self):
        assert LinearHashIndex in HashIndex.get_impls()

    def test_configuration_roundtrip(self):
        i = LinearHashIndex(cache_element=DataMemoryElement())
        for inst in configuration_test_helper(i):
            assert isinstance(inst, LinearHashIndex)
        # No cache configured.
        configuration_test_helper(LinearHashIndex())

    def test_build_dedup_count(self):
        i = LinearHashIndex()
        i.build_index(_codes([1, 2, 3, 3, 2]))
        assert i.count() == 3

    def test_build_empty_raises(self):
        i = LinearHashIndex()
        with pytest.raises(ValueError):
            i.build_index([])

    def test_nn_exact_and_normalized(self):
        i = LinearHashIndex()
        i.build_index(_codes([0b00000000, 0b11111111, 0b00001111], bits=8))
        codes, dists = i.nn(int_to_bit_vector_large(0b00000001, 8), 3)
        # Nearest is 0 (1 differing bit / 8).
        assert dists[0] == pytest.approx(1 / 8)
        assert dists == tuple(sorted(dists))
        assert len(codes) == 3

    def test_nn_empty_raises(self):
        i = LinearHashIndex()
        with pytest.raises(ValueError):
            i.nn(int_to_bit_vector_large(0, 8))

    def test_update_then_query(self):
        i = LinearHashIndex()
        i.build_index(_codes([1, 2]))
        i.update_index(_codes([4]))
        assert i.count() == 3
        codes, dists = i.nn(int_to_bit_vector_large(4, 8), 1)
        assert dists[0] == 0.0

    def test_update_on_empty_builds(self):
        i = LinearHashIndex()
        i.update_index(_codes([7]))
        assert i.count() == 1

    def test_remove(self):
        i = LinearHashIndex()
        i.build_index(_codes([1, 2, 4]))
        i.remove_from_index(_codes([2]))
        assert i.count() == 2
        codes, dists = i.nn(int_to_bit_vector_large(2, 8), 2)
        assert dists[0] > 0.0

    def test_remove_missing_keyerror_no_mutation(self):
        i = LinearHashIndex()
        i.build_index(_codes([1, 2, 4]))
        with pytest.raises(KeyError):
            i.remove_from_index(_codes([2, 8]))
        assert i.count() == 3
        codes, dists = i.nn(int_to_bit_vector_large(2, 8), 1)
        assert dists[0] == 0.0

    def test_cache_write_through_and_reload(self):
        cache = DataMemoryElement()
        i = LinearHashIndex(cache_element=cache)
        i.build_index(_codes([1, 2, 3]))
        assert not cache.is_empty()
        i.update_index(_codes([5]))
        i.remove_from_index(_codes([1]))

        # Reconstruct from cache.
        i2 = LinearHashIndex(cache_element=cache)
        assert i2.count() == 3
        codes, dists = i2.nn(int_to_bit_vector_large(5, 8), 1)
        assert dists[0] == 0.0
        codes, dists = i2.nn(int_to_bit_vector_large(1, 8), 1)
        assert dists[0] > 0.0

    def test_readonly_cache_raises(self):
        from smqtk_indexing_tpu.data.exceptions import ReadOnlyError
        cache = DataMemoryElement(readonly=True)
        i = LinearHashIndex(cache_element=cache)
        with pytest.raises(ReadOnlyError):
            i.build_index(_codes([1]))

    def test_large_bits(self):
        # >64-bit codes exercise multi-word packing.
        bits = 256
        rng = np.random.default_rng(0)
        mat = rng.integers(0, 2, size=(100, bits)).astype(bool)
        i = LinearHashIndex()
        i.build_index(mat)
        codes, dists = i.nn(mat[17], 1)
        assert dists[0] == 0.0
        assert np.array_equal(codes[0], mat[17])


class TestShardedLinearHashIndex:
    def test_sharded_matches_single(self):
        rng = np.random.default_rng(0)
        mat = rng.integers(0, 2, size=(4096, 64)).astype(bool)
        single = LinearHashIndex()
        multi = LinearHashIndex(n_devices=8)
        single.build_index(mat)
        multi.build_index(mat)
        for j in (0, 100, 4000):
            c1, d1 = single.nn(mat[j], 5)
            c8, d8 = multi.nn(mat[j], 5)
            assert d8 == d1

    def test_sharded_config_roundtrip(self):
        from smqtk_indexing_tpu.core.configuration import (
            configuration_test_helper,
        )
        i = LinearHashIndex(n_devices=8)
        for inst in configuration_test_helper(i):
            assert inst.n_devices == 8
