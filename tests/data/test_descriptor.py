"""Descriptor element/set tests (UID+vector data model contract)."""
import numpy as np
import pytest

from smqtk_indexing_tpu.data.descriptor import (
    DescriptorElement, DescriptorMemoryElement, DescriptorSet,
    MemoryDescriptorSet,
)


class TestDescriptorMemoryElement:
    def test_plugin_discoverable(self):
        assert DescriptorMemoryElement in DescriptorElement.get_impls()

    def test_vector_roundtrip(self):
        e = DescriptorMemoryElement("u", [1, 2, 3])
        assert e.has_vector()
        assert np.array_equal(e.vector(), [1, 2, 3])
        assert e.uuid() == "u"

    def test_no_vector(self):
        e = DescriptorMemoryElement("u")
        assert not e.has_vector()
        assert e.vector() is None

    def test_set_vector_returns_self(self):
        e = DescriptorMemoryElement("u")
        assert e.set_vector(np.ones(4)) is e
        assert e.has_vector()
        e.set_vector(None)
        assert not e.has_vector()

    def test_equality_by_uid_and_vector(self):
        a = DescriptorMemoryElement("u", [1, 2])
        b = DescriptorMemoryElement("u", [1, 2])
        c = DescriptorMemoryElement("u", [1, 3])
        d = DescriptorMemoryElement("v", [1, 2])
        assert a == b
        assert a != c
        assert a != d
        assert hash(a) == hash(b)


class TestMemoryDescriptorSet:
    def _set(self, n=5):
        s = MemoryDescriptorSet()
        s.add_many_descriptors(
            DescriptorMemoryElement(i, [i, i]) for i in range(n))
        return s

    def test_plugin_discoverable(self):
        assert MemoryDescriptorSet in DescriptorSet.get_impls()

    def test_count_iter(self):
        s = self._set()
        assert s.count() == 5 and len(s) == 5
        assert sorted(e.uuid() for e in s) == list(range(5))
        assert sorted(s.iterkeys()) == list(range(5))
        assert sorted(k for k, _ in s.iteritems()) == list(range(5))

    def test_get_missing_raises(self):
        with pytest.raises(KeyError):
            self._set().get_descriptor(99)

    def test_get_many_missing_raises_before_yield(self):
        s = self._set()
        with pytest.raises(KeyError):
            s.get_many_descriptors([0, 99])

    def test_remove_many_no_partial_mutation(self):
        s = self._set()
        with pytest.raises(KeyError):
            s.remove_many_descriptors([0, 99])
        assert s.count() == 5

    def test_matrix_extraction(self):
        s = self._set(3)
        mat, uids = s.matrix()
        assert mat.shape == (3, 2)
        assert mat.dtype == np.float32
        assert sorted(uids) == [0, 1, 2]
        mat2, uids2 = s.matrix([2, 0])
        assert uids2 == [2, 0]
        assert np.array_equal(mat2, [[2, 2], [0, 0]])

    def test_matrix_empty(self):
        mat, uids = MemoryDescriptorSet().matrix()
        assert mat.shape == (0, 0) and uids == []

    def test_clear(self):
        s = self._set()
        s.clear()
        assert s.count() == 0
