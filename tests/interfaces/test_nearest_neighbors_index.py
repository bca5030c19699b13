from typing import Any, Dict, Hashable, Iterable, Sequence, Tuple
from unittest import mock

import pytest

from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (
    NearestNeighborsIndex,
)


class DummyNNI (NearestNeighborsIndex):
    """Stub implementation spying on internal-method dispatch."""

    def __init__(self) -> None:
        super().__init__()
        self._count = 0

    def get_config(self) -> Dict[str, Any]:
        return {}

    def count(self) -> int:
        return self._count

    def _build_index(self, descriptors: Iterable) -> None:
        pass

    def _update_index(self, descriptors: Iterable) -> None:
        pass

    def _remove_from_index(self, uids: Iterable[Hashable]) -> None:
        pass

    def _nn(self, d, n: int = 1) -> Tuple[Tuple, Tuple]:
        return (), ()


class TestTemplateMethodValidation:

    def test_build_empty_iterable_raises_before_dispatch(self) -> None:
        idx = DummyNNI()
        idx._build_index = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError):
            idx.build_index(iter(()))
        idx._build_index.assert_not_called()

    def test_update_empty_iterable_raises_before_dispatch(self) -> None:
        idx = DummyNNI()
        idx._update_index = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError):
            idx.update_index(iter(()))
        idx._update_index.assert_not_called()

    def test_remove_empty_iterable_raises_before_dispatch(self) -> None:
        idx = DummyNNI()
        idx._remove_from_index = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError):
            idx.remove_from_index(iter(()))
        idx._remove_from_index.assert_not_called()

    def test_build_passes_elements_through_intact(self) -> None:
        idx = DummyNNI()
        seen = []
        idx._build_index = lambda it: seen.extend(it)  # type: ignore
        elems = [DescriptorMemoryElement(i, [i, i]) for i in range(5)]
        idx.build_index(iter(elems))
        assert seen == elems

    def test_nn_vectorless_query_raises(self) -> None:
        idx = DummyNNI()
        idx._count = 3
        idx._nn = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError, match="no.*vector|vector set"):
            idx.nn(DescriptorMemoryElement("q"))
        idx._nn.assert_not_called()

    def test_nn_empty_index_raises(self) -> None:
        idx = DummyNNI()
        idx._nn = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError, match="[Nn]o index"):
            idx.nn(DescriptorMemoryElement("q", [1.0, 2.0]))
        idx._nn.assert_not_called()

    def test_nn_dispatches_when_valid(self) -> None:
        idx = DummyNNI()
        idx._count = 1
        q = DescriptorMemoryElement("q", [1.0])
        idx.nn(q, 3)  # should not raise

    def test_nn_many_validates_every_query(self) -> None:
        idx = DummyNNI()
        idx._count = 1
        good = DescriptorMemoryElement("a", [1.0])
        bad = DescriptorMemoryElement("b")
        with pytest.raises(ValueError):
            idx.nn_many([good, bad])

    def test_nn_many_default_loops_nn(self) -> None:
        idx = DummyNNI()
        idx._count = 1
        qs = [DescriptorMemoryElement(i, [float(i)]) for i in range(3)]
        results = idx.nn_many(qs, 2)
        assert len(results) == 3

    def test_len_equals_count(self) -> None:
        idx = DummyNNI()
        idx._count = 17
        assert len(idx) == 17
