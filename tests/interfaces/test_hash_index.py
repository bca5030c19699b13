from typing import Any, Dict, Iterable, Tuple
from unittest import mock

import numpy as np
import pytest

from smqtk_indexing_tpu.interfaces.hash_index import HashIndex


class DummyHI (HashIndex):

    def __init__(self) -> None:
        super().__init__()
        self._count = 0

    def get_config(self) -> Dict[str, Any]:
        return {}

    def count(self) -> int:
        return self._count

    def _build_index(self, hashes: Iterable[np.ndarray]) -> None:
        pass

    def _update_index(self, hashes: Iterable[np.ndarray]) -> None:
        pass

    def _remove_from_index(self, hashes: Iterable[np.ndarray]) -> None:
        pass

    def _nn(self, h: np.ndarray, n: int = 1) -> Tuple[np.ndarray, Tuple]:
        return np.array([]), ()


class TestHashIndexTemplateMethods:

    def test_build_empty_raises(self) -> None:
        hi = DummyHI()
        hi._build_index = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError, match="[Nn]o hash vectors"):
            hi.build_index(iter(()))
        hi._build_index.assert_not_called()

    def test_update_empty_raises(self) -> None:
        hi = DummyHI()
        with pytest.raises(ValueError):
            hi.update_index(iter(()))

    def test_remove_empty_raises(self) -> None:
        hi = DummyHI()
        with pytest.raises(ValueError):
            hi.remove_from_index(iter(()))

    def test_build_passes_through(self) -> None:
        hi = DummyHI()
        seen = []
        hi._build_index = lambda it: seen.extend(it)  # type: ignore
        vecs = [np.array([True, False]), np.array([False, True])]
        hi.build_index(iter(vecs))
        assert seen == vecs

    def test_nn_empty_index_raises(self) -> None:
        hi = DummyHI()
        hi._nn = mock.MagicMock()  # type: ignore[method-assign]
        with pytest.raises(ValueError, match="[Nn]o index"):
            hi.nn(np.array([True, False]))
        hi._nn.assert_not_called()

    def test_nn_dispatches_when_nonempty(self) -> None:
        hi = DummyHI()
        hi._count = 2
        hi.nn(np.array([True]))  # no raise
