"""
Brute-force Hamming-distance hash index, TPU edition.

Capability-parity with the reference's ``LinearHashIndex``
(/root/reference/smqtk_indexing/impls/hash_index/linear.py:28-244) which keeps
a ``set[int]`` of arbitrary-precision codes and heap-scans with a Python
popcount. Here the unique codes live on-device as a packed ``(N, bits/32)``
uint32 matrix and a query is one fused XOR + population_count + top-k program
(ops/hamming.py). Distances returned are normalized by the query bit length
into [0, 1] (reference linear.py:243).
"""
from __future__ import annotations

import logging
import threading
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from smqtk_indexing_tpu.core.configuration import (
    make_default_config, merge_dict, from_config_dict, to_config_dict,
)
from smqtk_indexing_tpu.data.data_element import DataElement
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError
from smqtk_indexing_tpu.interfaces.hash_index import HashIndex
from smqtk_indexing_tpu.ops.hamming import CodeStore

LOG = logging.getLogger(__name__)


class LinearHashIndex (HashIndex):
    """
    Exhaustive Hamming search over unique hash codes.

    :param cache_element: Optional DataElement to persist index state to
        (write-through on every mutation; auto-loaded at construction —
        reference cache semantics, linear.py:121-142).
    """

    @classmethod
    def is_usable(cls) -> bool:
        return True

    @classmethod
    def get_default_config(cls) -> Dict[str, Any]:
        c = super().get_default_config()
        c["cache_element"] = make_default_config(DataElement.get_impls())
        return c

    @classmethod
    def from_config(cls, config_dict: Dict, merge_default: bool = True
                    ) -> "LinearHashIndex":
        if merge_default:
            config_dict = merge_dict(cls.get_default_config(),
                                     dict(config_dict))
        cfg = dict(config_dict)
        ce = cfg.get("cache_element")
        if ce and ce.get("type"):
            cfg["cache_element"] = from_config_dict(
                ce, DataElement.get_impls())
        else:
            cfg["cache_element"] = None
        return super().from_config(cfg, False)

    def __init__(self, cache_element: Optional[DataElement] = None,
                 n_devices: Optional[int] = None):
        """
        :param n_devices: Row-shard the packed codes across this many
            devices (per-shard scan + ICI all-gather merge); None = single
            device.
        """
        super().__init__()
        self.cache_element = cache_element
        self.n_devices = n_devices
        self._model_lock = threading.RLock()
        self._store = CodeStore(mesh=self._make_mesh())
        self._load_cache()

    def _make_mesh(self):
        if self.n_devices is None or self.n_devices <= 1:
            return None
        from smqtk_indexing_tpu.parallel.mesh import make_mesh
        return make_mesh(self.n_devices)

    def get_config(self) -> Dict[str, Any]:
        c = self.get_default_config()
        if self.cache_element is not None:
            c["cache_element"] = merge_dict(
                c["cache_element"], to_config_dict(self.cache_element))
        c["n_devices"] = self.n_devices
        return c

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def _save_cache(self) -> None:
        if self.cache_element is None:
            return
        if self.cache_element.is_read_only():
            raise ReadOnlyError(
                f"Cache element {self.cache_element} is read-only.")
        self.cache_element.set_bytes(self._store.to_bytes())

    def _load_cache(self) -> None:
        if self.cache_element is None or self.cache_element.is_empty():
            return
        self._store.from_bytes(self.cache_element.get_bytes())
        LOG.debug("Loaded %d hash codes from cache.", self._store.n_valid)

    # ------------------------------------------------------------------
    # index API
    # ------------------------------------------------------------------
    def count(self) -> int:
        return self._store.n_valid

    def _build_index(self, hashes: Iterable[np.ndarray]) -> None:
        with self._model_lock:
            mat = np.vstack([np.asarray(h) for h in hashes]).astype(bool)
            new_store = CodeStore(mesh=self._make_mesh())
            new_store.build(mat)
            self._store = new_store
            self._save_cache()

    def _update_index(self, hashes: Iterable[np.ndarray]) -> None:
        with self._model_lock:
            mat = np.vstack([np.asarray(h) for h in hashes]).astype(bool)
            self._store.add(mat)
            self._save_cache()

    def _remove_from_index(self, hashes: Iterable[np.ndarray]) -> None:
        with self._model_lock:
            mat = np.vstack([np.asarray(h) for h in hashes]).astype(bool)
            self._store.remove(mat)
            self._save_cache()


    def _nn_many(self, hs, n: int = 1):
        hs = np.atleast_2d(np.asarray(hs)).astype(bool)
        with self._model_lock:
            dists, codes = self._store.knn(hs, n)
        bits = hs.shape[1]
        return [(codes[i], tuple(float(d) / bits for d in dists[i]))
                for i in range(hs.shape[0])]

    def _nn(self, h: np.ndarray, n: int = 1
            ) -> Tuple[np.ndarray, Tuple[float, ...]]:
        h = np.asarray(h).astype(bool).reshape(1, -1)
        with self._model_lock:
            dists, codes = self._store.knn(h, n)
        bits = h.shape[1]
        return codes[0], tuple(float(d) / bits for d in dists[0])
