"""
BallTree-equivalent hash index.

Capability-parity with the reference's ``SkLearnBallTreeHashIndex``
(/root/reference/smqtk_indexing/impls/hash_index/sklearn_balltree.py:33-375):
same constructor surface (``cache_element``, ``leaf_size``, ``random_seed``),
same build-dedup / rebuild-on-update / rebuild-on-remove / normalized-Hamming
``nn`` semantics.

TPU-first inversion: a metric ball tree is a pointer-chasing, data-dependent
branch structure — the worst possible shape for a systolic/vector machine. On
TPU the exhaustive packed XOR + population_count + fused top-k scan
(ops/hamming.py) is both exact and faster than any tree traversal up to very
large N (the scan is HBM-bandwidth bound at ~bits/8 bytes per code), so this
implementation intentionally executes on the same engine as LinearHashIndex.
``leaf_size`` and ``random_seed`` are retained for config-surface parity and
are no-ops, as documented. The two classes remain distinct plugins so configs
written against either reference impl resolve here.
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


class BallTreeHashIndex (HashIndex):
    """
    Hamming hash index with the reference BallTree configuration surface,
    executing as an exact packed-code scan on TPU.

    :param cache_element: Optional DataElement for write-through persistence.
    :param leaf_size: Accepted for parity with the reference's sklearn
        BallTree parameter (sklearn_balltree.py:96-104); the TPU scan has no
        tree, so this only affects nothing and is preserved in config
        round-trips.
    :param random_seed: Accepted for parity; unused (the scan is exact and
        deterministic).
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
                    ) -> "BallTreeHashIndex":
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
                 leaf_size: int = 40,
                 random_seed: Optional[int] = None):
        super().__init__()
        self.cache_element = cache_element
        self.leaf_size = leaf_size
        self.random_seed = random_seed
        self._model_lock = threading.RLock()
        self._store = CodeStore()
        self._load_cache()

    def get_config(self) -> Dict[str, Any]:
        c = self.get_default_config()
        if self.cache_element is not None:
            c["cache_element"] = merge_dict(
                c["cache_element"], to_config_dict(self.cache_element))
        c["leaf_size"] = self.leaf_size
        c["random_seed"] = self.random_seed
        return c

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

    def count(self) -> int:
        return self._store.n_valid

    def _build_index(self, hashes: Iterable[np.ndarray]) -> None:
        with self._model_lock:
            mat = np.vstack([np.asarray(h) for h in hashes]).astype(bool)
            new_store = CodeStore()
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
