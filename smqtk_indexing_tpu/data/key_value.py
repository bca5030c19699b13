"""
Key-value store abstraction: minimal equivalent of
``smqtk_dataprovider.KeyValueStore`` (reference usage for hash->UID-set and
UID<->row mappings, /root/reference/smqtk_indexing/impls/nn_index/faiss.py:260-274,
lsh.py hash2uuids store).
"""
from __future__ import annotations

import abc
from typing import Any, Dict, Hashable, Iterable, Iterator, Mapping

from smqtk_indexing_tpu.core.configuration import Configurable
from smqtk_indexing_tpu.core.plugin import Pluggable
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError

_SENTINEL = object()


class KeyValueStore (Configurable, Pluggable, metaclass=abc.ABCMeta):
    """Abstract key-value storage with batch operations."""

    def __len__(self) -> int:
        return self.count()

    def __contains__(self, key: Hashable) -> bool:
        return self.has(key)

    @abc.abstractmethod
    def is_read_only(self) -> bool: ...

    @abc.abstractmethod
    def count(self) -> int: ...

    @abc.abstractmethod
    def keys(self) -> Iterator[Hashable]: ...

    @abc.abstractmethod
    def values(self) -> Iterator[Any]: ...

    @abc.abstractmethod
    def has(self, key: Hashable) -> bool: ...

    @abc.abstractmethod
    def add(self, key: Hashable, value: Any) -> "KeyValueStore":
        """:raises ReadOnlyError: store is read-only."""

    @abc.abstractmethod
    def add_many(self, d: Mapping[Hashable, Any]) -> "KeyValueStore":
        """:raises ReadOnlyError: store is read-only."""

    @abc.abstractmethod
    def remove(self, key: Hashable) -> "KeyValueStore":
        """
        :raises ReadOnlyError: store is read-only.
        :raises KeyError: key not present.
        """

    @abc.abstractmethod
    def remove_many(self, keys: Iterable[Hashable]) -> "KeyValueStore":
        """
        :raises ReadOnlyError: store is read-only.
        :raises KeyError: any key not present; store not modified.
        """

    @abc.abstractmethod
    def get(self, key: Hashable, default: Any = _SENTINEL) -> Any:
        """:raises KeyError: key not present and no default given."""

    def get_many(self, keys: Iterable[Hashable],
                 default: Any = _SENTINEL) -> Iterator[Any]:
        for k in keys:
            yield self.get(k, default)

    @abc.abstractmethod
    def clear(self) -> "KeyValueStore":
        """:raises ReadOnlyError: store is read-only."""


class MemoryKeyValueStore (KeyValueStore):
    """In-memory dict-backed key-value store."""

    def __init__(self) -> None:
        super().__init__()
        self._table: Dict[Hashable, Any] = {}

    def get_config(self) -> Dict[str, Any]:
        return {}

    def is_read_only(self) -> bool:
        return False

    def count(self) -> int:
        return len(self._table)

    def keys(self) -> Iterator[Hashable]:
        return iter(self._table.keys())

    def values(self) -> Iterator[Any]:
        return iter(self._table.values())

    def has(self, key: Hashable) -> bool:
        return key in self._table

    def add(self, key: Hashable, value: Any) -> "MemoryKeyValueStore":
        if self.is_read_only():
            raise ReadOnlyError(f"{self} is read-only.")
        self._table[key] = value
        return self

    def add_many(self, d: Mapping[Hashable, Any]) -> "MemoryKeyValueStore":
        if self.is_read_only():
            raise ReadOnlyError(f"{self} is read-only.")
        self._table.update(d)
        return self

    def remove(self, key: Hashable) -> "MemoryKeyValueStore":
        if self.is_read_only():
            raise ReadOnlyError(f"{self} is read-only.")
        del self._table[key]
        return self

    def remove_many(self, keys: Iterable[Hashable]) -> "MemoryKeyValueStore":
        if self.is_read_only():
            raise ReadOnlyError(f"{self} is read-only.")
        keys = list(keys)
        for k in keys:
            if k not in self._table:
                raise KeyError(k)
        for k in keys:
            del self._table[k]
        return self

    def get(self, key: Hashable, default: Any = _SENTINEL) -> Any:
        if key in self._table:
            return self._table[key]
        if default is _SENTINEL:
            raise KeyError(key)
        return default

    def clear(self) -> "MemoryKeyValueStore":
        if self.is_read_only():
            raise ReadOnlyError(f"{self} is read-only.")
        self._table.clear()
        return self
