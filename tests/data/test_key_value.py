"""KeyValueStore tests (reference KV-store contract: batch ops, KeyError
semantics with no partial mutation)."""
import pytest

from smqtk_indexing_tpu.data.key_value import (
    KeyValueStore, MemoryKeyValueStore,
)


class TestMemoryKeyValueStore:
    def test_plugin_discoverable(self):
        assert MemoryKeyValueStore in KeyValueStore.get_impls()

    def test_add_get_has(self):
        kv = MemoryKeyValueStore()
        kv.add("a", 1)
        assert kv.has("a")
        assert "a" in kv
        assert kv.get("a") == 1
        assert kv.count() == 1 and len(kv) == 1

    def test_get_missing_raises(self):
        with pytest.raises(KeyError):
            MemoryKeyValueStore().get("nope")

    def test_get_default(self):
        assert MemoryKeyValueStore().get("nope", 42) == 42

    def test_add_many_and_iteration(self):
        kv = MemoryKeyValueStore()
        kv.add_many({1: "a", 2: "b"})
        assert sorted(kv.keys()) == [1, 2]
        assert sorted(kv.values()) == ["a", "b"]

    def test_get_many(self):
        kv = MemoryKeyValueStore()
        kv.add_many({1: "a", 2: "b"})
        assert list(kv.get_many([2, 1])) == ["b", "a"]

    def test_remove(self):
        kv = MemoryKeyValueStore()
        kv.add("a", 1)
        kv.remove("a")
        assert not kv.has("a")
        with pytest.raises(KeyError):
            kv.remove("a")

    def test_remove_many_no_partial_mutation(self):
        kv = MemoryKeyValueStore()
        kv.add_many({1: "a", 2: "b"})
        with pytest.raises(KeyError):
            kv.remove_many([1, 99])
        assert kv.has(1) and kv.has(2)

    def test_clear(self):
        kv = MemoryKeyValueStore()
        kv.add("a", 1)
        kv.clear()
        assert kv.count() == 0
