"""KeyValueStore tests (reference KV-store contract: batch ops, KeyError
semantics with no partial mutation; durable file-backed impl)."""
import os
import pickle

import numpy as np
import pytest

from smqtk_indexing_tpu.data.key_value import (
    FileKeyValueStore, KeyValueStore, MemoryKeyValueStore,
)
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError


@pytest.fixture(params=["memory", "file"])
def kv_factory(request, tmp_path):
    """Factory yielding fresh stores of one impl per param so the shared
    contract tests run against both implementations."""
    counter = [0]

    def make():
        if request.param == "memory":
            return MemoryKeyValueStore()
        counter[0] += 1
        return FileKeyValueStore(str(tmp_path / f"kv{counter[0]}.log"))

    return make


class TestKeyValueStoreContract:
    def test_add_get_has(self, kv_factory):
        kv = kv_factory()
        kv.add("a", 1)
        assert kv.has("a")
        assert "a" in kv
        assert kv.get("a") == 1
        assert kv.count() == 1 and len(kv) == 1

    def test_get_missing_raises(self, kv_factory):
        with pytest.raises(KeyError):
            kv_factory().get("nope")

    def test_get_default(self, kv_factory):
        assert kv_factory().get("nope", 42) == 42

    def test_add_many_and_iteration(self, kv_factory):
        kv = kv_factory()
        kv.add_many({1: "a", 2: "b"})
        assert sorted(kv.keys()) == [1, 2]
        assert sorted(kv.values()) == ["a", "b"]

    def test_get_many(self, kv_factory):
        kv = kv_factory()
        kv.add_many({1: "a", 2: "b"})
        assert list(kv.get_many([2, 1])) == ["b", "a"]

    def test_remove(self, kv_factory):
        kv = kv_factory()
        kv.add("a", 1)
        kv.remove("a")
        assert not kv.has("a")
        with pytest.raises(KeyError):
            kv.remove("a")

    def test_remove_many_no_partial_mutation(self, kv_factory):
        kv = kv_factory()
        kv.add_many({1: "a", 2: "b"})
        with pytest.raises(KeyError):
            kv.remove_many([1, 99])
        assert kv.has(1) and kv.has(2)

    def test_clear(self, kv_factory):
        kv = kv_factory()
        kv.add("a", 1)
        kv.clear()
        assert kv.count() == 0


class TestFileKeyValueStore:
    def test_plugin_discoverable(self):
        assert FileKeyValueStore in KeyValueStore.get_impls()

    def test_survives_reopen(self, tmp_path):
        p = str(tmp_path / "kv.log")
        kv = FileKeyValueStore(p)
        kv.add_many({"a": 1, "b": {2, 3}})
        kv.add("a", 5)
        kv.remove("b")
        kv2 = FileKeyValueStore(p)
        assert dict(zip(kv2.keys(), kv2.values())) == {"a": 5}

    def test_compaction_preserves_state(self, tmp_path):
        p = str(tmp_path / "kv.log")
        kv = FileKeyValueStore(p, compact_factor=2)
        for i in range(200):
            kv.add("k", i)
        size = os.path.getsize(p)
        # compaction must have collapsed the 200 overwrite records
        one_rec = len(pickle.dumps(("A", {"k": 199})))
        assert size < 20 * one_rec
        assert FileKeyValueStore(p).get("k") == 199

    def test_clear_truncates(self, tmp_path):
        p = str(tmp_path / "kv.log")
        kv = FileKeyValueStore(p)
        kv.add_many({i: i for i in range(50)})
        kv.clear()
        assert os.path.getsize(p) == 0
        assert FileKeyValueStore(p).count() == 0

    def test_readonly(self, tmp_path):
        p = str(tmp_path / "kv.log")
        FileKeyValueStore(p).add("a", 1)
        kv = FileKeyValueStore(p, readonly=True)
        assert kv.get("a") == 1
        for call in (lambda: kv.add("b", 2),
                     lambda: kv.add_many({"b": 2}),
                     lambda: kv.remove("a"),
                     lambda: kv.remove_many(["a"]),
                     lambda: kv.clear()):
            with pytest.raises(ReadOnlyError):
                call()

    def test_torn_tail_recovered_and_truncated(self, tmp_path):
        """A mutation interrupted mid-append (torn final record) must not
        brick the store: replay keeps every intact record, warns, and
        truncates the log so later appends extend a valid stream."""
        p = str(tmp_path / "kv.log")
        kv = FileKeyValueStore(p)
        kv.add("a", 1)
        kv.add("b", 2)
        good_size = os.path.getsize(p)
        kv.add("c", 3)
        # tear the last record mid-way
        os.truncate(p, good_size + 3)
        with pytest.warns(UserWarning, match="torn tail"):
            kv2 = FileKeyValueStore(p)
        assert dict(zip(kv2.keys(), kv2.values())) == {"a": 1, "b": 2}
        assert os.path.getsize(p) == good_size
        # the repaired log accepts appends and replays cleanly
        kv2.add("d", 4)
        kv3 = FileKeyValueStore(p)
        assert dict(zip(kv3.keys(), kv3.values())) == {"a": 1, "b": 2,
                                                       "d": 4}

    def test_garbage_tail_recovered(self, tmp_path):
        p = str(tmp_path / "kv.log")
        FileKeyValueStore(p).add_many({"a": 1, "b": 2})
        good_size = os.path.getsize(p)
        with open(p, "ab") as f:
            f.write(b"not a pickle record")
        with pytest.warns(UserWarning, match="torn tail"):
            kv = FileKeyValueStore(p)
        assert kv.get("a") == 1 and kv.get("b") == 2
        assert os.path.getsize(p) == good_size

    def test_torn_tail_readonly_not_modified(self, tmp_path):
        p = str(tmp_path / "kv.log")
        FileKeyValueStore(p).add("a", 1)
        with open(p, "ab") as f:
            f.write(b"\x80\x05torn")
        torn_size = os.path.getsize(p)
        with pytest.warns(UserWarning, match="torn tail"):
            kv = FileKeyValueStore(p, readonly=True)
        assert kv.get("a") == 1
        assert os.path.getsize(p) == torn_size  # file untouched

    def test_config_round_trip(self, tmp_path):
        from smqtk_indexing_tpu.core.configuration import (
            from_config_dict, to_config_dict,
        )
        p = str(tmp_path / "kv.log")
        kv = FileKeyValueStore(p, compact_factor=8)
        kv.add("a", 1)
        kv2 = from_config_dict(to_config_dict(kv),
                               KeyValueStore.get_impls())
        assert isinstance(kv2, FileKeyValueStore)
        assert kv2.get_config() == kv.get_config()
        assert kv2.get("a") == 1


class TestThreeStoreDurability:
    """Reference-style three-store layouts (faiss.py:260-274 uid maps;
    lsh.py:160-234 hash2uuids) round-trip through REAL files and survive
    a process restart (simulated by constructing fresh stores on the same
    paths)."""

    def test_flat_uid_mirrors_durable(self, tmp_path):
        from smqtk_indexing_tpu.data.descriptor import (
            DescriptorMemoryElement,
        )
        from smqtk_indexing_tpu.models.nn_index.flat import (
            FlatNearestNeighborsIndex,
        )
        p_u2i = str(tmp_path / "uid2idx.log")
        p_i2u = str(tmp_path / "idx2uid.log")
        rng = np.random.default_rng(0)
        elems = [DescriptorMemoryElement(f"u{i}", rng.random(16,
                                                             dtype=np.float32))
                 for i in range(10)]
        idx = FlatNearestNeighborsIndex(
            uid2idx_kvs=FileKeyValueStore(p_u2i),
            idx2uid_kvs=FileKeyValueStore(p_i2u))
        idx.build_index(elems)
        idx.remove_from_index(["u3"])
        live = idx._store.uid_to_row()
        # "restart": fresh store objects replaying the logs
        u2i = FileKeyValueStore(p_u2i)
        i2u = FileKeyValueStore(p_i2u)
        assert dict(zip(u2i.keys(), u2i.values())) == live
        assert dict(zip(i2u.keys(), i2u.values())) == {
            r: u for u, r in live.items()}

    def test_lsh_hash2uuids_durable(self, tmp_path):
        from smqtk_indexing_tpu.data.descriptor import (
            DescriptorMemoryElement,
        )
        from smqtk_indexing_tpu.models.lsh_functor.simple_rp import (
            SimpleRPFunctor,
        )
        from smqtk_indexing_tpu.models.nn_index.lsh import (
            LSHNearestNeighborIndex,
        )
        p = str(tmp_path / "hash2uuids.log")
        rng = np.random.default_rng(1)
        elems = [DescriptorMemoryElement(i, rng.standard_normal(
            16).astype(np.float32)) for i in range(32)]
        functor = SimpleRPFunctor(bit_length=8, random_seed=0)
        functor.fit(elems)
        idx = LSHNearestNeighborIndex(
            lsh_functor=functor,
            hash2uuids_kvstore=FileKeyValueStore(p))
        idx.build_index(elems)
        before = {k: set(v) for k, v in zip(
            idx.hash2uuids_kvstore.keys(),
            idx.hash2uuids_kvstore.values())}
        assert before
        reopened = FileKeyValueStore(p)
        after = {k: set(v) for k, v in zip(reopened.keys(),
                                           reopened.values())}
        assert after == before
        # mutations append durably too
        idx.remove_from_index([0, 1])
        reopened2 = FileKeyValueStore(p)
        after2 = {k: set(v) for k, v in zip(reopened2.keys(),
                                            reopened2.values())}
        assert after2 == {k: set(v) for k, v in zip(
            idx.hash2uuids_kvstore.keys(),
            idx.hash2uuids_kvstore.values())}


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
