"""External uid<->idx KeyValueStore slots (reference layout parity).

The reference persists its uid/idx bookkeeping in two configurable
KeyValueStore slots (/root/reference/smqtk_indexing/impls/nn_index/
faiss.py:260-274); configs written against that three-store layout must
map onto these impls. Here the slots are write-through mirrors of the
in-payload mapping, refreshed on build/update/remove/load.
"""
import numpy as np

from smqtk_indexing_tpu.data.descriptor import (
    DescriptorMemoryElement, MemoryDescriptorSet,
)
from smqtk_indexing_tpu.data.key_value import MemoryKeyValueStore
from smqtk_indexing_tpu.models.nn_index.flat import (
    FlatNearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.nn_index.ivf import IvfNearestNeighborsIndex


def _els(n, d, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        e = DescriptorMemoryElement(i)
        e.set_vector(rng.normal(size=d).astype(np.float32))
        out.append(e)
    return out


def _check_mirrors(u2i, i2u, n_expected):
    assert u2i.count() == n_expected
    assert i2u.count() == n_expected
    for uid in u2i.keys():
        idx = u2i.get(uid)
        assert i2u.get(idx) == uid


def test_flat_mirrors_follow_mutations():
    u2i, i2u = MemoryKeyValueStore(), MemoryKeyValueStore()
    idx = FlatNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(),
        uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    els = _els(40, 8)
    idx.build_index(els)
    _check_mirrors(u2i, i2u, 40)
    idx.remove_from_index([3, 5])
    _check_mirrors(u2i, i2u, 38)
    assert not u2i.has(3) and not u2i.has(5)
    idx.update_index(_els(5, 8, seed=9)[:1] or [])
    # uid 0 already indexed -> skipped; mapping unchanged in size
    _check_mirrors(u2i, i2u, 38)


def test_ivf_mirrors_follow_mutations_and_compaction():
    u2i, i2u = MemoryKeyValueStore(), MemoryKeyValueStore()
    idx = IvfNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(), n_lists=4, nprobe=4,
        random_seed=0, uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    els = _els(100, 8)
    idx.build_index(els)
    _check_mirrors(u2i, i2u, 100)
    # Rows in the mirror reflect the list-sorted layout, not input order.
    rows = sorted(u2i.get(u) for u in u2i.keys())
    assert rows == list(range(100))
    idx.remove_from_index(list(range(10)))
    _check_mirrors(u2i, i2u, 90)


def test_mirrors_refresh_on_load():
    from smqtk_indexing_tpu.data.data_element import DataMemoryElement
    elem = DataMemoryElement()
    idx = FlatNearestNeighborsIndex(descriptor_set=MemoryDescriptorSet(),
                                    index_element=elem)
    idx.build_index(_els(20, 8))
    u2i, i2u = MemoryKeyValueStore(), MemoryKeyValueStore()
    idx2 = FlatNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(), index_element=elem,
        uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    assert idx2.count() == 20
    _check_mirrors(u2i, i2u, 20)


def test_config_roundtrip_with_slots():
    import json
    u2i, i2u = MemoryKeyValueStore(), MemoryKeyValueStore()
    idx = FlatNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(),
        uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    cfg = json.loads(json.dumps(idx.get_config()))
    assert cfg["uid2idx_kvs"]["type"].endswith("MemoryKeyValueStore")
    idx2 = FlatNearestNeighborsIndex.from_config(cfg)
    assert isinstance(idx2.uid2idx_kvs, MemoryKeyValueStore)
    assert isinstance(idx2.idx2uid_kvs, MemoryKeyValueStore)
    # Default (slots omitted) stays None — in-payload mapping only.
    idx3 = FlatNearestNeighborsIndex.from_config(
        {"metric": "euclidean"})
    assert idx3.uid2idx_kvs is None and idx3.idx2uid_kvs is None

    i4 = IvfNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(),
        uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    cfg4 = json.loads(json.dumps(i4.get_config()))
    i5 = IvfNearestNeighborsIndex.from_config(cfg4)
    assert isinstance(i5.uid2idx_kvs, MemoryKeyValueStore)


class _CountingKVS(MemoryKeyValueStore):
    """Tracks write volume so tests can assert the mirror sync is
    incremental (O(delta), not a clear + full rewrite per mutation)."""

    def __init__(self):
        super().__init__()
        self.writes = 0
        self.removes = 0
        self.clears = 0

    def add(self, key, value):
        self.writes += 1
        return super().add(key, value)

    def add_many(self, d):
        self.writes += len(d)
        return super().add_many(d)

    def remove(self, key):
        self.removes += 1
        return super().remove(key)

    def remove_many(self, keys):
        keys = list(keys)
        self.removes += len(keys)
        return super().remove_many(keys)

    def clear(self):
        self.clears += 1
        return super().clear()


def test_mirror_sync_is_incremental():
    u2i, i2u = _CountingKVS(), _CountingKVS()
    idx = FlatNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(),
        uid2idx_kvs=u2i, idx2uid_kvs=i2u)
    idx.build_index(_els(40, 8))
    base_writes = u2i.writes
    assert base_writes >= 40          # first sync is the full rewrite
    # A non-compacting removal must write only the delta, never re-sync
    # the surviving 38 mappings (reference stores may be DB-backed).
    idx.remove_from_index([3, 5])
    _check_mirrors(u2i, i2u, 38)
    assert u2i.clears == i2u.clears == 1      # only the initial full sync
    assert u2i.writes - base_writes <= 4      # row moves only, if any
    assert u2i.removes >= 2 and u2i.removes <= 6
    # An update adds only the new uids (plus any rows the append moved).
    new = _els(3, 8, seed=77)
    for j, e in enumerate(new):
        e._uuid = 1000 + j
    before = u2i.writes
    idx.update_index(new)
    _check_mirrors(u2i, i2u, 41)
    assert u2i.clears == 1
    assert u2i.writes - before <= 10
