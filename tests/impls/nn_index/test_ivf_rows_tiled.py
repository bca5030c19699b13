"""
rows-sq8 tiled routing: on a real chip ``IvfNearestNeighborsIndex(
dtype='sq8', storage='rows')`` serves the tiled-transposed Pallas DMA
list-scan (the capacity tier's engine) instead of the row-major list
gather, keeping the float32 host mirror (exact re-rank, float
persistence — unlike the 'code' tier, which persists codes only). These
tests force the routing on CPU (SMQTK_TPU_ROWS_TILED=1, interpret mode)
and assert parity with the row-major device layout.
"""
import warnings

import numpy as np
import pytest

from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.models.nn_index.ivf import IvfNearestNeighborsIndex


def _elem(uid, vec):
    return DescriptorMemoryElement(uid, np.asarray(vec, dtype=np.float32))


def _clustered(n_clusters=4, per=40, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 10
    elems = []
    for ci, c in enumerate(centers):
        for j in range(per):
            elems.append(_elem(f"{ci}-{j}", c + rng.normal(size=d) * 0.3))
    return elems


def _rows_sq8(**kw):
    kw.setdefault("n_lists", 4)
    kw.setdefault("nprobe", 4)
    kw.setdefault("kmeans_iterations", 6)
    kw.setdefault("random_seed", 0)
    return IvfNearestNeighborsIndex(dtype="sq8", storage="rows", **kw)


@pytest.fixture
def forced(monkeypatch):
    monkeypatch.setenv("SMQTK_TPU_ROWS_TILED", "1")
    monkeypatch.delenv("SMQTK_TPU_NO_ROWS_TILED", raising=False)


def test_routing_keeps_float_mirror(forced):
    idx = _rows_sq8()
    idx.build_index(_clustered())
    assert idx._dev3 is not None          # tiled device state
    assert idx._dev is None               # no row-major copy
    assert idx._host.dtype == np.float32  # rows-tier mirror intact
    assert idx._code_a is None            # codec is per-layout, not
    #                                       the persisted 'code' codec


def test_matches_rowmajor_at_full_probe(forced, monkeypatch):
    elems = _clustered()
    queries = _clustered(seed=3)[:12]
    idx_t = _rows_sq8()
    idx_t.build_index(elems)
    assert idx_t._dev3 is not None
    monkeypatch.setenv("SMQTK_TPU_NO_ROWS_TILED", "1")
    idx_r = _rows_sq8()
    idx_r.build_index(elems)
    assert idx_r._dev3 is None
    k = 8
    for q in queries:
        n_t, d_t = idx_t.nn(q, k)
        n_r, d_r = idx_r.nn(q, k)
        # Both paths are exact over the same retrained-per-build codec:
        # same winners (modulo quantized-distance ties), same distances.
        assert {e.uuid() for e in n_t} == {e.uuid() for e in n_r}
        np.testing.assert_allclose(d_t, d_r, rtol=1e-4, atol=1e-4)


def test_update_and_removal(forced):
    elems = _clustered()
    idx = _rows_sq8()
    idx.build_index(elems)
    target = elems[0]
    extra = _elem("new-0", np.asarray(target.vector()) + 0.01)
    idx.update_index([extra])
    assert idx.count() == len(elems) + 1
    n, _ = idx.nn(target, 3)
    got = {e.uuid() for e in n}
    assert "new-0" in got and "0-0" in got
    idx.remove_from_index(["0-0"])
    assert idx.count() == len(elems)
    n, _ = idx.nn(target, 3)
    assert "0-0" not in {e.uuid() for e in n}
    with pytest.raises(KeyError):
        idx.remove_from_index(["absent"])


def test_persistence_is_float_rows(forced):
    elems = _clustered()
    cache = DataMemoryElement(readonly=False)
    idx = _rows_sq8(index_element=cache)
    idx.build_index(elems)
    baseline = [e.uuid() for e in idx.nn(elems[5], 5)[0]]
    # rows-tier contract: the payload carries float32 originals (the
    # 'code' tier is the codes-only format), so a float32/rows instance
    # can reload it losslessly.
    idx2 = _rows_sq8(index_element=cache)
    assert idx2.count() == len(elems)
    assert idx2._host.dtype == np.float32
    assert [e.uuid() for e in idx2.nn(elems[5], 5)[0]] == baseline


def test_routing_flip_clears_stale_state(forced, monkeypatch):
    # A re-layout that crosses a routing-flag flip must not leave the
    # previous engine's device state behind (the query path prefers
    # tiled arrays whenever they exist).
    elems = _clustered()
    idx = _rows_sq8()
    idx.build_index(elems)
    assert idx._dev3 is not None
    monkeypatch.setenv("SMQTK_TPU_NO_ROWS_TILED", "1")
    idx.update_index([_elem("late", np.asarray(elems[0].vector()) + 0.5)])
    assert idx._dev3 is None and idx._dev is not None
    n, _ = idx.nn(elems[0], 2)
    assert elems[0].uuid() in {e.uuid() for e in n}
    # And back: a tiled rebuild clears the row-major arrays.
    monkeypatch.delenv("SMQTK_TPU_NO_ROWS_TILED")
    idx.update_index([_elem("late2",
                            np.asarray(elems[0].vector()) + 0.6)])
    assert idx._dev3 is not None and idx._dev is None
    n, _ = idx.nn(elems[0], 2)
    assert elems[0].uuid() in {e.uuid() for e in n}


def test_kill_switch_restores_rowmajor(monkeypatch):
    monkeypatch.setenv("SMQTK_TPU_ROWS_TILED", "1")
    monkeypatch.setenv("SMQTK_TPU_NO_ROWS_TILED", "1")
    idx = _rows_sq8()
    idx.build_index(_clustered())
    assert idx._dev3 is None
    assert idx._dev is not None


def _rows_pq(**kw):
    kw.setdefault("n_lists", 4)
    kw.setdefault("nprobe", 4)
    kw.setdefault("kmeans_iterations", 6)
    kw.setdefault("random_seed", 0)
    return IvfNearestNeighborsIndex(dtype="pq4", storage="rows", **kw)


def test_pq_routing_keeps_float_mirror(forced):
    idx = _rows_pq()
    idx.build_index(_clustered())
    assert idx._dev3 is not None
    assert idx._dev is None
    assert idx._host.dtype == np.float32
    assert idx._code_cb is None   # per-layout codec, never persisted


def test_pq_matches_rowmajor_at_full_probe(forced, monkeypatch):
    # Both engines score the SAME per-build codec's reconstructions
    # (pq_train is deterministic over the same live rows), so winners and
    # exact-re-rank distances agree modulo reconstruction-distance ties.
    elems = _clustered()
    queries = _clustered(seed=3)[:12]
    idx_t = _rows_pq()
    idx_t.build_index(elems)
    assert idx_t._dev3 is not None
    monkeypatch.setenv("SMQTK_TPU_NO_ROWS_TILED", "1")
    idx_r = _rows_pq()
    idx_r.build_index(elems)
    assert idx_r._dev3 is None
    k = 8
    for q in queries:
        n_t, d_t = idx_t.nn(q, k)
        n_r, d_r = idx_r.nn(q, k)
        assert {e.uuid() for e in n_t} == {e.uuid() for e in n_r}
        np.testing.assert_allclose(d_t, d_r, rtol=1e-4, atol=1e-4)


def test_pq_update_and_removal(forced):
    elems = _clustered()
    idx = _rows_pq()
    idx.build_index(elems)
    target = elems[0]
    idx.update_index([_elem("new-0",
                            np.asarray(target.vector()) + 0.01)])
    assert idx.count() == len(elems) + 1
    idx.remove_from_index(["0-0"])
    n, _ = idx.nn(target, 3)
    assert "0-0" not in {e.uuid() for e in n}


def test_nprobe_partial_coverage(forced):
    # Faithful nprobe through the tiled table path on the rows tier:
    # nprobe=1 restricts to the nearest original list (self-retrieval
    # still finds the query's own cluster).
    elems = _clustered()
    idx = _rows_sq8(nprobe=1)
    idx.build_index(elems)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        n, d = idx.nn(elems[17], 1)
    assert n[0].uuid() == elems[17].uuid()
    # Self-distance is the sq8 quantization residual (±10-scale data).
    assert d[0] < 0.5


def test_default_routing_matrix(monkeypatch):
    """The data-gated routing default (round-4 same-window A/B at
    Deep1M): rows-sq8 with exact re-rank stays ROW-MAJOR even when the
    TPU kernels are live; rows-sq8 + rerank='score' and rows-pq<M>
    route tiled. Force-flags override in both directions."""
    monkeypatch.delenv("SMQTK_TPU_ROWS_TILED", raising=False)
    monkeypatch.delenv("SMQTK_TPU_NO_ROWS_TILED", raising=False)
    import smqtk_indexing_tpu.ops.device as device_mod
    monkeypatch.setattr(device_mod, "tpu_kernel_enabled", lambda _: True)

    def ok(**kw):
        return IvfNearestNeighborsIndex(
            storage="rows", n_lists=4, **kw)._tiled_rows_ok()

    assert not ok(dtype="sq8", rerank="exact")
    assert ok(dtype="sq8", rerank="score")
    assert ok(dtype="pq8", rerank="exact")
    assert ok(dtype="opq8", rerank="exact")
    assert not ok(dtype="float32", rerank="exact")
    assert not ok(dtype="sq8", rerank="exact", metric="cosine") \
        and not ok(dtype="pq8", rerank="exact", metric="cosine")
    monkeypatch.setenv("SMQTK_TPU_ROWS_TILED", "1")
    assert ok(dtype="sq8", rerank="exact")
    monkeypatch.setenv("SMQTK_TPU_NO_ROWS_TILED", "1")
    assert not ok(dtype="pq8", rerank="exact")
