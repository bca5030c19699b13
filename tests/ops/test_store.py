"""VectorStore bookkeeping and codec-stability regressions (the store
behind FlatNearestNeighborsIndex; reference storage semantics
/root/reference/smqtk_indexing/impls/nn_index/faiss.py:260-274)."""
import numpy as np
import pytest

from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex
from smqtk_indexing_tpu.ops.store import VectorStore


def _mat(n, d=16, seed=0):
    return np.random.default_rng(seed).random((n, d), dtype=np.float32)


class TestBookkeeping:
    def test_add_rejects_in_batch_duplicate_uids(self):
        # Regression: two rows under one UID passed the present-check
        # (neither is indexed yet) and permanently corrupted row2uid /
        # n_live — a ghost row that survives removal.
        st = VectorStore()
        st.build(_mat(4), list("abcd"))
        with pytest.raises(ValueError, match="Duplicate"):
            st.add(_mat(2, seed=1), ["e", "e"])
        assert st.n_valid == 4 and not st.has_uid("e")

    def test_build_never_aliases_caller_array(self):
        # The host mirror is the persistence source of truth; mutating
        # the caller's array after build must not desync it from the
        # device copy.
        mat = _mat(8)
        st = VectorStore()
        st.build(mat, list(range(8)))
        before = st.vector(0).copy()
        mat[0] = 99.0
        assert np.array_equal(st.vector(0), before)

    def test_knn_row2uid_borrow_is_snapshot_consistent(self):
        # knn borrows the row->uid list; append-only growth under the
        # lock keeps existing indices stable, compaction replaces the
        # object wholesale. Drive both paths.
        st = VectorStore()
        st.build(_mat(32), list(range(32)))
        d, uids, rows = st.knn(_mat(2, seed=3), 4)
        assert len(uids) == 2 and len(uids[0]) == 4
        st.add(_mat(4, seed=5), [100, 101, 102, 103])
        st.remove(list(range(28)))
        d2, uids2, _ = st.knn(st.vector(100)[None, :], 1)
        assert uids2[0][0] == 100 and d2[0][0] < 1e-5

    def test_row2uid_borrow_invariant_across_add_and_compaction(self):
        # The borrow contract knn relies on (store.py "Borrow, don't
        # copy"): a reference taken under the lock (what a mid-flight
        # query batch holds while off the lock) must stay
        # index-consistent with the device snapshot it was taken with.
        # add() may only APPEND to the same object (existing indices
        # stable); compaction must REPLACE the object (the borrow keeps
        # the pre-compaction mapping). Compaction only fires when the
        # store is over 1024 rows and under half live — drive that leg
        # for real.
        n = 1500
        st = VectorStore()
        st.build(_mat(n), list(range(n)))
        borrowed = st._row2uid
        snapshot = list(borrowed)

        # add leg: same object, prefix untouched, suffix appended
        st.add(_mat(3, seed=7), [9000, 9001, 9002])
        assert st._row2uid is borrowed
        assert borrowed[:n] == snapshot
        assert borrowed[n:] == [9000, 9001, 9002]

        # compaction leg: 1503 rows -> 503 live (< half, > 1024 total)
        st.remove(list(range(1000)))
        assert st.n_valid == 503
        assert st._row2uid is not borrowed, \
            "compaction must replace the row->uid list, not mutate it"
        # the borrow still resolves pre-compaction rows
        assert borrowed[:n] == snapshot and len(borrowed) == n + 3
        # and the store's fresh mapping is correct post-compaction
        d, uids, _ = st.knn(st.vector(9002)[None, :], 1)
        assert uids[0][0] == 9002 and d[0][0] < 1e-5


class TestCodecStability:
    """Train-once contract (FAISS quantizer semantics): capacity growth
    and compaction re-uploads must NOT retrain the codec — distances of
    already-indexed rows stay fixed across mutations."""

    @pytest.mark.parametrize("dtype", ["sq8", "pq4"])
    def test_codec_fixed_across_capacity_growth(self, dtype):
        st = VectorStore(dtype=dtype)
        st.build(_mat(1000), list(range(1000)))
        if dtype == "sq8":
            before = np.asarray(st._sq8_a).copy()
        else:
            before = st._pq_cb.copy()
        q = _mat(1, seed=7)
        d0, u0, _ = st.knn(q, 5)
        # cross the 1024-capacity boundary -> _upload_full re-upload
        st.add(_mat(200, seed=9), [1000 + i for i in range(200)])
        assert st.capacity == 2048
        after = np.asarray(st._sq8_a) if dtype == "sq8" else st._pq_cb
        assert np.array_equal(before, after)
        # new rows may enter the top-k; every PRE-EXISTING neighbor
        # keeps its distance exactly (same codec -> same codes)
        d1, u1, _ = st.knn(q, 50)
        m1 = dict(zip(u1[0], d1[0]))
        for uid, dist in zip(u0[0], d0[0]):
            assert uid in m1
            np.testing.assert_allclose(m1[uid], dist, rtol=1e-5,
                                       atol=1e-6)

    @pytest.mark.parametrize("dtype", ["sq8", "pq4"])
    def test_codec_fixed_across_compaction(self, dtype):
        st = VectorStore(dtype=dtype)
        st.build(_mat(2048), list(range(2048)))
        before = np.asarray(st._sq8_a).copy() if dtype == "sq8" \
            else st._pq_cb.copy()
        st.remove(list(range(1500)))    # under half full -> compaction
        after = np.asarray(st._sq8_a) if dtype == "sq8" else st._pq_cb
        assert np.array_equal(before, after)
        # rebuild DOES retrain (fresh codec for fresh contents)
        st.build(_mat(100, seed=11), list(range(100)))
        retrained = np.asarray(st._sq8_a) if dtype == "sq8" else st._pq_cb
        assert retrained.shape != before.shape \
            or not np.array_equal(retrained, before)


class TestConstructionValidation:
    def test_chi_square_rejected_with_compressed_dtypes(self):
        # Fail at construction, not at the first query after an
        # expensive build: the compressed scans don't serve chi_square.
        for dtype in ("sq8", "pq8", "opq8"):
            with pytest.raises(ValueError, match="compressed"):
                FlatNearestNeighborsIndex(metric="chi_square", dtype=dtype)
        # the valid cells still construct
        FlatNearestNeighborsIndex(metric="chi_square", dtype="float32")
        FlatNearestNeighborsIndex(metric="hik", dtype="sq8")
