"""
IvfNearestNeighborsIndex tests: behavioral geometry (reference
test_faiss.py:443-515 patterns), mutation semantics, persistence, and
recall-vs-exhaustive sanity on clustered data.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.data.exceptions import ReadOnlyError
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (
    NearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.nn_index.ivf import IvfNearestNeighborsIndex


def _elem(uid, vec):
    return DescriptorMemoryElement(uid, np.asarray(vec, dtype=np.float32))


def _clustered(n_clusters=8, per=40, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 10
    elems = []
    for ci, c in enumerate(centers):
        for j in range(per):
            elems.append(_elem(f"{ci}-{j}", c + rng.normal(size=d) * 0.3))
    return elems


class TestIvfIndex:
    def test_plugin_discoverable(self):
        assert IvfNearestNeighborsIndex in NearestNeighborsIndex.get_impls()

    def test_configuration_roundtrip(self):
        i = IvfNearestNeighborsIndex(
            metric="cosine", n_lists=32, nprobe=4, kmeans_iterations=5,
            random_seed=0)
        for inst in configuration_test_helper(i):
            assert isinstance(inst, IvfNearestNeighborsIndex)
            assert inst.metric == "cosine"
            assert inst.n_lists == 32
            assert inst.nprobe == 4

    def test_invalid_metric(self):
        with pytest.raises(ValueError):
            IvfNearestNeighborsIndex(metric="hik")

    def test_build_and_self_retrieval(self):
        elems = _clustered()
        i = IvfNearestNeighborsIndex(n_lists=8, nprobe=2,
                                     kmeans_iterations=8, random_seed=0)
        i.build_index(elems)
        assert i.count() == len(elems)
        for j in (0, 111, 319):
            res, dists = i.nn(elems[j], 3)
            assert res[0].uuid() == elems[j].uuid()
            assert dists[0] == pytest.approx(0.0, abs=1e-4)
            assert list(dists) == sorted(dists)

    def test_full_probe_matches_exhaustive(self):
        # With nprobe == n_lists the IVF result must equal the flat scan.
        from smqtk_indexing_tpu.models.nn_index.flat import (
            FlatNearestNeighborsIndex,
        )
        elems = _clustered(n_clusters=4, per=30, seed=1)
        ivf = IvfNearestNeighborsIndex(n_lists=4, nprobe=4,
                                       kmeans_iterations=8, random_seed=0)
        flat = FlatNearestNeighborsIndex()
        ivf.build_index(elems)
        flat.build_index(elems)
        q = _elem("q", np.asarray(elems[5].vector()) + 0.01)
        r_ivf, d_ivf = ivf.nn(q, 10)
        r_flat, d_flat = flat.nn(q, 10)
        assert [e.uuid() for e in r_ivf] == [e.uuid() for e in r_flat]
        np.testing.assert_allclose(d_ivf, d_flat, atol=1e-4)

    def test_recall_with_partial_probe(self):
        elems = _clustered(n_clusters=16, per=25, d=16, seed=2)
        i = IvfNearestNeighborsIndex(n_lists=16, nprobe=3,
                                     kmeans_iterations=10, random_seed=0)
        i.build_index(elems)
        hits = 0
        for j in range(0, 400, 40):
            res, _ = i.nn(elems[j], 1)
            hits += res[0].uuid() == elems[j].uuid()
        assert hits >= 9  # own point lives in own cell

    def test_cosine_metric(self):
        rng = np.random.default_rng(3)
        elems = [_elem(j, rng.normal(size=16)) for j in range(64)]
        i = IvfNearestNeighborsIndex(metric="cosine", n_lists=4, nprobe=4,
                                     kmeans_iterations=5, random_seed=0)
        i.build_index(elems)
        res, dists = i.nn(elems[10], 2)
        assert res[0].uuid() == 10
        assert dists[0] == pytest.approx(0.0, abs=1e-3)
        assert all(0 <= d <= 2.0001 for d in dists)

    def test_update_skips_dupes_with_warning(self):
        elems = _clustered(n_clusters=2, per=10, seed=4)
        i = IvfNearestNeighborsIndex(n_lists=2, nprobe=2,
                                     kmeans_iterations=5, random_seed=0)
        i.build_index(elems)
        with pytest.warns(UserWarning):
            i.update_index([elems[0], _elem("new", elems[0].vector())])
        assert i.count() == len(elems) + 1
        res, d = i.nn(_elem("q", elems[0].vector()), 2)
        assert {r.uuid() for r in res} == {elems[0].uuid(), "new"}

    def test_update_on_empty_builds(self):
        i = IvfNearestNeighborsIndex(n_lists=2, kmeans_iterations=3,
                                     random_seed=0)
        i.update_index([_elem(j, [j, j, j, j]) for j in range(8)])
        assert i.count() == 8

    def test_remove(self):
        elems = _clustered(n_clusters=2, per=20, seed=5)
        i = IvfNearestNeighborsIndex(n_lists=2, nprobe=2,
                                     kmeans_iterations=5, random_seed=0)
        i.build_index(elems)
        i.remove_from_index([elems[0].uuid(), elems[1].uuid()])
        assert i.count() == len(elems) - 2
        res, _ = i.nn(elems[0], 1)
        assert res[0].uuid() != elems[0].uuid()

    def test_remove_missing_keyerror_no_mutation(self):
        elems = _clustered(n_clusters=2, per=5, seed=6)
        i = IvfNearestNeighborsIndex(n_lists=2, nprobe=2,
                                     kmeans_iterations=5, random_seed=0)
        i.build_index(elems)
        with pytest.raises(KeyError):
            i.remove_from_index([elems[0].uuid(), "bogus"])
        assert i.count() == len(elems)
        res, d = i.nn(elems[0], 1)
        assert res[0].uuid() == elems[0].uuid()

    def test_read_only(self):
        i = IvfNearestNeighborsIndex(read_only=True)
        with pytest.raises(ReadOnlyError):
            i.build_index([_elem(0, [0, 0])])

    def test_persistence_roundtrip(self):
        cache = DataMemoryElement()
        elems = _clustered(n_clusters=4, per=10, seed=7)
        i = IvfNearestNeighborsIndex(index_element=cache, n_lists=4,
                                     nprobe=4, kmeans_iterations=5,
                                     random_seed=0)
        i.build_index(elems)
        assert not cache.is_empty()

        i2 = IvfNearestNeighborsIndex(index_element=cache, n_lists=4,
                                      nprobe=4, random_seed=0)
        assert i2.count() == len(elems)
        res, dists = i2.nn(elems[3], 1)
        assert res[0].uuid() == elems[3].uuid()
        assert dists[0] == pytest.approx(0.0, abs=1e-4)

    def test_nn_many_batched(self):
        elems = _clustered(n_clusters=4, per=10, seed=8)
        i = IvfNearestNeighborsIndex(n_lists=4, nprobe=4,
                                     kmeans_iterations=5, random_seed=0)
        i.build_index(elems)
        results = i.nn_many(elems[:6], 2)
        assert len(results) == 6
        for j, (res, dists) in enumerate(results):
            assert res[0].uuid() == elems[j].uuid()


class TestShardedIvf:
    def test_sharded_full_probe_matches_single(self):
        elems = _clustered(n_clusters=8, per=40, d=16, seed=10)
        single = IvfNearestNeighborsIndex(n_lists=8, nprobe=8,
                                          kmeans_iterations=6,
                                          random_seed=0)
        multi = IvfNearestNeighborsIndex(n_lists=8, nprobe=8,
                                         kmeans_iterations=6,
                                         random_seed=0, n_devices=8)
        single.build_index(elems)
        multi.build_index(elems)
        for j in (0, 111, 319):
            r1, d1 = single.nn(elems[j], 5)
            r8, d8 = multi.nn(elems[j], 5)
            assert [e.uuid() for e in r8] == [e.uuid() for e in r1]
            np.testing.assert_allclose(d8, d1, atol=1e-4)

    def test_sharded_partial_probe_self_retrieval(self):
        elems = _clustered(n_clusters=8, per=40, d=16, seed=11)
        multi = IvfNearestNeighborsIndex(n_lists=8, nprobe=2,
                                         kmeans_iterations=6,
                                         random_seed=0, n_devices=8)
        multi.build_index(elems)
        hits = sum(multi.nn(elems[j], 1)[0][0].uuid() == elems[j].uuid()
                   for j in range(0, 320, 40))
        assert hits >= 7

    def test_sharded_config_roundtrip(self):
        from smqtk_indexing_tpu.core.configuration import (
            configuration_test_helper,
        )
        i = IvfNearestNeighborsIndex(n_devices=8)
        for inst in configuration_test_helper(i):
            assert inst.n_devices == 8


class TestListBalancing:
    def test_skewed_update_keeps_full_probe_exact(self):
        # Regression (review finding): after an update skews one cell far
        # past the balance cap (splitting it into virtual sublists),
        # nprobe == n_lists must STILL equal the flat scan exactly.
        from smqtk_indexing_tpu.models.nn_index.flat import (
            FlatNearestNeighborsIndex,
        )
        rng = np.random.default_rng(42)
        base = [_elem(f"b{j}", rng.normal(size=8) * 5 + c * 100)
                for c in range(4) for j_, j in [(c, f"{c}-{j2}")
                for j2 in range(50)]] if False else [
            _elem(f"b{c}-{j}", rng.normal(size=8) + np.eye(4)[c].repeat(2) * 50)
            for c in range(4) for j in range(50)]
        idx = IvfNearestNeighborsIndex(n_lists=4, nprobe=4,
                                       kmeans_iterations=6, random_seed=0)
        idx.build_index(base)
        # Skew: 800 more points into (roughly) one cell.
        skew = [_elem(f"s{j}", rng.normal(size=8) * 0.1
                      + np.eye(4)[0].repeat(2) * 50)
                for j in range(800)]
        idx.update_index(skew)
        assert idx._n_virtual > 4  # the mega-list actually split

        flat = FlatNearestNeighborsIndex()
        flat.build_index(base + skew)
        rng2 = np.random.default_rng(7)
        for _ in range(5):
            q = _elem("q", rng2.normal(size=8) * 30)
            r_i, d_i = idx.nn(q, 25)
            r_f, d_f = flat.nn(q, 25)
            np.testing.assert_allclose(d_i, d_f, atol=1e-4)

    def test_low_nprobe_covers_whole_split_list(self):
        # nprobe=1 must still scan a split mega-list in FULL.
        rng = np.random.default_rng(5)
        # Build on balanced data, then skew one cell via update (no
        # retrain) so the mega-list is guaranteed to split.
        base = [_elem(f"base{c}{j}",
                      rng.normal(size=8) + np.eye(4)[c].repeat(2) * 200)
                for c in range(4) for j in range(10)]
        idx = IvfNearestNeighborsIndex(n_lists=4, nprobe=1,
                                       kmeans_iterations=8, random_seed=0)
        idx.build_index(base)
        big = [_elem(f"big{j}",
                     rng.normal(size=8) * 0.5 + np.eye(4)[0].repeat(2) * 200)
               for j in range(600)]
        idx.update_index(big)
        assert idx._n_virtual > 4  # the skewed cell split
        # Every big-cluster point must find itself with a single probe.
        for j in (0, 299, 599):
            r, d = idx.nn(big[j], 1)
            assert r[0].uuid() == f"big{j}"


def test_ivf_remove_duplicate_uids_no_corruption():
    elems = _clustered(n_clusters=2, per=8, seed=9)
    i = IvfNearestNeighborsIndex(n_lists=2, nprobe=2, kmeans_iterations=4,
                                 random_seed=0)
    i.build_index(elems)
    u = elems[3].uuid()
    i.remove_from_index([u, u])
    assert i.count() == len(elems) - 1
    i.update_index([elems[3]])
    assert i.count() == len(elems)


def test_heavily_split_lists_keep_nprobe_coverage():
    # Review regression: when mean list length exceeds the balancer cap,
    # EVERY list splits many-way; nprobe translation must scale by the
    # split factor so nprobe=1 still covers the full nearest original
    # list (not just a fixed +8 sublists).
    rng = np.random.default_rng(21)
    d, per = 8, 9000
    centers = np.eye(4).repeat(2, axis=1) * 100
    elems = [_elem(f"{c}-{j}", centers[c] + rng.normal(size=d))
             for c in range(4) for j in range(per)]
    idx = IvfNearestNeighborsIndex(n_lists=4, nprobe=1,
                                   kmeans_iterations=6, random_seed=0)
    idx.build_index(elems)
    # >16-way split: a fixed "+8" slack (pow2-rounded to 16) could never
    # cover this; only the max_split-scaled translation can.
    assert idx._max_split > 16
    # Self-lookups sampled across every cluster and across list positions
    # (head / middle / tail of each original list's split chain).
    for c in range(4):
        for j in (0, per // 3, per // 2, per - 1):
            e = elems[c * per + j]
            r, dd = idx.nn(e, 1)
            assert r[0].uuid() == e.uuid()


def test_ivf_sq8_storage_and_factory():
    from smqtk_indexing_tpu.models.nn_index.factory import (
        index_from_factory_string,
    )
    rng = np.random.default_rng(30)
    centers = rng.normal(size=(8, 16)).astype(np.float32) * 10
    elems = [_elem(f"{c}-{j}", centers[c] + rng.normal(size=16))
             for c in range(8) for j in range(40)]
    idx = index_from_factory_string("IVF8,SQ8", nprobe=8,
                                    kmeans_iterations=5, random_seed=0)
    assert idx.dtype == "sq8"
    idx.build_index(elems)
    # exhaustive nprobe: every self-lookup must hit (sq8 quantization noise
    # is far below the cluster separation)
    for probe in (0, 100, 319):
        r, d = idx.nn(elems[probe], 1)
        assert r[0].uuid() == elems[probe].uuid()
        assert d[0] < 0.5
    # mutation path
    idx.remove_from_index([elems[0].uuid()])
    assert idx.count() == len(elems) - 1
    idx.update_index([elems[0]])
    assert idx.count() == len(elems)


def test_ivf_sq8_sharded_matches_single():
    rng = np.random.default_rng(31)
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 10
    elems = [_elem(f"{c}-{j}", centers[c] + rng.normal(size=16))
             for c in range(4) for j in range(64)]
    kw = dict(n_lists=4, nprobe=4, kmeans_iterations=5, random_seed=0,
              dtype="sq8")
    i1 = IvfNearestNeighborsIndex(**kw)
    i1.build_index(elems)
    i8 = IvfNearestNeighborsIndex(n_devices=8, **kw)
    i8.build_index(elems)
    for probe in (3, 130, 255):
        r1, d1 = i1.nn(elems[probe], 4)
        r8, d8 = i8.nn(elems[probe], 4)
        assert [e.uuid() for e in r1] == [e.uuid() for e in r8]
        np.testing.assert_allclose(d1, d8, atol=1e-5)
