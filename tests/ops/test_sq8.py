"""
SQ8 codec + scan tests (CPU): codec round-trip error bounds, scan recall
against the exact float scan, store integration, factory strings, and the
row-sharded variant.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from smqtk_indexing_tpu.ops import scan, sq8
from smqtk_indexing_tpu.ops.store import VectorStore


def _data(n=4096, d=32, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.normal(size=(n, d)).astype(np.float32) * 2.0
    q = rng.normal(size=(8, d)).astype(np.float32) * 2.0
    return db, q


def test_codec_roundtrip_error_bound():
    db, _ = _data()
    a, b = sq8.sq8_train(db)
    codes = sq8.sq8_encode_np(db, a, b)
    assert codes.dtype == np.int8
    dec = np.asarray(sq8.sq8_decode(jnp.asarray(codes), jnp.asarray(a),
                                    jnp.asarray(b)))
    # Max per-dim error is half a quantization step.
    err = np.abs(dec - db)
    assert np.all(err <= a[None, :] * 0.5 + 1e-6)


def test_codec_constant_dimension():
    db, _ = _data(n=256, d=8)
    db[:, 3] = 7.25  # constant dim: a=eps, codes 0, b reproduces exactly
    a, b = sq8.sq8_train(db)
    codes = sq8.sq8_encode_np(db, a, b)
    dec = np.asarray(sq8.sq8_decode(jnp.asarray(codes), jnp.asarray(a),
                                    jnp.asarray(b)))
    np.testing.assert_allclose(dec[:, 3], 7.25, rtol=1e-6)


def _setup_scan(db, metric="euclidean"):
    a, b = sq8.sq8_train(db)
    codes = jnp.asarray(sq8.sq8_encode_np(db, a, b))
    s2, nrm = sq8.sq8_row_stats(codes, jnp.asarray(a), jnp.asarray(b))
    valid = jnp.ones(db.shape[0], dtype=bool)
    return codes, jnp.asarray(a), jnp.asarray(b), s2, nrm, valid


@pytest.mark.parametrize("metric",
                         ["euclidean", "inner_product", "cosine", "hik"])
def test_sq8_topk_high_recall_vs_exact(metric):
    db, q = _data()
    if metric == "hik":  # histograms: nonnegative
        db, q = np.abs(db), np.abs(q)
    codes, a, b, s2, nrm, valid = _setup_scan(db)
    d_sq8, r_sq8 = sq8.sq8_topk(codes, a, b, s2, nrm, valid,
                                jnp.asarray(q), k=10, metric=metric)
    sqv = np.einsum("ij,ij->i", db, db).astype(np.float32)
    d_ref, r_ref = scan.flat_topk(
        jnp.asarray(db), jnp.asarray(sqv), jnp.asarray(np.sqrt(sqv)),
        valid, jnp.asarray(q), k=10, metric=metric)
    r_sq8, r_ref = np.asarray(r_sq8), np.asarray(r_ref)
    rec = np.mean([len(set(r_sq8[i]) & set(r_ref[i])) / 10
                   for i in range(q.shape[0])])
    assert rec >= 0.9, (metric, rec)
    # distances ascend and are finite
    d_sq8 = np.asarray(d_sq8)
    assert np.all(np.diff(d_sq8, axis=1) >= -1e-5)


def test_sq8_fused_stage1_matches_streamed():
    """The Pallas int8 stage 1 (interpret mode) must reproduce the XLA
    streamed scan's results exactly (same stage 2 / exact re-rank)."""
    import jax.numpy as jnp

    from smqtk_indexing_tpu.ops import sq8
    from smqtk_indexing_tpu.ops.pallas_scan import TILE_N

    rng = np.random.default_rng(0)
    n, d, b, k = 2 * TILE_N, 128, 8, 8
    mat = (rng.random((n, d), dtype=np.float32) * 10)
    a, bb = sq8.sq8_train(mat)
    codes = sq8.sq8_encode_np(mat, a, bb)
    q = (rng.random((b, d), dtype=np.float32) * 10)
    cj = jnp.asarray(codes)
    aj, bj = jnp.asarray(a), jnp.asarray(bb)
    s2, nrm = sq8.sq8_row_stats(cj, aj, bj)
    valid = np.ones(n, bool)
    valid[100:200] = False
    vj = jnp.asarray(valid)
    for metric in ("euclidean", "inner_product"):
        d_ref, r_ref = sq8.sq8_topk(cj, aj, bj, s2, nrm, vj,
                                    jnp.asarray(q), k=k, metric=metric,
                                    chunk=1024)
        d_f, r_f = sq8.sq8_topk(cj, aj, bj, s2, nrm, vj, jnp.asarray(q),
                                k=k, metric=metric, chunk=1024,
                                codes_t=jnp.asarray(codes.T.copy()),
                                interpret=True)
        assert np.array_equal(np.asarray(r_f), np.asarray(r_ref)), metric
        np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                                   atol=1e-5, rtol=1e-6)


def test_sq8_topk_self_match_and_chunked():
    # > chunk rows exercises the lax.scan streaming path (N % chunk == 0,
    # the store capacity invariant).
    db, _ = _data(n=3072, d=16, seed=2)
    codes, a, b, s2, nrm, valid = _setup_scan(db)
    q = np.asarray(sq8.sq8_decode(codes[:8], a, b))  # exact grid points
    d_s, r_s = sq8.sq8_topk(codes, a, b, s2, nrm, valid, jnp.asarray(q),
                            k=3, metric="euclidean", chunk=1024)
    assert np.array_equal(np.asarray(r_s)[:, 0], np.arange(8))
    assert np.allclose(np.asarray(d_s)[:, 0], 0.0, atol=1e-4)


def test_sq8_topk_respects_valid_mask():
    db, q = _data(n=512, d=16, seed=3)
    codes, a, b, s2, nrm, _ = _setup_scan(db)
    valid = np.zeros(512, dtype=bool)
    valid[37] = True
    d_s, r_s = sq8.sq8_topk(codes, a, b, s2, nrm, jnp.asarray(valid),
                            jnp.asarray(q), k=4, metric="euclidean")
    r_s, d_s = np.asarray(r_s), np.asarray(d_s)
    assert np.all(r_s[:, 0] == 37)
    assert np.all(r_s[:, 1:] == -1)
    assert np.all(np.isinf(d_s[:, 1:]))


def test_store_sq8_build_query_mutate_persist():
    db, q = _data(n=600, d=24, seed=4)
    st = VectorStore(dtype="sq8")
    st.build(db, list(range(600)))
    dists, uids, rows = st.knn(q, 5)
    # recall vs exact f32 store
    st32 = VectorStore(dtype="float32")
    st32.build(db, list(range(600)))
    _, uids32, _ = st32.knn(q, 5)
    rec = np.mean([len(set(uids[i]) & set(uids32[i])) / 5
                   for i in range(len(uids))])
    assert rec >= 0.9
    # add (encodes with the build-time codec) + remove + re-query
    st.add(db[:4] + 0.01, [1000, 1001, 1002, 1003])
    st.remove([0, 1])
    assert st.n_valid == 602
    d2, u2, _ = st.knn(db[2][None, :], 1)
    assert u2[0][0] == 2
    # persistence round-trip (host mirror is f32: codec retrains on load)
    blob = st.to_bytes()
    st2 = VectorStore(dtype="sq8")
    st2.from_bytes(blob)
    assert st2.n_valid == 602
    d3, u3, _ = st2.knn(db[2][None, :], 1)
    assert u3[0][0] == 2


def test_store_sq8_sharded_matches_single():
    from smqtk_indexing_tpu.parallel import make_mesh
    db, q = _data(n=1024, d=16, seed=5)
    st1 = VectorStore(dtype="sq8")
    st1.build(db, list(range(1024)))
    st8 = VectorStore(dtype="sq8", mesh=make_mesh(8))
    st8.build(db, list(range(1024)))
    d1, u1, _ = st1.knn(q, 8)
    d8, u8, _ = st8.knn(q, 8)
    np.testing.assert_allclose(d8, d1, atol=1e-5)
    assert u1 == u8


def test_factory_sq8_strings():
    from smqtk_indexing_tpu.models.nn_index.factory import (
        index_from_factory_string,
    )
    from smqtk_indexing_tpu.models.nn_index.flat import (
        FlatNearestNeighborsIndex,
    )
    idx = index_from_factory_string("SQ8")
    assert isinstance(idx, FlatNearestNeighborsIndex)
    assert idx.dtype == "sq8"
    idx = index_from_factory_string("IDMap,SQ8", metric="ip")
    assert idx.dtype == "sq8" and idx.metric == "inner_product"
    # PQ strings now route to the PQ codec (ops/pq.py).
    assert index_from_factory_string("IDMap,PQ16").dtype == "pq16"


def test_sq8_blocked_matches_rowmajor():
    """The segment-blocked single-copy layout must reproduce the
    row-major scan's results (interpret-mode Pallas stage 1)."""
    import jax.numpy as jnp

    from smqtk_indexing_tpu.ops import sq8

    rng = np.random.default_rng(3)
    n, d, b, k = 16384, 128, 8, 8
    mat = (rng.random((n, d), dtype=np.float32) * 10)
    a, bb = sq8.sq8_train(mat)
    codes = sq8.sq8_encode_np(mat, a, bb)
    q = (rng.random((b, d), dtype=np.float32) * 10)
    aj, bj = jnp.asarray(a), jnp.asarray(bb)
    cj = jnp.asarray(codes)
    s2, nrm = sq8.sq8_row_stats(cj, aj, bj)
    valid = np.ones(n, bool)
    valid[200:300] = False
    vj = jnp.asarray(valid)
    blk = jnp.asarray(np.ascontiguousarray(
        codes.reshape(n // 128, 128, d).transpose(0, 2, 1)))
    tiled = jnp.asarray(np.ascontiguousarray(
        codes.reshape(n // 4096, 4096, d).transpose(0, 2, 1)))
    for metric in ("euclidean", "inner_product"):
        d_ref, r_ref = sq8.sq8_topk(cj, aj, bj, s2, nrm, vj,
                                    jnp.asarray(q), k=k, metric=metric,
                                    chunk=4096)
        for layout in (blk, tiled):
            d_blk, r_blk = sq8.sq8_topk_blocked(layout, aj, bj, s2, vj,
                                                jnp.asarray(q), k=k,
                                                metric=metric,
                                                interpret=True)
            assert np.array_equal(np.asarray(r_blk),
                                  np.asarray(r_ref)), metric
            np.testing.assert_allclose(np.asarray(d_blk),
                                       np.asarray(d_ref),
                                       atol=1e-5, rtol=1e-6)
    import pytest
    with pytest.raises(ValueError, match="euclidean"):
        sq8.sq8_topk_blocked(blk, aj, bj, s2, vj, jnp.asarray(q), k=2,
                             metric="cosine", interpret=True)


def test_sq8_i8dot_matches_bf16_path():
    """The opt-in int8 x int8 stage-1 dot (i8dot=True) must reproduce the
    bf16 path's results through BOTH fused entry points: the query-side
    quantization error (~2^-8 relative, one global scale) only perturbs
    segment selection inside its k+16 margin, and stage 2 / exact
    re-rank rescore from the unscaled operands."""
    import jax.numpy as jnp

    from smqtk_indexing_tpu.ops import sq8

    rng = np.random.default_rng(7)
    n, d, b, k = 16384, 128, 8, 8
    mat = rng.standard_normal((n, d)).astype(np.float32)
    a, bb = sq8.sq8_train(mat)
    codes = sq8.sq8_encode_np(mat, a, bb)
    q = rng.standard_normal((b, d)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(bb)
    cj = jnp.asarray(codes)
    s2, nrm = sq8.sq8_row_stats(cj, aj, bj)
    valid = np.ones(n, bool)
    valid[50:150] = False            # dead-row +inf poison must survive
    vj = jnp.asarray(valid)
    qj = jnp.asarray(q)
    tiled = jnp.asarray(np.ascontiguousarray(
        codes.reshape(n // 4096, 4096, d).transpose(0, 2, 1)))
    blk = jnp.asarray(np.ascontiguousarray(
        codes.reshape(n // 128, 128, d).transpose(0, 2, 1)))
    ct = jnp.asarray(codes.T.copy())
    for metric in ("euclidean", "inner_product"):
        d_ref, r_ref = sq8.sq8_topk(cj, aj, bj, s2, nrm, vj, qj, k=k,
                                    metric=metric, chunk=4096)
        # Fused row-major mirror (sq8_topk codes_t branch).
        d_i8, r_i8 = sq8.sq8_topk(cj, aj, bj, s2, nrm, vj, qj, k=k,
                                  metric=metric, chunk=4096, codes_t=ct,
                                  interpret=True, i8dot=True)
        assert np.array_equal(np.asarray(r_i8), np.asarray(r_ref)), metric
        np.testing.assert_allclose(np.asarray(d_i8), np.asarray(d_ref),
                                   atol=1e-5, rtol=1e-6)
        # Single-copy layouts (sq8_topk_blocked, tiled + blocked).
        for layout in (tiled, blk):
            d_b, r_b = sq8.sq8_topk_blocked(layout, aj, bj, s2, vj, qj,
                                            k=k, metric=metric,
                                            interpret=True, i8dot=True)
            assert np.array_equal(np.asarray(r_b),
                                  np.asarray(r_ref)), metric
            np.testing.assert_allclose(np.asarray(d_b),
                                       np.asarray(d_ref),
                                       atol=1e-5, rtol=1e-6)
    # No dead row may surface.
    assert not (set(np.asarray(r_i8).ravel().tolist())
                & set(range(50, 150)))
