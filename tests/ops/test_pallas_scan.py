"""
Pallas fused scan kernel tests (interpret mode on CPU; the real-TPU path is
exercised by bench.py and the verify drives).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from smqtk_indexing_tpu.ops.pallas_scan import TILE_N, flat_topk_fused

MIN_N = TILE_N  # smallest db the fused kernel accepts
from smqtk_indexing_tpu.ops.scan import flat_topk


def _mk(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.normal(size=(n, d)).astype(np.float32) * 3
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    return db, sq, q


def test_fused_matches_reference_scan():
    n, d, b, k = 2 * MIN_N, 128, 8, 10
    db, sq, q = _mk(n, d, b)
    valid = np.ones(n, dtype=bool)
    d_ref, r_ref = flat_topk(jnp.asarray(db), jnp.asarray(sq),
                             jnp.asarray(np.sqrt(sq)), jnp.asarray(valid),
                             jnp.asarray(q), k=k)
    d_fused, r_fused = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q), k=k, interpret=True)
    assert np.array_equal(np.asarray(r_fused), np.asarray(r_ref))
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                               atol=1e-4)


def test_fused_exact_vs_numpy_float64():
    n, d, b, k = MIN_N, 64, 8, 5
    db, sq, q = _mk(n, d, b, seed=1)
    valid = np.ones(n, dtype=bool)
    d_fused, r_fused = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q), k=k, interpret=True)
    d2 = ((q.astype(np.float64)[:, None, :]
           - db.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    ref_rows = np.argsort(d2, axis=1)[:, :k]
    assert np.array_equal(np.asarray(r_fused), ref_rows)


def test_fused_respects_valid_mask():
    n, d, b = MIN_N, 64, 8
    db, sq, q = _mk(n, d, b, seed=2)
    valid = np.zeros(n, dtype=bool)
    valid[37] = True
    q2 = np.vstack([db[37] + 0.001] + [q[1:]]).astype(np.float32)
    d_fused, r_fused = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q2), k=4, interpret=True)
    r = np.asarray(r_fused)
    assert np.all(r[:, 0] == 37)
    assert np.all(r[:, 1:] == -1)
    assert np.all(np.isinf(np.asarray(d_fused)[:, 1:]))


def test_fused_duplicate_heavy_data():
    # Many identical rows: distances must still be valid (ties arbitrary).
    n, d, b, k = MIN_N, 32, 8, 8
    db = np.tile(np.arange(32, dtype=np.float32), (n, 1))
    db[100] += 0.5
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    q = db[:b].copy()
    d_fused, r_fused = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(np.ones(n, bool)),
        jnp.asarray(q), k=k, interpret=True)
    assert np.allclose(np.asarray(d_fused)[1:, :], 0.0, atol=1e-5)


def test_fused_inner_product_matches_reference():
    n, d, b, k = MIN_N, 64, 8, 6
    db, sq, q = _mk(n, d, b, seed=4)
    valid = np.ones(n, dtype=bool)
    d_ref, r_ref = flat_topk(jnp.asarray(db), jnp.asarray(sq),
                             jnp.asarray(np.sqrt(sq)), jnp.asarray(valid),
                             jnp.asarray(q), k=k, metric="inner_product")
    d_f, r_f = flat_topk_fused(jnp.asarray(db), jnp.asarray(sq),
                               jnp.asarray(valid), jnp.asarray(q), k=k,
                               metric="inner_product", interpret=True)
    assert np.array_equal(np.asarray(r_f), np.asarray(r_ref))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               atol=1e-4)


def test_fused_cosine_matches_reference():
    n, d, b, k = MIN_N, 64, 8, 6
    db, sq, q = _mk(n, d, b, seed=5)
    valid = np.ones(n, dtype=bool)
    norm = np.sqrt(sq)
    d_ref, r_ref = flat_topk(jnp.asarray(db), jnp.asarray(sq),
                             jnp.asarray(norm), jnp.asarray(valid),
                             jnp.asarray(q), k=k, metric="cosine")
    db_n_t = (db / np.where(norm[:, None] == 0, 1.0, norm[:, None])).T
    d_f, r_f = flat_topk_fused(jnp.asarray(db), jnp.asarray(sq),
                               jnp.asarray(valid), jnp.asarray(q), k=k,
                               metric="cosine",
                               db_t=jnp.asarray(np.ascontiguousarray(db_n_t)),
                               db_norm=jnp.asarray(norm), interpret=True)
    assert np.array_equal(np.asarray(r_f), np.asarray(r_ref))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               atol=1e-4)


def test_topk_smallest_matches_lax_topk():
    from smqtk_indexing_tpu.ops.pallas_scan import topk_smallest
    rng = np.random.default_rng(7)
    m = rng.normal(size=(16, 1024)).astype(np.float32)
    # inject inf padding and duplicate values (tie handling)
    m[:, 100:110] = np.inf
    m[:, 3] = m[:, 5]
    for kk in (1, 8, 24, 60):
        v, i = topk_smallest(jnp.asarray(m), kk)
        neg, idx = jnp.sort(jnp.asarray(m), axis=1)[:, :kk], None
        np.testing.assert_allclose(np.asarray(v), np.asarray(neg), rtol=0)
        # indices must address the returned values
        got = np.take_along_axis(m, np.asarray(i), axis=1)
        np.testing.assert_allclose(got, np.asarray(v), rtol=0)


@pytest.mark.parametrize("precision", ["split3", "highest", "native"])
def test_fused_precision_modes(precision):
    n, d, b, k = MIN_N, 64, 8, 5
    db, sq, q = _mk(n, d, b, seed=3)
    valid = np.ones(n, dtype=bool)
    d_f, r_f = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q), k=k, interpret=True, precision=precision)
    d2 = ((q.astype(np.float64)[:, None, :]
           - db.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    ref_rows = np.argsort(d2, axis=1)[:, :k]
    assert np.array_equal(np.asarray(r_f), ref_rows), precision


@pytest.mark.parametrize("metric", ["euclidean", "inner_product", "cosine"])
def test_fused_bf16_stage2_matches_f32(metric):
    from smqtk_indexing_tpu.ops.pallas_scan import SEG
    n, d, b, k = 2 * MIN_N, 128, 8, 10
    db, sq, q = _mk(n, d, b, seed=4)
    valid = np.ones(n, dtype=bool)
    valid[50:200] = False
    norm = np.sqrt(sq)
    kw = {}
    if metric == "cosine":
        db_t = (db / np.where(norm == 0, 1, norm)[:, None]).T
        kw = dict(db_t=jnp.asarray(np.ascontiguousarray(db_t)),
                  db_norm=jnp.asarray(norm))
    d_ref, r_ref = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q), k=k, metric=metric, interpret=True, **kw)
    seg_lo = jnp.asarray(db.reshape(n // SEG, SEG, d), dtype=jnp.bfloat16)
    d_lo, r_lo = flat_topk_fused(
        jnp.asarray(db), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(q), k=k, metric=metric, interpret=True,
        db_seg_lo=seg_lo, **kw)
    assert np.array_equal(np.asarray(r_lo), np.asarray(r_ref)), metric
    # rtol absorbs one-ulp f32 reduction-order differences between the
    # two exact re-rank paths on real hardware (raw IP magnitudes are
    # O(300) here, so the default rtol=1e-7 was a sub-ulp demand).
    np.testing.assert_allclose(np.asarray(d_lo), np.asarray(d_ref),
                               atol=1e-5, rtol=1e-6)


def test_blocked_stage1_matches_flat(tmp_path):
    """segment_minima_blocked over the (nseg, d, SEG) layout must emit
    the same minima as segment_minima over the (d, N) mirror."""
    from smqtk_indexing_tpu.ops.pallas_scan import (
        SEG, segment_minima, segment_minima_blocked,
    )
    rng = np.random.default_rng(11)
    n, d, b = 4 * MIN_N, 128, 16    # nseg = 128 = one full lane tile
    db = rng.normal(size=(n, d)).astype(np.float32) * 3
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    pen = np.zeros(n, np.float32)
    pen[50:200] = np.inf

    ref = segment_minima(jnp.asarray(np.ascontiguousarray(db.T)),
                         jnp.asarray(sq.reshape(1, n)),
                         jnp.asarray(pen.reshape(1, n)),
                         jnp.asarray(q), interpret=True,
                         precision="highest")
    blk = np.ascontiguousarray(
        db.reshape(n // SEG, SEG, d).transpose(0, 2, 1))
    got = segment_minima_blocked(
        jnp.asarray(blk), jnp.asarray(sq.reshape(n // SEG, SEG)),
        jnp.asarray(pen.reshape(n // SEG, SEG)), jnp.asarray(q),
        interpret=True)
    assert got.shape == ref.shape
    # f32 through the blocked kernel runs the RAW MXU dot (bf16-truncated
    # on real hardware; the kernel targets int8 capacity tiers where the
    # cast is exact) — rtol covers the ~2^-8 stage-1 rounding vs the
    # HIGHEST reference. The int8 comparison below is exact.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=5e-3)

    # int8 codes: exact agreement with the int8 flat mirror.
    codes = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    csq = (codes.astype(np.float32) ** 2).sum(1)
    ref8 = segment_minima(jnp.asarray(np.ascontiguousarray(codes.T)),
                          jnp.asarray(csq.reshape(1, n)),
                          jnp.asarray(pen.reshape(1, n)),
                          jnp.asarray(q), interpret=True)
    blk8 = np.ascontiguousarray(
        codes.reshape(n // SEG, SEG, d).transpose(0, 2, 1))
    got8 = segment_minima_blocked(
        jnp.asarray(blk8), jnp.asarray(csq.reshape(n // SEG, SEG)),
        jnp.asarray(pen.reshape(n // SEG, SEG)), jnp.asarray(q),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                               atol=1e-2, rtol=1e-5)


def test_seg_gather_prefetch_matches_barrier_and_numpy(monkeypatch):
    """The double-buffered gather returns exactly the blocks of the
    per-step-barrier kernel and of a numpy oracle, across dtypes and at
    a grid length that exercises both scratch slots (odd step count,
    first/last-step edges)."""
    from smqtk_indexing_tpu.ops.pallas_scan import SEG, seg_gather_tiled

    rng = np.random.default_rng(7)
    n_tiles, d, tile_n = 3, 64, 4 * SEG
    b, s_keep = 12, 8          # total=96 -> grp 32, 3 grid steps (odd)
    nseg = n_tiles * tile_n // SEG
    sid = rng.integers(0, nseg, size=(b, s_keep)).astype(np.int32)

    for dtype in (np.int8, np.float32):
        if dtype is np.int8:
            db3 = rng.integers(-127, 128,
                               size=(n_tiles, d, tile_n)).astype(dtype)
        else:
            db3 = rng.normal(size=(n_tiles, d, tile_n)).astype(dtype)

        monkeypatch.delenv("SMQTK_TPU_NO_GATHER_PREFETCH", raising=False)
        got = np.asarray(seg_gather_tiled(
            jnp.asarray(db3), jnp.asarray(sid), interpret=True))

        monkeypatch.setenv("SMQTK_TPU_NO_GATHER_PREFETCH", "1")
        ref = np.asarray(seg_gather_tiled(
            jnp.asarray(db3), jnp.asarray(sid), interpret=True))
        monkeypatch.delenv("SMQTK_TPU_NO_GATHER_PREFETCH", raising=False)

        # Numpy oracle: block s of query q is the (d, SEG) column slice
        # of tile sid//nseg_t starting at (sid%nseg_t)*SEG.
        nseg_t = tile_n // SEG
        oracle = np.empty((b, s_keep, d, SEG), dtype=dtype)
        for qi in range(b):
            for si in range(s_keep):
                t = sid[qi, si] // nseg_t
                c0 = (sid[qi, si] % nseg_t) * SEG
                oracle[qi, si] = db3[t, :, c0:c0 + SEG]
        assert np.array_equal(got, ref)
        assert np.array_equal(got, oracle)


def test_pad_to_k_contract():
    # ops/scan.pad_to_k is the ONE (B, k) epilogue shared by the tiled
    # score-mode finisher, exact_rerank_decoded, and both sharded
    # per-shard merges — pin both legs: truncate when the candidate
    # width exceeds k, +inf/-1 pad when a budget capped it below k.
    from smqtk_indexing_tpu.ops.scan import pad_to_k

    d = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    r = jnp.asarray(np.arange(12, dtype=np.int32).reshape(3, 4))

    # truncate leg: kk=4 > k=2
    dt, rt = pad_to_k(d, r, 2)
    assert dt.shape == (3, 2) and rt.shape == (3, 2)
    assert np.array_equal(np.asarray(dt), np.asarray(d)[:, :2])
    assert np.array_equal(np.asarray(rt), np.asarray(r)[:, :2])

    # pad leg: kk=4 < k=7 -> +inf dists, -1 rows, dtype preserved
    dp, rp = pad_to_k(d.astype(jnp.bfloat16), r, 7)
    assert dp.shape == (3, 7) and rp.shape == (3, 7)
    assert dp.dtype == jnp.bfloat16 and rp.dtype == jnp.int32
    assert np.all(np.isinf(np.asarray(dp, dtype=np.float32)[:, 4:]))
    assert np.all(np.asarray(rp)[:, 4:] == -1)

    # identity leg: kk == k returns the same content
    di, ri = pad_to_k(d, r, 4)
    assert np.array_equal(np.asarray(di), np.asarray(d))
    assert np.array_equal(np.asarray(ri), np.asarray(r))
