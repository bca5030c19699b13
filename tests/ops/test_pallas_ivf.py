"""Pallas DMA IVF list-scan tests (interpret mode on CPU) against the XLA
list-scan kernel."""
import numpy as np
import pytest

import jax.numpy as jnp

from smqtk_indexing_tpu.ops.ivf import ivf_query
from smqtk_indexing_tpu.ops.pallas_ivf import L_MAX, ivf_query_dma


def _layout(n, d, c, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.normal(size=(n, d)).astype(np.float32) * 3
    assigns = rng.integers(0, c, size=n)
    order = np.argsort(assigns, kind="stable")
    db = db[order]
    lens = np.bincount(assigns, minlength=c).astype(np.int32)
    offsets = np.zeros(c, dtype=np.int32)
    offsets[1:] = np.cumsum(lens)[:-1]
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    cents = np.stack([
        db[offsets[i]:offsets[i] + max(int(lens[i]), 1)].mean(0)
        for i in range(c)]).astype(np.float32)
    return db, sq, cents, offsets, lens


def test_dma_matches_xla_kernel():
    n, d, c, k, b = 2048, 128, 8, 8, 8
    db, sq, cents, offsets, lens = _layout(n, d, c)
    assert lens.max() <= L_MAX
    rng = np.random.default_rng(1)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    valid = np.ones(n, dtype=bool)

    d_x, r_x = ivf_query(jnp.asarray(db), jnp.asarray(sq),
                         jnp.asarray(np.sqrt(sq)), jnp.asarray(valid),
                         jnp.asarray(cents), jnp.asarray(offsets),
                         jnp.asarray(lens), jnp.asarray(q), k=k, nprobe=c,
                         l_max=int(lens.max()))
    d_p, r_p = ivf_query_dma(jnp.asarray(db),
                             jnp.asarray(valid), jnp.asarray(cents),
                             jnp.asarray(offsets), jnp.asarray(lens),
                             jnp.asarray(q), k=k, n_probe=c,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-4)
    assert np.array_equal(np.asarray(r_p), np.asarray(r_x))


def test_dma_respects_valid_mask_and_end_clamp():
    # The last list sits at the end of the array: the clamped DMA window
    # must still score exactly its rows.
    n, d, c, b = 1024, 64, 4, 8
    db, sq, cents, offsets, lens = _layout(n, d, c, seed=2)
    rng = np.random.default_rng(3)
    valid = np.ones(n, dtype=bool)
    valid[7] = False
    q = np.vstack([db[7] + 0.001] + list(
        rng.normal(size=(b - 1, d)).astype(np.float32)))

    d_p, r_p = ivf_query_dma(jnp.asarray(db),
                             jnp.asarray(valid), jnp.asarray(cents),
                             jnp.asarray(offsets), jnp.asarray(lens),
                             jnp.asarray(q), k=4, n_probe=c,
                             interpret=True)
    r = np.asarray(r_p)
    assert not np.any(r == 7)  # masked row never returned
    # Exactness vs brute force over valid rows (full probe).
    d2 = ((q[:1].astype(np.float64) - db.astype(np.float64)) ** 2).sum(1)
    d2[7] = np.inf
    assert int(r[0, 0]) == int(np.argmin(d2))


def test_dma_bf16_database():
    n, d, c, k, b = 2048, 128, 8, 8, 8
    db, sq, cents, offsets, lens = _layout(n, d, c, seed=5)
    rng = np.random.default_rng(6)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    valid = np.ones(n, dtype=bool)
    db16 = jnp.asarray(db, dtype=jnp.bfloat16)
    d_p, r_p = ivf_query_dma(db16, jnp.asarray(valid),
                             jnp.asarray(cents), jnp.asarray(offsets),
                             jnp.asarray(lens), jnp.asarray(q), k=k,
                             n_probe=c, interpret=True)
    # Exact reference on the QUANTIZED (bf16) data.
    dbq = np.asarray(db16.astype(jnp.float32))
    d2 = ((q[:, None, :].astype(np.float64)
           - dbq[None, :, :].astype(np.float64)) ** 2).sum(-1)
    ref_rows = np.argsort(d2, axis=1)[:, :k]
    assert np.array_equal(np.asarray(r_p), ref_rows)


def test_dma_sq8_codes():
    # int8 SQ8 codes through the DMA kernel (1 byte/dim transfers): rows
    # must match the XLA sq8 list-scan and distances must be exact
    # w.r.t. the dequantized (quantized-vector) database.
    from smqtk_indexing_tpu.ops import sq8 as sq8_ops

    n, d, c, k, b = 2048, 128, 8, 8, 8
    db, sq, cents, offsets, lens = _layout(n, d, c, seed=9)
    rng = np.random.default_rng(10)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    valid = np.ones(n, dtype=bool)

    a, bb = sq8_ops.sq8_train(db)
    codes = sq8_ops.sq8_encode_np(db, a, bb)
    a_dev, b_dev = jnp.asarray(a), jnp.asarray(bb)
    codes_dev = jnp.asarray(codes)
    s2, nrm = sq8_ops.sq8_row_stats(codes_dev, a_dev, b_dev)

    d_x, r_x = ivf_query(codes_dev, nrm * nrm, nrm, jnp.asarray(valid),
                         jnp.asarray(cents), jnp.asarray(offsets),
                         jnp.asarray(lens), jnp.asarray(q), k=k, nprobe=c,
                         l_max=int(lens.max()), dq=(a_dev, b_dev))
    d_p, r_p = ivf_query_dma(codes_dev, jnp.asarray(valid),
                             jnp.asarray(cents), jnp.asarray(offsets),
                             jnp.asarray(lens), jnp.asarray(q), k=k,
                             n_probe=c, interpret=True,
                             dq=(a_dev, b_dev))
    assert np.array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-5, atol=1e-4)
    # Exact reference over the dequantized rows (float64 brute force).
    dbq = codes.astype(np.float64) * a + bb
    d2 = np.sqrt(((q[:, None, :].astype(np.float64)
                   - dbq[None, :, :]) ** 2).sum(-1))
    ref_rows = np.argsort(d2, axis=1)[:, :k]
    assert np.array_equal(np.asarray(r_p), ref_rows)
    np.testing.assert_allclose(
        np.asarray(d_p), np.take_along_axis(d2, ref_rows, axis=1),
        rtol=1e-4, atol=1e-4)


def test_dma_sq8_faithful_nprobe_and_dead_rows():
    # SQ8 DMA path under the FAISS-faithful nprobe translation + removals.
    from smqtk_indexing_tpu.ops import sq8 as sq8_ops

    n, d, c, k, b = 2048, 64, 8, 4, 8
    db, sq, cents, offsets, lens = _layout(n, d, c, seed=11)
    rng = np.random.default_rng(12)
    q = rng.normal(size=(b, d)).astype(np.float32) * 3
    valid = np.ones(n, dtype=bool)
    valid[13] = False

    a, bb = sq8_ops.sq8_train(db)
    codes = sq8_ops.sq8_encode_np(db, a, bb)
    a_dev, b_dev = jnp.asarray(a), jnp.asarray(bb)
    codes_dev = jnp.asarray(codes)
    s2, nrm = sq8_ops.sq8_row_stats(codes_dev, a_dev, b_dev)
    first_virt = np.arange(c, dtype=np.int32)   # 1 sublist per original

    kw = dict(k=k, first_virt=jnp.asarray(first_virt), nprobe_orig=3,
              has_dead=True)
    d_x, r_x = ivf_query(codes_dev, nrm * nrm, nrm, jnp.asarray(valid),
                         jnp.asarray(cents), jnp.asarray(offsets),
                         jnp.asarray(lens), jnp.asarray(q), nprobe=c,
                         l_max=int(lens.max()), dq=(a_dev, b_dev), **kw)
    d_p, r_p = ivf_query_dma(codes_dev, jnp.asarray(valid),
                             jnp.asarray(cents), jnp.asarray(offsets),
                             jnp.asarray(lens), jnp.asarray(q),
                             n_probe=c, interpret=True,
                             dq=(a_dev, b_dev), **kw)
    assert np.array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-5, atol=1e-4)
    assert not np.any(np.asarray(r_p) == 13)
