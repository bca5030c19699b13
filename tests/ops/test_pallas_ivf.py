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
    d_p, r_p = ivf_query_dma(jnp.asarray(db), jnp.asarray(sq),
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

    d_p, r_p = ivf_query_dma(jnp.asarray(db), jnp.asarray(sq),
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
    d_p, r_p = ivf_query_dma(db16, jnp.asarray(sq), jnp.asarray(valid),
                             jnp.asarray(cents), jnp.asarray(offsets),
                             jnp.asarray(lens), jnp.asarray(q), k=k,
                             n_probe=c, interpret=True)
    # Exact reference on the QUANTIZED (bf16) data.
    dbq = np.asarray(db16.astype(jnp.float32))
    d2 = ((q[:, None, :].astype(np.float64)
           - dbq[None, :, :].astype(np.float64)) ** 2).sum(-1)
    ref_rows = np.argsort(d2, axis=1)[:, :k]
    assert np.array_equal(np.asarray(r_p), ref_rows)
