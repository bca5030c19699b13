"""MRPT leaf-mirror DMA path (interpret mode on CPU) vs the exact
candidate-gather path: identical candidate sets, selection within SQ8
codec noise, exact reported distances."""
import numpy as np

import jax.numpy as jnp

from smqtk_indexing_tpu.ops import sq8 as sq8_ops
from smqtk_indexing_tpu.ops.mrpt import (
    build_trees, mrpt_query, mrpt_query_mirror, project_all,
)


def _build(n=2048, d=64, t_count=4, depth=3, seed=0, clustered=True):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.normal(size=(32, d)).astype(np.float32) * 4.0
        mat = (centers[rng.integers(0, 32, n)]
               + rng.normal(size=(n, d)).astype(np.float32) * 0.3)
    else:
        mat = rng.normal(size=(n, d)).astype(np.float32)
    d_pad = 128
    mat_p = np.zeros((n, d_pad), np.float32)
    mat_p[:, :d] = mat
    bases = np.zeros((t_count, d_pad, depth), np.float32)
    bases[:, :d, :] = rng.standard_normal((t_count, d, depth)) \
        .astype(np.float32)
    projs = np.asarray(project_all(jnp.asarray(mat_p),
                                   jnp.asarray(bases)))
    splits, leaf_table, offsets = build_trees(projs, depth)
    leaf_max = int(np.diff(offsets).max())

    a, b = sq8_ops.sq8_train(mat_p)
    codes = sq8_ops.sq8_encode_np(mat_p, a, b)
    leaf_flat = leaf_table.reshape(-1).astype(np.int32)
    mirror = codes[leaf_flat]

    sq = np.einsum("ij,ij->i", mat_p, mat_p).astype(np.float32)
    valid = np.ones(n, bool)
    return (mat_p, sq, valid, bases, splits, leaf_table, leaf_flat,
            offsets, leaf_max, mirror, a, b)


def test_mirror_matches_exact_path_on_separated_data():
    (mat_p, sq, valid, bases, splits, leaf_table, leaf_flat, offsets,
     leaf_max, mirror, a, b) = _build()
    rng = np.random.default_rng(1)
    q = mat_p[rng.integers(0, mat_p.shape[0], 8)] \
        + rng.normal(size=(8, 128)).astype(np.float32) * 0.05
    k = 8
    d_e, r_e = mrpt_query(
        jnp.asarray(mat_p), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(bases), jnp.asarray(splits), jnp.asarray(leaf_table),
        jnp.asarray(offsets), jnp.asarray(q), k=k, depth=3,
        leaf_max=leaf_max)
    d_m, r_m = mrpt_query_mirror(
        jnp.asarray(mat_p), jnp.asarray(sq), jnp.asarray(bases),
        jnp.asarray(splits), jnp.asarray(mirror), jnp.asarray(a),
        jnp.asarray(b), jnp.asarray(leaf_flat), jnp.asarray(offsets),
        jnp.asarray(q), k=k, depth=3, leaf_max=leaf_max, interpret=True)
    # Well-separated clusters: selection agrees exactly; distances are
    # both exact f32 re-ranks of the same rows.
    assert np.array_equal(np.asarray(r_m), np.asarray(r_e))
    np.testing.assert_allclose(np.asarray(d_m), np.asarray(d_e),
                               rtol=1e-6, atol=1e-6)


def test_mirror_recall_on_gaussian_data():
    # Dense gaussian data: the SQ8 selection may flip near-ties at the
    # rank-k boundary; recall vs the exact path stays near 1 and every
    # reported distance is the true distance of its row.
    (mat_p, sq, valid, bases, splits, leaf_table, leaf_flat, offsets,
     leaf_max, mirror, a, b) = _build(clustered=False, seed=5)
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 128)).astype(np.float32)
    q[:, 64:] = 0
    k = 8
    d_e, r_e = mrpt_query(
        jnp.asarray(mat_p), jnp.asarray(sq), jnp.asarray(valid),
        jnp.asarray(bases), jnp.asarray(splits), jnp.asarray(leaf_table),
        jnp.asarray(offsets), jnp.asarray(q), k=k, depth=3,
        leaf_max=leaf_max)
    d_m, r_m = mrpt_query_mirror(
        jnp.asarray(mat_p), jnp.asarray(sq), jnp.asarray(bases),
        jnp.asarray(splits), jnp.asarray(mirror), jnp.asarray(a),
        jnp.asarray(b), jnp.asarray(leaf_flat), jnp.asarray(offsets),
        jnp.asarray(q), k=k, depth=3, leaf_max=leaf_max, interpret=True)
    r_e, r_m = np.asarray(r_e), np.asarray(r_m)
    recall = np.mean([len(set(r_m[i]) & set(r_e[i])) / k
                      for i in range(8)])
    assert recall >= 0.95, recall
    # Reported distances are exact for the rows actually returned.
    for i in range(8):
        for j in range(k):
            if r_m[i, j] >= 0:
                ref = np.sqrt(((mat_p[r_m[i, j]].astype(np.float64)
                                - q[i]) ** 2).sum())
                assert abs(float(np.asarray(d_m)[i, j]) - ref) < 1e-3


def test_mirror_no_duplicate_rows():
    (mat_p, sq, valid, bases, splits, leaf_table, leaf_flat, offsets,
     leaf_max, mirror, a, b) = _build(t_count=6, seed=9)
    rng = np.random.default_rng(3)
    q = mat_p[rng.integers(0, mat_p.shape[0], 8)]
    d_m, r_m = mrpt_query_mirror(
        jnp.asarray(mat_p), jnp.asarray(sq), jnp.asarray(bases),
        jnp.asarray(splits), jnp.asarray(mirror), jnp.asarray(a),
        jnp.asarray(b), jnp.asarray(leaf_flat), jnp.asarray(offsets),
        jnp.asarray(q), k=16, depth=3, leaf_max=leaf_max, interpret=True)
    r_m = np.asarray(r_m)
    for row in r_m:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
