"""Device-side batched metrics (ops/metrics.py) vs host references."""
import numpy as np

import jax.numpy as jnp

from smqtk_indexing_tpu.ops import metrics as dm
from smqtk_indexing_tpu.utils import metrics as hm


def _data(seed=0, b=4, n=16, d=8, positive=False):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, d)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    if positive:
        q, x = np.abs(q), np.abs(x)
    return q, x


def test_euclidean_many():
    q, x = _data()
    got = np.asarray(dm.euclidean_distance_many(jnp.asarray(q),
                                                jnp.asarray(x)))
    for i in range(q.shape[0]):
        ref = np.array([hm.euclidean_distance(q[i], x[j])
                        for j in range(x.shape[0])])
        np.testing.assert_allclose(got[i], ref, atol=1e-4)


def test_cosine_many():
    q, x = _data(1)
    got = np.asarray(dm.cosine_distance_many(jnp.asarray(q),
                                             jnp.asarray(x)))
    for i in range(q.shape[0]):
        ref = hm.cosine_distance(q[i], x)
        np.testing.assert_allclose(got[i], ref, atol=1e-4)


def test_hik_many():
    q, x = _data(2, positive=True)
    got = np.asarray(dm.hik_distance_many(jnp.asarray(q), jnp.asarray(x)))
    for i in range(q.shape[0]):
        ref = hm.histogram_intersection_distance(
            np.tile(q[i], (x.shape[0], 1)), x)
        np.testing.assert_allclose(got[i], ref, atol=1e-4)


def test_inner_product_many():
    q, x = _data(3)
    got = np.asarray(dm.inner_product_many(jnp.asarray(q), jnp.asarray(x)))
    np.testing.assert_allclose(got, q @ x.T, atol=1e-4)
