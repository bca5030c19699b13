"""
Device-side (jax.numpy) batched distance metrics, semantics matching the host
versions in ``smqtk_indexing_tpu.utils.metrics`` (and therefore
/root/reference/smqtk_indexing/utils/metrics.py).
"""
import math

import jax
import jax.numpy as jnp


def euclidean_distance_many(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B, d) queries vs (N, d) points -> (B, N) Euclidean distances."""
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    x_sq = jnp.sum(x * x, axis=-1)
    ip = jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(q_sq + x_sq[None, :] - 2.0 * ip, 0.0)
    return jnp.sqrt(d2)


def cosine_distance_many(q: jnp.ndarray, x: jnp.ndarray,
                         pos_vectors: bool = True) -> jnp.ndarray:
    """(B, d) vs (N, d) -> (B, N) angular distances in [0, 1]."""
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    xn = jnp.linalg.norm(x, axis=-1)
    denom = jnp.where(qn * xn[None, :] == 0, 1.0, qn * xn[None, :])
    sim = jnp.clip(
        jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / denom,
        -1.0, 1.0)
    return (1 + bool(pos_vectors)) * jnp.arccos(sim) / math.pi


def hik_distance_many(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B, d) vs (N, d) -> (B, N) histogram intersection distances."""
    return 1.0 - jnp.sum(
        jnp.minimum(q[:, None, :], x[None, :, :]), axis=-1)


def inner_product_many(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B, d) vs (N, d) -> (B, N) inner products."""
    return jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)


def candidate_distances(q: jnp.ndarray, cand: jnp.ndarray,
                        metric: str) -> jnp.ndarray:
    """
    Per-query candidate distances: (B, d) queries vs per-query (B, M, d)
    candidate rows -> (B, M). Same math as the reference's re-rank metrics
    (/root/reference/smqtk_indexing/impls/nn_index/lsh.py:507-518); the
    elementwise form (no matmul) keeps results bit-identical whether the M
    axis is whole or sharded across a mesh.
    """
    qb = q[:, None, :].astype(jnp.float32)
    cand = cand.astype(jnp.float32)
    if metric == "euclidean":
        diff = cand - qb
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if metric == "cosine":
        qn = jnp.linalg.norm(qb, axis=-1)
        cn = jnp.linalg.norm(cand, axis=-1)
        denom = jnp.where(qn * cn == 0, 1.0, qn * cn)
        sim = jnp.clip(jnp.sum(cand * qb, axis=-1) / denom, -1.0, 1.0)
        return 2.0 * jnp.arccos(sim) / math.pi
    if metric == "hik":
        return 1.0 - jnp.sum(jnp.minimum(qb, cand), axis=-1)
    raise ValueError(f"Unknown distance method '{metric}'.")
