"""
Pallas fused exhaustive-scan kernel (TPU).

The XLA streaming scan (ops/scan.flat_topk) materializes each (B, chunk)
score block in HBM and runs ``lax.top_k`` over it — at large batch the
score-block traffic and the top-k sort dominate (measured on v5e). This
kernel keeps everything on-chip:

  HBM -> VMEM: database tiles stream once (the only large traffic);
  MXU:         q @ tile^T score block, never leaving VMEM;
  VPU:         per-128-row segment minima + a running top-S merge held in
               VMEM scratch across grid steps.

Output is the per-query top-S (segment minima, segment ids) — S = 2k —
from which the caller gathers only S*128 rows per query and exact-re-ranks
(stage 2, plain XLA). Exactness of the segment pre-selection: every row of
the true top-k has score <= theta (the kth best), so its segment's minimum
is <= theta; at most k distinct segment minima can be <= theta (each
minimum is itself a score), so the top-2k segments by minimum contain every
true top-k row with slack for ties.

Used automatically by ops/scan-level callers on TPU via ``flat_topk_fused``;
falls back to interpret mode off-TPU (tests).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Database rows per grid step (VMEM tile).
TILE_N = 4096
#: Query rows per grid step.
TILE_B = 512
#: Segment width (rows collapsing to one output element).
SEG = 128
#: Per-tile segment count (the kernel's full-block output width).
NSEG = TILE_N // SEG


def _scan_kernel(q_ref, db_ref, sq_ref, pen_ref, out_ref, *, precision):
    """One grid step: score a (d, TILE_N) tile against a (TILE_B, d) query
    tile on the MXU and emit the per-128-row segment minima — the
    (TILE_B, TILE_N) score block lives only in VMEM. Any per-tile
    sequential selection here would serialize the VPU (measured: a running
    replace-max merge costs more than it saves); the (B, N/128) minima
    matrix is 128x smaller than the scores, so the host-program top-k over
    it is cheap."""
    b = q_ref.shape[1]

    # The tile arrives pre-transposed (d, TILE_N) so the contraction is in
    # canonical MXU form (lhs (B, d) x rhs (d, TILE_N)); contracting the
    # rhs on its trailing dim instead forces a non-MXU elementwise
    # expansion of shape (B, TILE_N, d) that blows VMEM.
    ip = jax.lax.dot_general(
        q_ref[0], db_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # L2 surrogate (||q||^2 constant omitted); +inf penalty masks dead
    # rows. sq/pen arrive as (1, TILE_N) row vectors — an in-kernel
    # (TILE_N, 1) -> (1, TILE_N) reshape is a cross-lane transpose that
    # Mosaic expands catastrophically (~66MB of scoped VMEM).
    scores = sq_ref[:] - 2.0 * ip + pen_ref[:]
    # Full-block (1, tile_b, NSEG) store: partial-width stores at offsets
    # that are not lane-aligned are rejected by Mosaic.
    out_ref[:] = jnp.min(scores.reshape(b, NSEG, SEG), axis=-1) \
        .reshape(1, b, NSEG)


@partial(jax.jit, static_argnames=("interpret", "use_highest"))
def segment_minima(db_t: jnp.ndarray, db_sq: jnp.ndarray,
                   penalty: jnp.ndarray, q: jnp.ndarray, *,
                   interpret: bool = False, use_highest: bool = True
                   ) -> jnp.ndarray:
    """
    Stage 1: fused scan emitting per-query, per-128-row-segment L2-surrogate
    minima.

    :param db_t: (d, N) TRANSPOSED database (canonical MXU rhs layout),
        N % TILE_N == 0, d % 128 == 0.
    :param db_sq: (1, N) float32 squared norms (row-vector layout).
    :param penalty: (1, N) float32, 0 for live rows / +inf for dead ones.
    :param q: (B, d) float32 queries (B a multiple of TILE_B, or TILE_B
        divisible by B with B a multiple of 8 — callers pad).
    :return: (B, N // 128) float32 segment minima.
    """
    d, n = db_t.shape
    b = q.shape[0]
    assert n % TILE_N == 0
    tile_b = min(TILE_B, b)
    assert b % tile_b == 0
    n_tiles = n // TILE_N
    grid = (b // tile_b, n_tiles)
    # bf16 operands are exact on the MXU and Mosaic rejects HIGHEST for
    # them ("Bad lhs type"); HIGHEST only matters for f32 inputs.
    precision = jax.lax.Precision.HIGHEST \
        if (use_highest and db_t.dtype != jnp.bfloat16) else None

    # Queries ship as (q_tiles, tile_b, d) so each q block is a leading
    # full slice (cheap reshape, no relayout).
    q3 = (q.astype(db_t.dtype) if db_t.dtype == jnp.bfloat16 else q) \
        .reshape(b // tile_b, tile_b, d)

    kernel = partial(_scan_kernel, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),          # q tile
            pl.BlockSpec((d, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # db tile (d, T)
            pl.BlockSpec((1, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # sq tile
            pl.BlockSpec((1, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # penalty tile
        ],
        # 3D output, one full block per (q-tile, db-tile): Mosaic requires
        # stores be full-block or lane-aligned; (n_tiles, B, NSEG) makes
        # every store a full block.
        out_specs=pl.BlockSpec(
            (1, tile_b, NSEG),
            lambda qi, ni: (ni, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b, NSEG), jnp.float32),
        interpret=interpret,
    )(q3, db_t, db_sq, penalty)
    # (n_tiles, B, NSEG) -> (B, n_tiles * NSEG) segment-major per query.
    return jnp.transpose(out, (1, 0, 2)).reshape(b, n // SEG)


@partial(jax.jit,
         static_argnames=("k", "metric", "interpret", "use_highest"))
def flat_topk_fused(db: jnp.ndarray, db_sq: jnp.ndarray,
                    valid: jnp.ndarray, q: jnp.ndarray, *, k: int,
                    metric: str = "euclidean",
                    db_t: jnp.ndarray = None,
                    db_norm: jnp.ndarray = None,
                    interpret: bool = False, use_highest: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Exact exhaustive top-k via the fused Pallas stage 1 + XLA
    gather/re-rank stage 2. Metrics:

    - 'euclidean': the kernel's native sq - 2*ip surrogate;
    - 'inner_product': zeros for sq degrade the surrogate to -2*ip;
    - 'cosine': callers pass ``db_t`` as the TRANSPOSED ROW-NORMALIZED
      database and ``db_norm``; the query normalizes for stage 1 (so the
      surrogate is -2*cos, exactly monotone in angular distance) and
      stage 2 computes the exact angular distance from the raw rows.

    Same contract as ops/scan.flat_topk:
    (dists (B, k) ascending, rows (B, k) int32; +inf / -1 padding).
    """
    assert metric in ("euclidean", "inner_product", "cosine")
    n, d = db.shape
    b = q.shape[0]
    q = q.astype(jnp.float32)
    q_sq = jnp.sum(q * q, axis=-1)
    q_norm = jnp.sqrt(q_sq)
    q_stage1 = q
    if metric == "inner_product":
        db_sq = jnp.zeros_like(db_sq)
    elif metric == "cosine":
        assert db_norm is not None, "cosine needs db_norm (and a "             "normalized db_t)"
        db_sq = jnp.zeros_like(db_sq)
        q_stage1 = q / jnp.where(q_norm == 0, 1.0, q_norm)[:, None]
    # Exactness needs only k-1 segments (each segment-min < theta_k is
    # itself a distinct score < theta_k); +8 absorbs ties at theta_k, where
    # any tie choice is a valid top-k.
    s_keep = min(max(k + 8, 16), n // SEG)

    if db_t is None:
        # One-off transpose (callers holding a persistent transposed copy
        # pass db_t to avoid this per-call traffic). For cosine the mirror
        # must be row-NORMALIZED — falling back to the raw transpose would
        # silently rank stage-1 selection by inner product.
        if metric == "cosine":
            nrm = jnp.where(db_norm == 0, 1.0, db_norm)
            db_t = (db.astype(jnp.float32) / nrm[:, None]).T
        else:
            db_t = db.T
    penalty = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32) \
        .reshape(1, n)
    minima = segment_minima(db_t, db_sq.reshape(1, n), penalty, q_stage1,
                            interpret=interpret, use_highest=use_highest)
    neg, sid = jax.lax.top_k(-minima, s_keep)
    sid = jnp.where(jnp.isinf(neg), -1, sid.astype(jnp.int32))

    # Stage 2: gather kept segments' rows; exact distances; final top-k.
    rows = (jnp.maximum(sid, 0)[..., None] * SEG
            + jax.lax.broadcasted_iota(jnp.int32, (b, s_keep, SEG), 2))
    rows_flat = rows.reshape(b, s_keep * SEG)
    alive = (sid[..., None] >= 0).repeat(SEG, axis=-1) \
        .reshape(b, s_keep * SEG)
    alive = alive & jnp.take(valid, rows_flat, axis=0)

    # Gather whole 128-row segments (contiguous 64KB slices) rather than
    # individual rows — far better TPU gather granularity.
    db_seg = db.reshape(n // SEG, SEG, d)
    cand = jnp.take(db_seg, jnp.maximum(sid, 0), axis=0) \
        .reshape(b, s_keep * SEG, d).astype(jnp.float32)
    if metric == "inner_product":
        exact = -jnp.sum(cand * q[:, None, :], axis=-1)
    elif metric == "cosine":
        import math
        ip = jnp.sum(cand * q[:, None, :], axis=-1)
        cn = jnp.take(db_norm, rows_flat, axis=0)
        denom = q_norm[:, None] * cn
        sim = jnp.clip(ip / jnp.where(denom == 0, 1.0, denom), -1.0, 1.0)
        exact = 2.0 * jnp.arccos(sim) / math.pi
    else:
        diff = cand - q[:, None, :]
        exact = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    exact = jnp.where(alive, exact, jnp.inf)
    neg, sel = jax.lax.top_k(-exact, k)
    out_rows = jnp.take_along_axis(rows_flat, sel, axis=1).astype(jnp.int32)
    out_d = -neg
    out_rows = jnp.where(jnp.isinf(out_d), -1, out_rows)
    return out_d, out_rows
