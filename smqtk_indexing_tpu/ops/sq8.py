"""
SQ8 scalar-quantized vector codec + exhaustive scan.

The capacity tier the reference exposes through FAISS's factory grammar
(``SQ8`` / ``PQx`` codecs,
/root/reference/smqtk_indexing/impls/nn_index/faiss.py:190,368-386): vectors
are stored as one int8 code per dimension with a per-dimension affine codec
(x_d ~= a_d * u_d + b_d), cutting HBM residency 4x vs float32 (~120M vectors
of d=128 on a 16GB chip vs ~30M).

TPU-first formulation: the scan never dequantizes the database. With
r = q - b and t = r * a,

    ||q - x_hat||^2 = sum(r^2) - 2 * <t, u> + sum(a^2 u^2)

so the streamed score block is ONE matmul of the query-side ``t`` against
the raw int8 codes (cast to bfloat16 in-register — integers in [-127, 127]
are exact in bf16, so the MXU sees exact code values) plus a precomputed
per-row ``s2 = sum(a^2 u^2)`` — the same surrogate shape as the float scan
(ops/scan.py). Selection carries a k+8 margin and the winners are re-scored
from dequantized float32 rows, so reported distances are exact with respect
to the quantized vectors (the codec itself is the only loss, as with FAISS
SQ8 — recall is measured against the float ground truth by the benchmarks).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQ8_METRICS = ("euclidean", "inner_product", "cosine", "hik")

#: Rows per streamed block (divides every 1024*2^m capacity).
DEFAULT_CHUNK = 65536


def sq8_train(mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """
    Fit the per-dimension affine codec from a training matrix: ``a`` spans
    the observed range over the 254-step int8 grid, ``b`` centers it.

    :return: (a (d,) float32 scale, b (d,) float32 offset).
    """
    mn = mat.min(axis=0).astype(np.float64)
    mx = mat.max(axis=0).astype(np.float64)
    a = (mx - mn) / 254.0
    # Constant dimensions still decode exactly: a=0 is degenerate for
    # encode division, so floor it at a tiny epsilon (codes become 0 and
    # b reproduces the constant).
    a = np.maximum(a, 1e-12)
    b = (mx + mn) / 2.0
    return a.astype(np.float32), b.astype(np.float32)


def sq8_encode_np(mat: np.ndarray, a: np.ndarray, b: np.ndarray
                  ) -> np.ndarray:
    """Quantize rows to int8 codes (host-side, for store mirrors)."""
    u = np.rint((mat.astype(np.float32) - b) / a)
    return np.clip(u, -127, 127).astype(np.int8)


@jax.jit
def sq8_encode(mat: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
               ) -> jnp.ndarray:
    """Quantize rows to int8 codes (device-side, for on-device builds)."""
    u = jnp.rint((mat.astype(jnp.float32) - b) / a)
    return jnp.clip(u, -127, 127).astype(jnp.int8)


def sq8_decode(codes: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
               ) -> jnp.ndarray:
    """Dequantize int8 codes to float32 rows."""
    return codes.astype(jnp.float32) * a + b


def sq8_build_store(host: np.ndarray, valid_mask: np.ndarray,
                    capacity: int, d_pad: int, dim: int, codec=None):
    """
    The one shared SQ8 store build (flat VectorStore and the IVF CSR
    store both call it so codec details cannot diverge): per-dim codec
    trained over the live rows, padding dims get scale epsilon / offset
    0 so zero-padded codes and queries contribute nothing to any score
    term.

    :return: (a_dev (d_pad,), b_dev (d_pad,), codes_dev (capacity, d_pad)
        int8, s2 (capacity,), nrm (capacity,)).
    """
    n = host.shape[0]
    if codec is not None:
        # Train-once contract (FAISS scalar quantizer): capacity growth
        # and compaction re-uploads reuse the build-time codec so
        # already-indexed rows keep their distances.
        a, b = codec
    else:
        live = host[valid_mask] if not valid_mask.all() else host
        a, b = sq8_train(live)
    a_p = np.full(d_pad, 1e-12, dtype=np.float32)
    b_p = np.zeros(d_pad, dtype=np.float32)
    a_p[:dim] = a
    b_p[:dim] = b
    codes = np.zeros((capacity, d_pad), dtype=np.int8)
    codes[:n, :dim] = sq8_encode_np(host, a, b)
    a_dev = jnp.asarray(a_p)
    b_dev = jnp.asarray(b_p)
    codes_dev = jnp.asarray(codes)
    s2, nrm = sq8_row_stats(codes_dev, a_dev, b_dev)
    return a_dev, b_dev, codes_dev, s2, nrm


@jax.jit
def sq8_row_stats(codes: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Per-row constants the scan needs: ``s2 = sum(a^2 u^2)`` (the quadratic
    code term of the L2 expansion) and the dequantized row L2 norm (cosine).
    """
    u = codes.astype(jnp.float32)
    s2 = jnp.sum((a * u) ** 2, axis=-1)
    x = u * a + b
    nrm = jnp.sqrt(jnp.sum(x * x, axis=-1))
    return s2, nrm


def _code_ip(t: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """(B, C) inner products of query-side t against int8 codes: codes cast
    to bf16 in-register (integers in [-127,127] are EXACT in bf16, so the
    MXU sees true code values; t's bf16 rounding is ~2^-8 relative score
    noise absorbed by the k+8 selection margin + exact re-rank)."""
    return jnp.dot(t.astype(jnp.bfloat16), codes.astype(jnp.bfloat16).T,
                   preferred_element_type=jnp.float32)


def _i8dot_q(t: jnp.ndarray, sq_row: jnp.ndarray):
    """Quantize the query-side operand to int8 with ONE global scale g
    (max |t| / 127 across the batch) and pre-divide the stage-1 row
    stats by g: the kernel's raw int32 products then satisfy
    score_true ~= g * (sq/g - 2 <t_i8, u>), a positive per-batch rescale
    of the surrogate — ranking-invariant, +inf dead-row poison preserved
    — selecting the int8 x int8 MXU dot (2x bf16 rate on v5e; rounding
    ~2^-8 relative, the same order as the bf16 path's documented
    margin). Stage 2 rescores the winners in f32 as usual."""
    g = jnp.maximum(jnp.max(jnp.abs(t)) / 127.0, 1e-30)
    t_i8 = jnp.clip(jnp.round(t / g), -127, 127).astype(jnp.int8)
    return t_i8, sq_row / g


@partial(jax.jit, static_argnames=("k", "metric", "chunk", "interpret",
                                   "i8dot"))
def sq8_topk(codes: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
             s2: jnp.ndarray, nrm: jnp.ndarray, valid: jnp.ndarray,
             q: jnp.ndarray, *, k: int, metric: str = "euclidean",
             chunk: int = DEFAULT_CHUNK, codes_t: jnp.ndarray = None,
             interpret: bool = False, i8dot: bool = False
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Exhaustive top-k over an SQ8-coded database.

    Streaming structure mirrors ops/scan.flat_topk (running top-k over
    chunked score blocks); the score matmul reads int8 codes only. The
    final k winners (selected with a k+8 margin) are dequantized and
    re-scored in float32, so returned distances are exact w.r.t. the
    quantized vectors.

    :param codes: (N, d) int8 codes (rows beyond the live set zeroed).
    :param a: (d,) float32 codec scales.
    :param b: (d,) float32 codec offsets.
    :param s2: (N,) float32 per-row sum((a*u)^2).
    :param nrm: (N,) float32 dequantized row norms.
    :param valid: (N,) bool row liveness.
    :param q: (B, d) float32 queries.
    :param codes_t: Optional (d, N) TRANSPOSED int8 code mirror — routes
        stage 1 through the fused Pallas kernel
        (ops/pallas_scan.segment_minima casts int8 tiles to bf16
        in-VMEM: 1 byte/dim HBM traffic at full MXU rate). Requires
        euclidean/inner_product, N % TILE_N == 0, and costs one extra
        byte/dim of residency; stage 2 / exact re-rank are unchanged.
    :return: (dists (B, k) float32 ascending, rows (B, k) int32;
        +inf / -1 padding).
    """
    if metric not in SQ8_METRICS:
        raise ValueError(
            f"metric must be one of {SQ8_METRICS}, got {metric!r}")
    n, d = codes.shape
    bq = q.shape[0]
    q = q.astype(jnp.float32)
    q_norm = jnp.sqrt(jnp.sum(q * q, axis=-1))
    if metric == "euclidean":
        t = (q - b[None, :]) * a[None, :]
    else:
        # inner_product / cosine: <q, x_hat> = <q*a, u> + <q, b>. The
        # constant <q, b> shifts every score of a query equally for IP
        # (rank-free) but matters inside cosine's normalization — fold it
        # in by augmenting u with a constant 1 column? Cheaper: keep the
        # matmul pure and add the constant into the score via s2's slot.
        t = q * a[None, :]
    qb_const = q @ b  # (B,) constant inner-product term

    kk = min(k + 8, n)  # margin absorbs bf16 surrogate noise at the edge

    def scores_of(codes_c, s2_c, nrm_c, va_c):
        if metric == "cosine":
            ip = _code_ip(t, codes_c) + qb_const[:, None]
            denom = q_norm[:, None] * nrm_c[None, :]
            denom = jnp.where(denom == 0, 1.0, denom)
            s = -(ip / denom)
        elif metric == "inner_product":
            s = -(_code_ip(t, codes_c) + qb_const[:, None])
        elif metric == "hik":
            # No matmul form: dequantize the chunk on the VPU.
            x = codes_c.astype(jnp.float32) * a + b
            s = 1.0 - jnp.sum(jnp.minimum(q[:, None, :], x[None, :, :]),
                              axis=-1)
        else:  # euclidean
            s = s2_c[None, :] - 2.0 * _code_ip(t, codes_c)
        return jnp.where(va_c[None, :], s, jnp.inf)

    if n <= chunk:
        s = scores_of(codes, s2, nrm, valid)
        neg, rows = jax.lax.top_k(-s, kk)
        best_s, best_r = -neg, rows.astype(jnp.int32)
    else:
        # Two-stage streaming (the fused flat scan's structure,
        # ops/pallas_scan.py, in XLA): stream SEGMENT MINIMA only (no
        # per-chunk top-k), pick the k+16 best segments per query — every
        # segment holding a true top-k row has min <= the k-th best score,
        # and at most k(+ties) segments can — then rescore just those
        # segments' rows with the same surrogate and keep the kk row
        # winners. The doubled (segment, then row) margin covers the bf16
        # surrogate noise twice over.
        from smqtk_indexing_tpu.ops.pallas_scan import topk_smallest
        from smqtk_indexing_tpu.ops.scan import (
            SEG_W, streamed_segment_minima,
        )
        if codes_t is not None:
            # Fused Pallas stage 1 over the int8 mirror. Stage-1 values
            # only rank segments, so inner_product's dropped qb_const
            # (a per-query additive constant) cannot change selection.
            if metric not in ("euclidean", "inner_product"):
                raise ValueError(
                    "codes_t (fused stage 1) serves euclidean/"
                    f"inner_product only, not {metric!r} — cosine/hik "
                    "need per-row normalization the kernel surrogate "
                    "cannot express.")
            from smqtk_indexing_tpu.ops.pallas_scan import segment_minima
            penalty = jnp.where(valid, 0.0, jnp.inf) \
                .astype(jnp.float32).reshape(1, n)
            sq_row = s2.reshape(1, n) if metric == "euclidean" \
                else jnp.zeros((1, n), jnp.float32)
            t_k = t
            if i8dot:
                # int8 x int8 stage 1 (opt-in, SMQTK_TPU_SQ8_I8DOT at
                # the store layer): minima come back rescaled by 1/g —
                # ranking-invariant, and downstream only ranks them.
                t_k, sq_row = _i8dot_q(t, sq_row)
            minima = segment_minima(codes_t, sq_row, penalty, t_k,
                                    interpret=interpret)
        else:
            minima = streamed_segment_minima(
                scores_of, (codes, s2, nrm, valid), n, chunk, bq)
        s_keep = min(k + 16, n // SEG_W)
        smin, sid = topk_smallest(minima, s_keep)
        sid = jnp.where(jnp.isinf(smin), -1, sid)
        sid_c = jnp.maximum(sid, 0)
        m_rows = s_keep * SEG_W
        rows = (sid_c[..., None] * SEG_W
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (bq, s_keep, SEG_W), 2)) \
            .reshape(bq, m_rows)
        cand = jnp.take(codes.reshape(n // SEG_W, SEG_W, d), sid_c,
                        axis=0).reshape(bq, m_rows, d)

        def seg_gather(arr1d):
            return jnp.take(arr1d.reshape(n // SEG_W, SEG_W), sid_c,
                            axis=0).reshape(bq, m_rows)

        alive = (sid[..., None] >= 0).reshape(bq, s_keep, 1) \
            & jnp.take(valid.reshape(n // SEG_W, SEG_W), sid_c, axis=0)
        alive = alive.reshape(bq, m_rows)
        if metric == "hik":
            x = cand.astype(jnp.float32) * a + b
            s = 1.0 - jnp.sum(jnp.minimum(q[:, None, :], x), axis=-1)
        else:
            ip = jnp.einsum("bmd,bd->bm", cand.astype(jnp.bfloat16),
                            t.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            if metric == "cosine":
                ip = ip + qb_const[:, None]
                denom = q_norm[:, None] * seg_gather(nrm)
                s = -(ip / jnp.where(denom == 0, 1.0, denom))
            elif metric == "inner_product":
                s = -(ip + qb_const[:, None])
            else:
                s = seg_gather(s2) - 2.0 * ip
        s = jnp.where(alive, s, jnp.inf)
        sv, sel = topk_smallest(s, kk)
        best_s = sv
        best_r = jnp.take_along_axis(rows, sel, axis=1).astype(jnp.int32)
        best_r = jnp.where(jnp.isinf(best_s), -1, best_r)

    # Exact re-rank of the kk winners from dequantized f32 rows.
    from smqtk_indexing_tpu.ops.scan import exact_rerank_decoded
    sel_codes = jnp.take(codes, jnp.maximum(best_r, 0), axis=0)
    x = sel_codes.astype(jnp.float32) * a + b        # (B, kk, d)
    return exact_rerank_decoded(x, q, q_norm, best_s, best_r, metric, k)


@partial(jax.jit, static_argnames=("k", "metric", "interpret", "i8dot"))
def sq8_topk_blocked(codes_blk: jnp.ndarray, a: jnp.ndarray,
                     b: jnp.ndarray, s2: jnp.ndarray, valid: jnp.ndarray,
                     q: jnp.ndarray, *, k: int,
                     metric: str = "euclidean", interpret: bool = False,
                     i8dot: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Exhaustive SQ8 top-k over a SINGLE-COPY transposed layout — no flat
    copy, no separate mirror, so it is the capacity-tier configuration
    (100M rows/chip). Layout dispatch by trailing dim:

    - (n_tiles, d, TILE_N) **tiled** (trailing dim 4096, preferred):
      stage 1 = ops/pallas_scan.segment_minima_tiled (the flat kernel's
      full-size MXU dots over contiguous blocks), stage 2 gathers
      (d, 128) column slices via the Pallas DMA gather
      (seg_gather_tiled). Measured at 100M x 128, B=128: **1835 qps**
      vs 1123 for the row-major XLA streamed scan and 633 for the
      per-segment blocked kernel below.
    - (N/128, d, 128) **blocked** (trailing dim 128): one tiny dot per
      segment (segment_minima_blocked) — measured SLOWER (Mosaic loop
      overhead); kept for reference/tests.

    Euclidean / inner_product only (stage-1 surrogate form); distances
    exact w.r.t. the quantized vectors via the shared f32 re-rank.

    :param codes_blk: (nseg, d, 128) int8, nseg % 128 == 0.
    :param s2: (N,) float32 sum((a*u)^2) in ROW order.
    :param valid: (N,) bool in ROW order.
    :return: (dists (B, k) ascending, ROW ids (B, k) int32).
    """
    from smqtk_indexing_tpu.ops.pallas_scan import (
        SEG, segment_minima_blocked, segment_minima_tiled2,
        topk_segments_stepmajor, topk_smallest,
    )
    from smqtk_indexing_tpu.ops.scan import exact_rerank_decoded

    if metric not in ("euclidean", "inner_product"):
        raise ValueError(
            "sq8_topk_blocked serves euclidean/inner_product (see "
            "sq8_topk for the other metrics).")
    n_outer, d, trail = codes_blk.shape
    tiled = trail != SEG            # (n_tiles, d, TILE_N) variant
    n = n_outer * trail
    nseg = n // SEG
    bq = q.shape[0]
    q = q.astype(jnp.float32)
    q_norm = jnp.sqrt(jnp.sum(q * q, axis=-1))
    t = (q - b[None, :]) * a[None, :] if metric == "euclidean" \
        else q * a[None, :]
    qb_const = q @ b

    sq_flat = s2 if metric == "euclidean" \
        else jnp.zeros((n,), jnp.float32)
    pen_flat = jnp.where(valid, 0.0, jnp.inf).astype(jnp.float32)
    seg = SEG
    s_keep = min(k + 16, nseg)
    t1, sq1 = t, sq_flat
    if i8dot:
        # int8 x int8 stage 1 (opt-in, SMQTK_TPU_SQ8_I8DOT at the call
        # sites): stage-1 minima come back rescaled by 1/g —
        # ranking-invariant (one positive scale per batch, +inf poison
        # preserved) and used only for selection; stage 2 below rescores
        # the gathered candidates from the unscaled operands.
        t1, sq1 = _i8dot_q(t, sq_flat)
    if tiled:
        # Dual-output stage 1: selection runs hierarchically on the
        # in-kernel 16-segment block minima in STEP-MAJOR layout — the
        # transposed full-minima reduce cost ~21 ms/batch at 100M
        # (tools/profile_100m.py).
        m1, m2 = segment_minima_tiled2(
            codes_blk, sq1.reshape(1, n), pen_flat.reshape(1, n), t1,
            interpret=interpret)
        smin, sid = topk_segments_stepmajor(m1, m2, s_keep)
    else:
        minima = segment_minima_blocked(
            codes_blk, sq1.reshape(nseg, SEG),
            pen_flat.reshape(nseg, SEG), t1, interpret=interpret)
        smin, sid = topk_smallest(minima, s_keep, blk=16)
    sid = jnp.where(jnp.isinf(smin), -1, sid)
    sid_c = jnp.maximum(sid, 0)
    m_rows = s_keep * seg
    rows = (sid_c[..., None] * seg
            + jax.lax.broadcasted_iota(jnp.int32, (bq, s_keep, seg), 2)) \
        .reshape(bq, m_rows)
    if tiled:
        # (d, SEG) strided column slices via a Pallas DMA gather — any
        # XLA gather/indexing over the 12GB parameter imposes a
        # non-default layout preference on it and XLA inserts a
        # full-array relayout copy (measured OOM at 100M).
        from smqtk_indexing_tpu.ops.pallas_scan import seg_gather_tiled
        cand_blk = seg_gather_tiled(codes_blk, sid_c,
                                    interpret=interpret)
    else:
        # Contiguous (d, 128) block gather.
        cand_blk = jnp.take(codes_blk, sid_c, axis=0)
    cand = jnp.transpose(cand_blk, (0, 1, 3, 2)) \
        .reshape(bq, m_rows, d)      # (B, s_keep, d, SEG) -> rows
    alive = (sid[..., None] >= 0) \
        & jnp.take(valid.reshape(nseg, seg), sid_c, axis=0)
    alive = alive.reshape(bq, m_rows)
    ip = jnp.einsum("bmd,bd->bm", cand.astype(jnp.bfloat16),
                    t.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    if metric == "inner_product":
        s = -(ip + qb_const[:, None])
    else:
        s = jnp.take(s2.reshape(nseg, seg), sid_c, axis=0) \
            .reshape(bq, m_rows) - 2.0 * ip
    s = jnp.where(alive, s, jnp.inf)
    kk = min(k + 8, m_rows)
    sv, sel = topk_smallest(s, kk)
    best_s = sv
    best_r = jnp.take_along_axis(rows, sel, axis=1).astype(jnp.int32)
    best_r = jnp.where(jnp.isinf(best_s), -1, best_r)

    sel_cand = jnp.take_along_axis(
        cand, jnp.maximum(sel, 0)[..., None], axis=1)
    x = sel_cand.astype(jnp.float32) * a + b
    return exact_rerank_decoded(x, q, q_norm, best_s, best_r, metric, k)
