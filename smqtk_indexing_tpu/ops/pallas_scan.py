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

Output is the per-query top-S (segment minima, segment ids) — S =
min(max(k + 8, 16), n/SEG) in flat_topk_fused (k + 16 in sq8_topk) — from
which the caller gathers only S*128 rows per query and exact-re-ranks
(stage 2, plain XLA). Exactness of the segment pre-selection: every row of
the true top-k has score <= theta (the kth best), so its segment's minimum
is <= theta; at most k distinct segment minima can be <= theta (each
minimum is itself a score), so the top-(k + margin) segments by minimum
contain every true top-k row with slack for ties.

Used automatically by ops/scan-level callers on TPU via ``flat_topk_fused``;
falls back to interpret mode off-TPU (tests).
"""
from __future__ import annotations

import os
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


_DOT_NUMS = (((1,), (0,)), ((), ()))


def _tile_ip(q, tile, mode):
    """Query x (d, tile_n) tile inner products in the requested mode
    (shared by the mirror and tiled-layout kernel bodies)."""
    if tile.dtype == jnp.int8 and q.dtype == jnp.int8:
        # int8 x int8 -> int32 MXU form (2x the bf16 rate on v5e): the
        # caller pre-quantized the query side with one global scale and
        # pre-divided the row stats by it, so these raw integer products
        # rank segments directly (tools/probe_int8_mxu.py is the
        # measured go/no-go for this lowering).
        return jax.lax.dot_general(
            q, tile, dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.int32).astype(jnp.float32)
    if tile.dtype == jnp.int8:
        tile = tile.astype(jnp.bfloat16)
    if mode == "split3":
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d_hi = tile.astype(jnp.bfloat16)
        d_lo = (tile - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ip = jax.lax.dot_general(
            q_hi, d_hi, dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.float32)
        ip += jax.lax.dot_general(
            q_hi, d_lo, dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.float32)
        ip += jax.lax.dot_general(
            q_lo, d_hi, dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.float32)
        return ip
    precision = jax.lax.Precision.HIGHEST if mode == "highest" else None
    return jax.lax.dot_general(
        q, tile, dimension_numbers=_DOT_NUMS,
        preferred_element_type=jnp.float32, precision=precision)


def _q_kernel_dtype(q: jnp.ndarray, db_dtype) -> jnp.ndarray:
    """Query operand dtype for a scan kernel: bf16/int8 databases take
    bf16 queries (int8 tiles cast to bf16 in-kernel), EXCEPT a
    pre-quantized int8 query, which rides through untouched and selects
    the int8 x int8 MXU dot in :func:`_tile_ip` (the caller pre-divided
    the row stats by its scale — ops/sq8.py's i8dot path)."""
    if q.dtype == jnp.int8:
        if db_dtype != jnp.int8:
            raise ValueError(
                "int8 queries require an int8 (SQ8-coded) database; got "
                f"db dtype {db_dtype}.")
        return q
    if db_dtype in (jnp.bfloat16, jnp.int8):
        return q.astype(jnp.bfloat16)
    return q


def _scan_kernel(q_ref, db_ref, sq_ref, pen_ref, out_ref, *, mode):
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
    q = q_ref[0]
    full = db_ref[:]
    if full.ndim == 3:
        # Tiled-transposed layout: (T, d, tile_n) block. T > 1 amortizes
        # per-grid-step overhead (DMA issue + launch) over several
        # full-size dots — measured grid-step-overhead-bound at 24K
        # single-tile steps. Sub-tiles score independently; their
        # segment minima concatenate on lanes.
        sub_outs = []
        t_count = full.shape[0]
        tile_n = full.shape[2]
        nseg_sub = tile_n // SEG
        b_rows = q_ref.shape[1]
        for j in range(t_count):
            tile = full[j]
            sq_j = sq_ref[:, j * tile_n:(j + 1) * tile_n]
            pen_j = pen_ref[:, j * tile_n:(j + 1) * tile_n]
            ip = _tile_ip(q, tile, mode)
            scores = sq_j - 2.0 * ip + pen_j
            sub_outs.append(
                jnp.min(scores.reshape(b_rows, nseg_sub, SEG), axis=-1))
        out = sub_outs[0] if t_count == 1 \
            else jnp.concatenate(sub_outs, axis=-1)
        out_ref[:] = out.reshape(1, b_rows, t_count * nseg_sub)
        return
    # SQ8 int8 tiles: cast to bf16 in-register inside _tile_ip (integers
    # in [-127, 127] are EXACT in bf16, 1 byte/dim of HBM traffic; the
    # query side's bf16 rounding is the caller's documented margin), or
    # run the int8 x int8 MXU form when the query arrives pre-quantized.
    # split3 mode: x = hi + lo with hi = bf16(x) makes hi exactly
    # representable and |lo| <= 2^-9 |x|, so q.x = qh.dh + qh.dl + ql.dh
    # + O(2^-18) — three full-rate bf16 MXU passes for ~1e-5 relative
    # score error (measured: the Mosaic HIGHEST lowering costs ~14x a
    # bf16 pass, this costs 3x; the k+8 segment margin + exact stage-2
    # re-rank absorb the residual noise — see flat_topk_fused's error
    # budget note).
    ip = _tile_ip(q, full, mode)
    # L2 surrogate (||q||^2 constant omitted); +inf penalty masks dead
    # rows. sq/pen arrive as (1, TILE_N) row vectors — an in-kernel
    # (TILE_N, 1) -> (1, TILE_N) reshape is a cross-lane transpose that
    # Mosaic expands catastrophically (~66MB of scoped VMEM).
    scores = sq_ref[:] - 2.0 * ip + pen_ref[:]
    # Full-block (1, tile_b, nseg) store: partial-width stores at offsets
    # that are not lane-aligned are rejected by Mosaic.
    nseg = db_ref.shape[-1] // SEG
    out_ref[:] = jnp.min(scores.reshape(b, nseg, SEG), axis=-1) \
        .reshape(1, b, nseg)


#: Stage-1 dot modes, cheapest first. "native": operands as stored (exact
#: for bf16 databases, bf16-noisy for f32). "split3": hi/lo bf16
#: decomposition, 3 full-rate MXU passes, ~1e-5 relative score error.
#: "highest": Mosaic's exact f32 lowering (~14x a bf16 pass, measured).
PRECISIONS = ("native", "split3", "highest")


@partial(jax.jit, static_argnames=("interpret", "precision"))
def segment_minima(db_t: jnp.ndarray, db_sq: jnp.ndarray,
                   penalty: jnp.ndarray, q: jnp.ndarray, *,
                   interpret: bool = False, precision: str = "split3"
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
    :param precision: One of PRECISIONS (bf16 databases always run
        "native" — bf16 operands are exact on the MXU and Mosaic rejects
        f32 lowerings for them).
    :return: (B, N // 128) float32 segment minima.
    """
    d, n = db_t.shape
    b = q.shape[0]
    assert n % TILE_N == 0
    assert precision in PRECISIONS
    tile_b = min(TILE_B, b)
    assert b % tile_b == 0
    mode = "native" if db_t.dtype in (jnp.bfloat16, jnp.int8) \
        else precision
    # split3 holds three live f32 score buffers plus hi/lo tile temps in
    # VMEM; halving the db tile keeps the scoped-VMEM footprint under the
    # 16MB limit (HBM traffic is unchanged — every tile still streams
    # once per query tile).
    tile_n = TILE_N // 2 if mode == "split3" else TILE_N
    nseg_t = tile_n // SEG
    n_tiles = n // tile_n
    grid = (b // tile_b, n_tiles)

    # Queries ship as (q_tiles, tile_b, d) so each q block is a leading
    # full slice (cheap reshape, no relayout). bf16/int8 databases take
    # bf16 queries (int8 tiles cast to bf16 in-kernel); an int8 QUERY
    # rides through untouched and selects the int8 x int8 MXU dot
    # (callers pre-quantize + pre-scale the row stats — ops/sq8.py).
    q3 = _q_kernel_dtype(q, db_t.dtype).reshape(b // tile_b, tile_b, d)

    kernel = partial(_scan_kernel, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),          # q tile
            pl.BlockSpec((d, tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # db tile (d, T)
            pl.BlockSpec((1, tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # sq tile
            pl.BlockSpec((1, tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),          # penalty tile
        ],
        # 3D output, one full block per (q-tile, db-tile): Mosaic requires
        # stores be full-block or lane-aligned; (n_tiles, B, nseg) makes
        # every store a full block.
        out_specs=pl.BlockSpec(
            (1, tile_b, nseg_t),
            lambda qi, ni: (ni, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b, nseg_t), jnp.float32),
        interpret=interpret,
    )(q3, db_t, db_sq, penalty)
    # (n_tiles, B, NSEG) -> (B, n_tiles * NSEG) segment-major per query.
    return jnp.transpose(out, (1, 0, 2)).reshape(b, n // SEG)


@partial(jax.jit,
         static_argnames=("interpret", "precision", "tiles_per_step"))
def segment_minima_tiled(db3: jnp.ndarray, db_sq: jnp.ndarray,
                         penalty: jnp.ndarray, q: jnp.ndarray, *,
                         interpret: bool = False,
                         precision: str = "split3",
                         tiles_per_step: int = 8) -> jnp.ndarray:
    """
    Stage 1 over the TILED-TRANSPOSED single-copy layout: the database
    stored as (n_tiles, d, TILE_N) — row r in tile r // TILE_N, column
    r % TILE_N. Semantically identical to :func:`segment_minima` over a
    (d, N) mirror (same kernel, same full-size MXU dots — unlike the
    per-segment blocked kernel, whose tiny dots drown in loop overhead),
    but each grid step's DMA is one fully contiguous block AND stage 2
    can gather (d, SEG) column slices from the SAME array, so no
    separate row-major copy is needed (the capacity-tier property).

    :param db3: (n_tiles, d, tile_n) float32/bfloat16/int8 with
        tile_n == TILE_N (int8/bf16) or TILE_N // 2 (f32 split3).
    :param db_sq/penalty: (1, N) row vectors (N = n_tiles * tile_n).
    :return: (B, N // SEG) float32 segment minima (segment order matches
        segment_minima).
    """
    n_tiles, d, tile_n = db3.shape
    n = n_tiles * tile_n
    b = q.shape[0]
    assert precision in PRECISIONS
    tile_b = min(TILE_B, b)
    assert b % tile_b == 0
    mode = "native" if db3.dtype in (jnp.bfloat16, jnp.int8) \
        else precision
    expect_tile = TILE_N // 2 if mode == "split3" else TILE_N
    assert tile_n == expect_tile, (tile_n, expect_tile, mode)
    nseg_t = tile_n // SEG
    # T tiles per grid step amortize DMA-issue/launch overhead (measured
    # grid-step-overhead-bound at 24K single-tile steps, 100M rows);
    # VMEM: T x 512KB int8 tiles + double buffering.
    t_step = tiles_per_step
    while n_tiles % t_step:
        t_step //= 2
    n_steps = n_tiles // t_step
    grid = (b // tile_b, n_steps)
    q3 = _q_kernel_dtype(q, db3.dtype).reshape(b // tile_b, tile_b, d)

    kernel = partial(_scan_kernel, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_step, d, tile_n), lambda qi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_b, t_step * nseg_t),
            lambda qi, ni: (ni, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, b, t_step * nseg_t), jnp.float32),
        interpret=interpret,
    )(q3, db3, db_sq, penalty)
    return jnp.transpose(out, (1, 0, 2)).reshape(b, n // SEG)


#: Concurrent (d, SEG) slice DMAs issued per grid step of the segment
#: gather — one DMA per step left the engine idle between ~16KB copies
#: (measured: the gather dominated large-batch re-ranks at 100M).
GATHER_GRP = 32


def _seg_gather_kernel(ti_ref, c0_ref, db_ref, out_ref, buf, sems, *,
                       grp: int):
    """Copy ``grp`` (d, SEG) column slices of the tiled layout per grid
    step, all in flight together (strided 2-D DMAs; the engine handles
    the row stride natively)."""
    i = pl.program_id(0)
    base = i * grp
    cps = []
    for j in range(grp):
        # Starts are SEG-aligned by construction; the multiple_of hint
        # lets Mosaic prove lane-tile divisibility for the dynamic DMA.
        c0 = pl.multiple_of(c0_ref[base + j], SEG)
        cp = pltpu.make_async_copy(
            db_ref.at[ti_ref[base + j], :, pl.ds(c0, SEG)], buf.at[j],
            sems.at[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    out_ref[:] = buf[:]


def _seg_gather_kernel_pf(ti_ref, c0_ref, db_ref, out_ref, buf, sems, *,
                          grp: int):
    """Double-buffered segment gather: step ``i`` waits only on the DMAs
    issued one grid step EARLIER (into scratch slot ``i % 2``) and issues
    step ``i+1``'s group into the other slot before waiting — so each
    group's ~4 us/16KB-block latency overlaps the previous step's wait +
    output copy-back instead of serializing behind it. Scratch slots are
    addressed with static indices under parity predicates (dynamic
    leading-dim scratch indexing is a Mosaic hazard)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copies(step, slot):
        base = step * grp
        cps = []
        for j in range(grp):
            c0 = pl.multiple_of(c0_ref[base + j], SEG)
            cps.append(pltpu.make_async_copy(
                db_ref.at[ti_ref[base + j], :, pl.ds(c0, SEG)],
                buf.at[slot, j], sems.at[slot, j]))
        return cps

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    even = jax.lax.rem(i, 2) == 0

    @pl.when((i + 1 < n) & even)
    def _():
        for cp in copies(i + 1, 1):
            cp.start()

    @pl.when((i + 1 < n) & jnp.logical_not(even))
    def _():
        for cp in copies(i + 1, 0):
            cp.start()

    @pl.when(even)
    def _():
        for cp in copies(i, 0):
            cp.wait()
        out_ref[:] = buf[0]

    @pl.when(jnp.logical_not(even))
    def _():
        for cp in copies(i, 1):
            cp.wait()
        out_ref[:] = buf[1]


def seg_gather_tiled(db3: jnp.ndarray, sid: jnp.ndarray, *,
                     interpret: bool = False) -> jnp.ndarray:
    """Env-gated wrapper: cross-step DMA prefetch is the default;
    ``SMQTK_TPU_NO_GATHER_PREFETCH=1`` restores the per-step-barrier
    kernel. The flag is resolved OUTSIDE the jit (a static argument) so
    A/B runs in one process actually switch kernels instead of hitting
    the first trace's cache."""
    prefetch = not os.environ.get("SMQTK_TPU_NO_GATHER_PREFETCH")
    return _seg_gather_tiled(db3, sid, interpret=interpret,
                             prefetch=prefetch)


@partial(jax.jit, static_argnames=("interpret", "prefetch"))
def _seg_gather_tiled(db3: jnp.ndarray, sid: jnp.ndarray, *,
                      interpret: bool = False,
                      prefetch: bool = True) -> jnp.ndarray:
    """
    Gather segments from the tiled-transposed layout as a Pallas DMA
    kernel: an XLA ``gather``/advanced-index over the (n_tiles, d,
    TILE_N) parameter imposes a non-default layout preference on it and
    XLA inserts a full-array relayout COPY (measured: 12GB temp at 100M,
    OOM). Mosaic custom calls take default layouts, so this kernel keeps
    the parameter copy-free.

    :param db3: (n_tiles, d, tile_n) any dtype, tile_n % SEG == 0.
    :param sid: (B, s_keep) int32 global segment ids (clipped >= 0).
    :return: (B, s_keep, d, SEG) gathered segment blocks.
    """
    n_tiles, d, tile_n = db3.shape
    nseg_t = tile_n // SEG
    b, s_keep = sid.shape
    flat = sid.reshape(-1)
    total = b * s_keep
    grp = GATHER_GRP
    while total % grp:
        grp //= 2
    ti = (flat // nseg_t).astype(jnp.int32)
    c0 = ((flat % nseg_t) * SEG).astype(jnp.int32)

    if prefetch and total // grp > 1:
        kernel = partial(_seg_gather_kernel_pf, grp=grp)
        scratch = [pltpu.VMEM((2, grp, d, SEG), db3.dtype),
                   pltpu.SemaphoreType.DMA((2, grp))]
    else:
        kernel = partial(_seg_gather_kernel, grp=grp)
        scratch = [pltpu.VMEM((grp, d, SEG), db3.dtype),
                   pltpu.SemaphoreType.DMA((grp,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total // grp,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((grp, d, SEG), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total, d, SEG), db3.dtype),
        interpret=interpret,
    )(ti, c0, db3)
    return out.reshape(b, s_keep, d, SEG)


def _blocked_kernel(q_ref, db_ref, sq_ref, pen_ref, out_ref, acc):
    """One grid step over SEGS_PER_TILE segment blocks of the
    segment-blocked layout: for each (d, SEG) block j, one canonical MXU
    dot q @ block -> (tile_b, SEG) scores, reduce to the segment minimum
    column, and lane-select it into the (tile_b, SEGS_PER_TILE)
    accumulator (full-tile output; single-lane stores and cross-lane
    transposes are Mosaic hazards)."""
    b = q_ref.shape[1]
    q = q_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, SEGS_PER_TILE), 1)
    acc[:] = jnp.full((b, SEGS_PER_TILE), jnp.inf, jnp.float32)

    def body(j, _):
        d = db_ref.shape[1]
        tile = db_ref[pl.ds(j, 1), :, :].reshape(d, SEG)
        ip = _tile_ip(q, tile, "native")                 # (b, SEG)
        # (1, SEG) row slices (1-D vectors are a Mosaic hazard).
        sq_row = sq_ref[pl.ds(j, 1), :]
        pen_row = pen_ref[pl.ds(j, 1), :]
        scores = sq_row - 2.0 * ip + pen_row
        col = jnp.min(scores, axis=1, keepdims=True)     # (b, 1)
        acc[:] = jnp.where(lane == j, col, acc[:])
        return 0

    jax.lax.fori_loop(0, SEGS_PER_TILE, body, 0)
    out_ref[:] = acc[:].reshape(1, b, SEGS_PER_TILE)


#: Segment blocks per grid step of the blocked kernel (fills the output
#: tile's 128 lanes exactly).
SEGS_PER_TILE = 128


@partial(jax.jit, static_argnames=("interpret",))
def segment_minima_blocked(db_blk: jnp.ndarray, db_sq: jnp.ndarray,
                           penalty: jnp.ndarray, q: jnp.ndarray, *,
                           interpret: bool = False) -> jnp.ndarray:
    """
    Stage 1 over the SEGMENT-BLOCKED transposed layout: the database is
    stored as (N // SEG, d, SEG) — row r lives at block r // SEG, lane
    r % SEG. ONE resident copy serves both stages (stage 2 gathers whole
    contiguous (d, SEG) blocks), unlike the flat (d, N) mirror which
    duplicates storage; int8 blocks cast to bf16 in-VMEM (1 byte/dim of
    HBM traffic — the layout that fits a 100M-row SQ8 index).

    :param db_blk: (nseg, d, SEG) float32/bfloat16/int8,
        nseg % SEGS_PER_TILE == 0, d % 128 == 0.
    :param db_sq: (nseg, SEG) float32 squared norms (same blocking).
    :param penalty: (nseg, SEG) float32 (0 live / +inf dead).
    :param q: (B, d) float32 (B % 8 == 0; bf16-cast for int8/bf16 data).
    :return: (B, nseg * 1) -> (B, N // SEG) float32 segment minima, in
        the same segment order as ops/pallas_scan.segment_minima.
    """
    nseg, d, seg = db_blk.shape
    assert seg == SEG and nseg % SEGS_PER_TILE == 0
    b = q.shape[0]
    tile_b = min(TILE_B, b)
    assert b % tile_b == 0
    n_tiles = nseg // SEGS_PER_TILE
    grid = (b // tile_b, n_tiles)
    q3 = _q_kernel_dtype(q, db_blk.dtype).reshape(b // tile_b, tile_b, d)

    out = pl.pallas_call(
        _blocked_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEGS_PER_TILE, d, SEG),
                         lambda qi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEGS_PER_TILE, SEG), lambda qi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEGS_PER_TILE, SEG), lambda qi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_b, SEGS_PER_TILE),
            lambda qi, ni: (ni, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b, SEGS_PER_TILE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, SEGS_PER_TILE), jnp.float32),
        ],
        interpret=interpret,
    )(q3, db_blk, db_sq, penalty)
    return jnp.transpose(out, (1, 0, 2)).reshape(b, nseg)


def topk_smallest(m: jnp.ndarray, kk: int, blk: int = 16
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Exact top-kk SMALLEST over rows of (B, W) — the segment-minima
    recursion applied once more: at most kk blocks can have a block-min
    <= the kk-th smallest value (each such min is itself a value <= it,
    ties interchangeable), so the top-kk blocks by min contain every true
    top-kk element. One cheap (B, W/blk) top-k + a (B, kk*blk) top-k
    replaces the full-width sort ``lax.top_k`` lowers to (measured ~4x
    faster at W=8192 on v5e).

    :return: (values ascending, indices) of shape (B, kk).
    """
    b, w = m.shape
    nb = w // blk
    if w % blk or nb <= kk:
        neg, idx = jax.lax.top_k(-m, kk)
        return -neg, idx.astype(jnp.int32)
    m3 = m.reshape(b, nb, blk)
    bmin = jnp.min(m3, axis=-1)
    _, bidx = jax.lax.top_k(-bmin, kk)                      # (b, kk)
    cand = jnp.take_along_axis(m3, bidx[:, :, None], axis=1) \
        .reshape(b, kk * blk)
    cid = (bidx[:, :, None] * blk
           + jax.lax.broadcasted_iota(jnp.int32, (b, kk, blk), 2)) \
        .reshape(b, kk * blk)
    neg, sel = jax.lax.top_k(-cand, kk)
    return -neg, jnp.take_along_axis(cid, sel, axis=1)


@partial(jax.jit,
         static_argnames=("k", "metric", "interpret", "precision",
                          "rerank_margin"))
def flat_topk_fused(db: jnp.ndarray, db_sq: jnp.ndarray,
                    valid: jnp.ndarray, q: jnp.ndarray, *, k: int,
                    metric: str = "euclidean",
                    db_t: jnp.ndarray = None,
                    db_norm: jnp.ndarray = None,
                    db_seg_lo: jnp.ndarray = None,
                    interpret: bool = False, precision: str = "split3",
                    rerank_margin: int = 16
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

    Stage 2 has two forms. Without ``db_seg_lo``: gather the kept
    segments' raw rows, exact distances, final top-k (fully exact given
    exact stage-1 selection). With ``db_seg_lo`` (a (N/SEG, SEG, d) bf16
    mirror): gather the bf16 mirror (half the HBM traffic of the f32
    gather — the dominant stage-2 cost), score candidates with one MXU
    surrogate matvec, keep ``k + rerank_margin`` winners, and re-score
    only those from the raw f32 rows — reported distances stay exact.

    Error budget (documented, empirically validated against float64 by
    the benchmark drives): "split3" stage-1 carries ~1e-5 relative score
    noise against a k+8 SEGMENT margin, and the bf16 stage-2 surrogate
    carries ~4e-3 relative noise against the k+rerank_margin ROW margin;
    both margins exceed the observed noise by orders of magnitude on real
    corpora. ``precision="highest"`` + ``db_seg_lo=None`` gives the
    provably exact (and slower) configuration.

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
                            interpret=interpret, precision=precision)
    smin, sid = topk_smallest(minima, s_keep)
    sid = jnp.where(jnp.isinf(smin), -1, sid)

    # Stage 2: gather kept segments' rows; exact distances; final top-k.
    # All per-row side arrays gather SEGMENT-SHAPED ((b, s_keep, SEG)
    # blocks of 128 contiguous elements) — a flat jnp.take with (b, 3072)
    # scattered indices lowers to millions of element gathers and
    # dominated the measured stage-2 time.
    sid_c = jnp.maximum(sid, 0)
    rows = (sid_c[..., None] * SEG
            + jax.lax.broadcasted_iota(jnp.int32, (b, s_keep, SEG), 2))
    rows_flat = rows.reshape(b, s_keep * SEG)
    valid_seg = valid.reshape(n // SEG, SEG)
    alive = (sid[..., None] >= 0) & jnp.take(valid_seg, sid_c, axis=0)
    alive = alive.reshape(b, s_keep * SEG)

    def exact_dists(cand, cn):
        """Exact per-metric distances for (b, M, d) f32 candidates (``cn``
        = pre-gathered row norms, cosine only)."""
        if metric == "inner_product":
            return -jnp.sum(cand * q[:, None, :], axis=-1)
        if metric == "cosine":
            import math
            ip = jnp.sum(cand * q[:, None, :], axis=-1)
            denom = q_norm[:, None] * cn
            sim = jnp.clip(ip / jnp.where(denom == 0, 1.0, denom),
                           -1.0, 1.0)
            return 2.0 * jnp.arccos(sim) / math.pi
        diff = cand - q[:, None, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))

    def seg_gather_1d(arr1d):
        """(b, s_keep*SEG) gather of a per-row array, segment-shaped."""
        return jnp.take(arr1d.reshape(n // SEG, SEG), sid_c, axis=0) \
            .reshape(b, s_keep * SEG)

    if db_seg_lo is None:
        # f32 path: gather whole 128-row segments (contiguous 64KB
        # slices) rather than individual rows — far better TPU gather
        # granularity — and score them exactly.
        db_seg = db.reshape(n // SEG, SEG, d)
        cand = jnp.take(db_seg, sid_c, axis=0) \
            .reshape(b, s_keep * SEG, d).astype(jnp.float32)
        cn = seg_gather_1d(db_norm) if metric == "cosine" else None
        exact = jnp.where(alive, exact_dists(cand, cn), jnp.inf)
        out_d, sel = topk_smallest(exact, k)
        out_rows = jnp.take_along_axis(rows_flat, sel, axis=1) \
            .astype(jnp.int32)
        out_rows = jnp.where(jnp.isinf(out_d), -1, out_rows)
        return out_d, out_rows

    # bf16 path: half-traffic mirror gather + MXU surrogate + exact
    # re-rank of the k+margin row winners from the f32 rows.
    cand_lo = jnp.take(db_seg_lo, sid_c, axis=0) \
        .reshape(b, s_keep * SEG, d)
    # Candidate scoring as a COHORT dense matmul: a per-query matvec
    # (einsum bnd,bd->bn) uses 1/128 of the MXU and lowers to a slow VPU
    # reduce (measured ~25ms at B=1024, M=3072 — the dominant stage-2
    # cost). Instead score each 32-query cohort against the cohort's
    # pooled candidates in ONE (32, d) x (d, 32*M) MXU dot — 32x
    # redundant FLOPs against ~100x idle MXU headroom — and slice each
    # query's own block off the result's block diagonal.
    m_cand = s_keep * SEG
    cohort = min(32, b)
    if b % cohort == 0:
        nc = b // cohort
        g = cand_lo.reshape(nc, cohort * m_cand, d)
        qs = q_stage1.astype(jnp.bfloat16).reshape(nc, cohort, d)
        s_all = jax.lax.dot_general(
            qs, g, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (nc, cohort, cohort*M)
        s4 = s_all.reshape(nc, cohort, cohort, m_cand)
        ip = jnp.take_along_axis(
            s4, jax.lax.broadcasted_iota(jnp.int32, (nc, cohort, 1, 1),
                                         1),
            axis=2).reshape(b, m_cand)
    else:
        # Contract permits any B that is a multiple of 8; cohorts need
        # 32 | B — odd batch shapes take the per-query matvec instead of
        # crashing on the reshape.
        ip = jnp.einsum("bmd,bd->bm", cand_lo,
                        q_stage1.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    if metric == "euclidean":
        s2 = seg_gather_1d(db_sq) - 2.0 * ip
    elif metric == "inner_product":
        s2 = -ip
    else:  # cosine: q_stage1 normalized; normalize by row norms.
        cn = seg_gather_1d(db_norm)
        s2 = -(ip / jnp.where(cn == 0, 1.0, cn))
    s2 = jnp.where(alive, s2, jnp.inf)
    kk2 = min(k + rerank_margin, s_keep * SEG)
    sv, sel = topk_smallest(s2, kk2)
    rows2 = jnp.take_along_axis(rows_flat, sel, axis=1)
    alive2 = jnp.take_along_axis(alive, sel, axis=1)
    cand2 = jnp.take(db, jnp.maximum(rows2, 0), axis=0) \
        .astype(jnp.float32)
    cn2 = jnp.take(db_norm, jnp.maximum(rows2, 0), axis=0) \
        if metric == "cosine" else None
    exact = jnp.where(alive2, exact_dists(cand2, cn2), jnp.inf)
    neg, sel2 = jax.lax.top_k(-exact, k)
    out_d = -neg
    out_rows = jnp.take_along_axis(rows2, sel2, axis=1).astype(jnp.int32)
    out_rows = jnp.where(jnp.isinf(out_d), -1, out_rows)
    return out_d, out_rows


def _scan_kernel_tiled2(q_ref, db_ref, sq_ref, pen_ref, out_ref,
                        out2_ref, *, mode, bw: int):
    """Tiled-layout scan step emitting BOTH per-128-row segment minima
    and per-``bw``-segment coarse block minima: selection then runs
    hierarchically on the bw-times-smaller second output without ever
    transposing the (n_steps, B, G) minima array (a 403MB relayout at
    100M rows, measured ~21 ms/batch; the in-kernel coarse reduce costs
    ~1 ms). Blocks stream through the standard auto-pipelined in_specs —
    a manual double-buffered DMA variant measured 2.3x SLOWER (the
    Mosaic pipeline already overlaps; negative result kept here).

    bw=128 reduces the CONCATENATED minima with a lane-aligned minor dim
    (Mosaic rejects rank-splitting reshapes whose minor dim is not a
    multiple of the 128-lane width, and score-level 16-seg reduces blew
    the scoped-VMEM budget at 8 tiles/step); bw=16 (small layouts where
    G < 128) reduces each score block at 2048-lane granularity."""
    b = q_ref.shape[1]
    q = q_ref[0]
    full = db_ref[:]
    t_count = full.shape[0]
    tile_n = full.shape[2]
    nseg_sub = tile_n // SEG
    sub_outs, sub_bm = [], []
    for j in range(t_count):
        tile = full[j]
        sq_j = sq_ref[:, j * tile_n:(j + 1) * tile_n]
        pen_j = pen_ref[:, j * tile_n:(j + 1) * tile_n]
        ip = _tile_ip(q, tile, mode)
        scores = sq_j - 2.0 * ip + pen_j
        sub_outs.append(jnp.min(scores.reshape(b, nseg_sub, SEG),
                                axis=-1))
        if bw == 16:
            sub_bm.append(jnp.min(
                scores.reshape(b, tile_n // (16 * SEG), 16 * SEG),
                axis=-1))
    out = sub_outs[0] if t_count == 1 \
        else jnp.concatenate(sub_outs, axis=-1)
    g = t_count * nseg_sub
    if bw == 16:
        bm = sub_bm[0] if t_count == 1 \
            else jnp.concatenate(sub_bm, axis=-1)
    else:
        bm = jnp.min(out.reshape(b, g // bw, bw), axis=-1)
    out_ref[:] = out.reshape(1, b, g)
    out2_ref[:] = bm.reshape(1, b, g // bw)


@partial(jax.jit,
         static_argnames=("interpret", "precision", "tiles_per_step"))
def segment_minima_tiled2(db3: jnp.ndarray, db_sq: jnp.ndarray,
                          penalty: jnp.ndarray, q: jnp.ndarray, *,
                          interpret: bool = False,
                          precision: str = "split3",
                          tiles_per_step: int = 8):
    """:func:`segment_minima_tiled` variant returning the STEP-MAJOR
    minima plus in-kernel coarse block minima:
    ((n_steps, B, G) f32, (n_steps, B, G // bw) f32, bw in {128, 16}) with
    G = tiles_per_step * tile_n // SEG. Use :func:`topk_segments_stepmajor`
    to select — segment ids match the transposed convention."""
    n_tiles, d, tile_n = db3.shape
    b = q.shape[0]
    assert precision in PRECISIONS
    tile_b = min(TILE_B, b)
    assert b % tile_b == 0
    mode = "native" if db3.dtype in (jnp.bfloat16, jnp.int8) \
        else precision
    expect_tile = TILE_N // 2 if mode == "split3" else TILE_N
    assert tile_n == expect_tile, (tile_n, expect_tile, mode)
    nseg_t = tile_n // SEG
    t_step = tiles_per_step
    while n_tiles % t_step:
        t_step //= 2
    g = t_step * nseg_t
    bw = 128 if g % 128 == 0 else 16
    assert g % bw == 0
    n_steps = n_tiles // t_step
    grid = (b // tile_b, n_steps)
    q3 = _q_kernel_dtype(q, db3.dtype).reshape(b // tile_b, tile_b, d)

    kernel = partial(_scan_kernel_tiled2, mode=mode, bw=bw)
    out, out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_step, d, tile_n), lambda qi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, g), lambda qi, ni: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, g // bw),
                         lambda qi, ni: (ni, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, b, g), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, b, g // bw), jnp.float32),
        ],
        # Raise the scoped-VMEM cap from the conservative 16MB default
        # (v5e has 128MB): large query tiles' score blocks exceeded it
        # (measured OOM at tile_b=512, and at 8 tiles/step with the dual
        # output). Measured no slowdown at any tile size.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(q3, db3, db_sq, penalty)
    return out, out2


def topk_segments_stepmajor(m1: jnp.ndarray, m2: jnp.ndarray,
                            s_keep: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Exact top-``s_keep`` smallest SEGMENT minima from the step-major
    dual output of :func:`segment_minima_tiled2`: rank the (bw-times
    smaller) block minima, then refine inside the winning blocks with one small
    flat gather — the block-min pre-filter is exact by the same argument
    as :func:`topk_smallest` (at most s_keep blocks can hold a
    top-s_keep minimum). Returned ids use the GLOBAL segment order of
    the transposed minima convention (step * G + g).

    :return: (values ascending, segment ids), both (B, s_keep).
    """
    s_steps, b, g = m1.shape
    gb = m2.shape[2]
    bw = g // gb
    bm = jnp.transpose(m2, (1, 0, 2)).reshape(b, s_steps * gb)
    s_eff = min(s_keep, s_steps * gb)
    _, bidx = jax.lax.top_k(-bm, s_eff)                  # (B, s_eff)
    step = bidx // gb
    grp = bidx % gb
    # Refine with BLOCK-shaped row gathers: m1 viewed as (S*B*GB, bw)
    # makes each winning block one contiguous row, so XLA gathers whole
    # bw-element slices — a flat element-wise gather of the same values
    # lowers to s_eff*bw scalar gathers (measured ~17 ms/batch at 100M).
    m1r = m1.reshape(s_steps * b * gb, bw)
    qrow = jnp.arange(b, dtype=jnp.int32)[:, None]
    rowid = (step * b + qrow) * gb + grp                 # (B, s_eff)
    cand = jnp.take(m1r, rowid, axis=0).reshape(b, s_eff * bw)
    seg = ((step * g + grp * bw)[..., None]
           + jnp.arange(bw, dtype=jnp.int32)[None, None, :]) \
        .reshape(b, s_eff * bw)
    k_out = min(s_keep, s_eff * bw)
    neg, sel = jax.lax.top_k(-cand, k_out)
    return -neg, jnp.take_along_axis(seg, sel, axis=1)
