"""
100M stage-1 decomposition (round-5 verdict item 3): WHERE do the
~43 ms of the 12.9GB segment-minima pass go, when the DMA floor is
~16 ms and the B=128 MXU work is ~17 ms?

Hypothesis (from the kernel structure, ops/pallas_scan._scan_kernel):
within one grid step the MXU dot and the VPU epilogue (per-128-column
segment min — a cross-LANE reduction) SERIALIZE; Mosaic's auto-pipeline
overlaps DMA with compute across steps, but nothing overlaps the two
compute units within a step. If true, per-step cost ~= dot + min (not
max(dot, min)), and the pass is compute-epilogue-bound, not DMA-bound.

Variants measured in ONE process (tunnel variance policy):
  full     — the production kernel (dot + segment min).
  nomin    — same dot, epilogue = strided lane slice (scores[:, ::SEG])
             instead of the min reduce: isolates the min-reduce cost.
  nodot    — no MXU (scores = sq - 2*first-code-row), same min reduce:
             isolates DMA + epilogue (the block is still fully DMA'd).
  sweep    — tiles_per_step 4/8/16/32 on the production kernel.
  staged   — two-phase software pipeline: sub-tile j's dot issues
             adjacent to sub-tile j-1's min tree (independent MXU/VPU
             chains — tests whether Mosaic co-issues the units once the
             within-sub-tile dependency is broken).
  minfirst — all dots, then all min trees (max scheduling freedom,
             t_count live score blocks — VMEM-bound above t=4).

argv[3] (optional): comma-separated variant subset to sweep.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/stage1_analysis.py [n_tiles] [reps]
Defaults: 24576 tiles (100.7M rows, 12.9GB int8) on TPU, 64 on CPU.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import os

import jax

if os.environ.get("SMQTK_STAGE1_CPU"):
    # CPU smoke mode (the axon sitecustomize pins the TPU otherwise).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from smqtk_indexing_tpu.ops.pallas_scan import (  # noqa: E402
    SEG, TILE_N, _q_kernel_dtype, _tile_ip, segment_minima_tiled,
)

D = 128
B = 128


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _variant_kernel(q_ref, db_ref, sq_ref, pen_ref, out_ref, *, mode,
                    variant):
    q = q_ref[0]
    full = db_ref[:]
    t_count, _, tile_n = full.shape
    nseg_sub = tile_n // SEG
    b_rows = q_ref.shape[1]
    sub_outs = []
    for j in range(t_count):
        tile = full[j]
        sq_j = sq_ref[:, j * tile_n:(j + 1) * tile_n]
        pen_j = pen_ref[:, j * tile_n:(j + 1) * tile_n]
        if variant == "bf16min":
            # Same dot; the segment-min tree runs on PACKED bf16 lanes
            # (2 elements/lane — if Mosaic exploits it, the VPU epilogue
            # halves). Selection-precision cost if productionized:
            # ~2^-8 relative on the minima (the k+8 segment margin and
            # exact stage 2 would absorb most of it; exactness check 1
            # is the gate).
            ip = _tile_ip(q, tile, mode)
            scores = (sq_j - 2.0 * ip + pen_j).astype(jnp.bfloat16)
            sub_outs.append(
                jnp.min(scores.reshape(b_rows, nseg_sub, SEG),
                        axis=-1).astype(jnp.float32))
        elif variant == "folded":
            # sq+pen pre-folded into ONE row vector (saves one
            # full-width VPU pass per step; pen_j unused).
            ip = _tile_ip(q, tile, mode)
            scores = sq_j - 2.0 * ip
            sub_outs.append(
                jnp.min(scores.reshape(b_rows, nseg_sub, SEG), axis=-1))
        elif variant == "nodot":
            # No MXU: a one-sublane read of the tile keeps the DMA
            # honest (the block is in VMEM either way), the epilogue
            # stays the full segment-min reduce.
            scores = (sq_j - 2.0 * tile[:1, :].astype(jnp.float32)
                      + pen_j) + jnp.zeros((b_rows, 1), jnp.float32)
            sub_outs.append(
                jnp.min(scores.reshape(b_rows, nseg_sub, SEG), axis=-1))
        elif variant == "nomin":
            ip = _tile_ip(q, tile, mode)
            scores = sq_j - 2.0 * ip + pen_j
            # CONTIGUOUS narrow slice instead of the 128-lane min tree
            # (a strided ::SEG lane slice does not lower on Mosaic;
            # data is wrong but the store width and the dot match the
            # production step — that is the point of the A/B).
            sub_outs.append(scores[:, :nseg_sub])
        elif variant in ("staged", "minfirst"):
            continue  # handled below (cross-sub-tile pipelining)
        else:  # full
            ip = _tile_ip(q, tile, mode)
            scores = sq_j - 2.0 * ip + pen_j
            sub_outs.append(
                jnp.min(scores.reshape(b_rows, nseg_sub, SEG), axis=-1))
    if variant == "staged":
        # The docs Config 5 hypothesis made concrete: break the
        # dot(j) -> min(j) data dependency so adjacent program-order
        # ops are INDEPENDENT MXU and VPU work — iteration j issues
        # sub-tile j's dot and sub-tile j-1's segment-min tree. If
        # Mosaic's scheduler can co-issue matmul pushes with lane
        # shuffles across that boundary, per-step cost drops from
        # dot+min toward max(dot, min). Costs one extra live
        # (b, tile_n) f32 score block (2MB at B=128) of scoped VMEM.
        def _ip(j):
            return _tile_ip(q, full[j], mode)

        def _sc(j, ip):
            return (sq_ref[:, j * tile_n:(j + 1) * tile_n] - 2.0 * ip
                    + pen_ref[:, j * tile_n:(j + 1) * tile_n])

        def _mn(scores):
            return jnp.min(scores.reshape(b_rows, nseg_sub, SEG),
                           axis=-1)

        prev = _sc(0, _ip(0))
        for j in range(1, t_count):
            ip = _ip(j)
            sub_outs.append(_mn(prev))
            prev = _sc(j, ip)
        sub_outs.append(_mn(prev))
    elif variant == "minfirst":
        # All dots first, then all min trees: maximal scheduling
        # freedom, but t_count live (b, tile_n) f32 score blocks
        # (16MB at t=8/B=128 — expect VMEM failures above t=4).
        blocks = []
        for j in range(t_count):
            ip = _tile_ip(q, full[j], mode)
            blocks.append(
                sq_ref[:, j * tile_n:(j + 1) * tile_n] - 2.0 * ip
                + pen_ref[:, j * tile_n:(j + 1) * tile_n])
        for sc in blocks:
            sub_outs.append(
                jnp.min(sc.reshape(b_rows, nseg_sub, SEG), axis=-1))
    out = sub_outs[0] if t_count == 1 \
        else jnp.concatenate(sub_outs, axis=-1)
    out_ref[:] = out.reshape(1, b_rows, t_count * nseg_sub)


@partial(jax.jit, static_argnames=("variant", "t_step", "interpret"))
def _run_variant(db3, db_sq, penalty, q, *, variant, t_step,
                 interpret=False):
    n_tiles, d, tile_n = db3.shape
    nseg_t = tile_n // SEG
    b = q.shape[0]
    while n_tiles % t_step:
        t_step //= 2
    n_steps = n_tiles // t_step
    q3 = _q_kernel_dtype(q, db3.dtype).reshape(1, b, d)
    kernel = partial(_variant_kernel, mode="native", variant=variant)
    out = pl.pallas_call(
        kernel,
        grid=(1, n_steps),
        in_specs=[
            pl.BlockSpec((1, b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_step, d, tile_n), lambda qi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_step * tile_n), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b, t_step * nseg_t), lambda qi, ni: (ni, qi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, b, t_step * nseg_t), jnp.float32),
        interpret=interpret,
    )(q3, db3, db_sq, penalty)
    # Reduce to a tiny result so timing excludes any (B, N/SEG) device->
    # host pull; a scalar sum forces full materialization of the pass.
    return jnp.sum(out[:, :, 0])


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 \
        else (24576 if on_tpu else 64)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    interp = not on_tpu
    n = n_tiles * TILE_N
    gb = n * D / 2 ** 30
    _emit(metric="stage1_analysis_config", n_tiles=n_tiles, rows=n,
          int8_gb=round(gb, 2), b=B, backend=jax.default_backend())

    key = jax.random.PRNGKey(0)
    step = min(512, n_tiles)
    assert n_tiles % step == 0, (n_tiles, step)

    @partial(jax.jit, donate_argnums=(0,))
    def fill(buf, ci):
        k = jax.random.fold_in(key, ci)
        t = jax.random.randint(k, (step, D, TILE_N), -127, 128,
                               jnp.int32).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, t, (ci, 0, 0))

    # Donated in-place fill (a block list + concatenate would need 2x
    # the 12GB corpus transiently — the OOM the 100M demo's ingest
    # design exists to avoid).
    db3 = jnp.zeros((n_tiles, D, TILE_N), jnp.int8)
    for ci in range(0, n_tiles, step):
        db3 = fill(db3, jnp.int32(ci))
    db3.block_until_ready()
    db_sq = jnp.ones((1, n), jnp.float32)
    penalty = jnp.zeros((1, n), jnp.float32)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32) * 8

    # Reference numbers: ideal DMA and MXU times.
    hbm_gbps = 819.0
    mxu_tflops = 197.0
    dma_ms = gb / hbm_gbps * 1e3
    mxu_ms = (B * n * D * 2) / (mxu_tflops * 1e12) * 1e3
    _emit(metric="stage1_ideal", dma_ms=round(dma_ms, 1),
          mxu_bf16_ms=round(mxu_ms, 1),
          ideal_overlapped_ms=round(max(dma_ms, mxu_ms), 1))

    # Production path first (the number docs Config 5 carries). Wrap in
    # one jit: segment_minima_tiled is an eager pallas_call + transpose,
    # and 3 eager dispatches through the ~28 ms tunnel RTT swamp the
    # kernel (first run measured "348 ms" that way — a measurement
    # artifact, not kernel time).
    @jax.jit
    def prod(db3_, sq_, pen_, q_):
        out = segment_minima_tiled(db3_, sq_, pen_, q_,
                                   interpret=interp)
        return jnp.sum(out[:, 0])

    out = prod(db3, db_sq, penalty, q)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = prod(db3, db_sq, penalty, q)
    np.asarray(out)
    prod_ms = (time.perf_counter() - t0) / reps * 1e3
    _emit(metric="stage1_production_ms", value=round(prod_ms, 1),
          gbps=round(gb / (prod_ms / 1e3), 0))

    # t_step sweep stops at 8: t=16 int8 blocks (8MB x double buffer)
    # exceed the 16MB scoped-VMEM limit (measured: "Scoped allocation
    # with size 17.50M ... exceeded scoped vmem limit").
    all_variants = ("full", "nomin", "nodot", "bf16min", "folded",
                    "staged", "minfirst")
    variants = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 \
        else all_variants
    assert all(v in all_variants for v in variants), variants
    for variant in variants:
        for t_step in (2, 4, 8):
            try:
                r = _run_variant(db3, db_sq, penalty, q, variant=variant,
                                 t_step=t_step, interpret=interp)
                r.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(reps):
                    r = _run_variant(db3, db_sq, penalty, q,
                                     variant=variant, t_step=t_step,
                                     interpret=interp)
                np.asarray(r)
                ms = (time.perf_counter() - t0) / reps * 1e3
                _emit(metric=f"stage1_{variant}_t{t_step}_ms",
                      value=round(ms, 1),
                      gbps=round(gb / (ms / 1e3), 0))
            except Exception as e:  # compile/VMEM limits: keep sweeping
                _emit(metric=f"stage1_{variant}_t{t_step}_ms",
                      error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
