"""
On-chip A/B probe: can the SQ8 stage-1 scan dot run int8 x int8 -> int32
on the MXU, and is it faster than the current bf16 path?

Context: segment_minima/_tiled (ops/pallas_scan.py) cast int8 code tiles
to bf16 in-VMEM and run a bf16 MXU dot (codes in [-127, 127] are exact in
bf16; the query side's bf16 rounding is the documented surrogate margin).
TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
197 TFLOPS), so quantizing the QUERY side to int8 as well (one global
scale; relative rounding ~2^-8, the same order as the bf16 path's —
stage 2 re-ranks exactly either way) could halve the stage-1 MXU time at
the 100M capacity tier, where the measured breakdown is HBM ~16 ms +
MXU ~25 ms only partially overlapped (docs/benchmarks.md Config 5).

This probe measures IN ONE PROCESS (tunnel variance rule):
  1. whether Mosaic lowers the int8 dot at all (go/no-go),
  2. rank agreement of the int8 surrogate vs the bf16 surrogate
     (segment-minima top-s overlap on planted data),
  3. wall time of a pipelined scan pass over an on-device-generated int8
     corpus, bf16 kernel vs int8 kernel, identical layout/grid.

It changes NOTHING in production paths — results gate whether an
SMQTK_TPU_SQ8_I8DOT routing is worth landing (judge rule: measure before
defaulting).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_mxu.py
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smqtk_indexing_tpu.ops.pallas_scan import SEG, TILE_B, TILE_N

_DOT_NUMS = (((1,), (0,)), ((), ()))


def _kernel(q_ref, db_ref, sq_ref, pen_ref, g_ref, out_ref, *, int8dot):
    b = q_ref.shape[1]
    q = q_ref[0]
    tile = db_ref[:]
    nseg = tile.shape[-1] // SEG
    if int8dot:
        ip = jax.lax.dot_general(
            q, tile, dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        ip = ip * g_ref[0, 0]
    else:
        ip = jax.lax.dot_general(
            q, tile.astype(jnp.bfloat16), dimension_numbers=_DOT_NUMS,
            preferred_element_type=jnp.float32)
    scores = sq_ref[:] - 2.0 * ip + pen_ref[:]
    out_ref[:] = jnp.min(scores.reshape(b, nseg, SEG), axis=-1) \
        .reshape(1, b, nseg)


@partial(jax.jit, static_argnames=("int8dot", "interpret"))
def scan_minima(db_t, sq, pen, q, g, *, int8dot: bool,
                interpret: bool = False):
    d, n = db_t.shape
    b = q.shape[0]
    tile_b = min(TILE_B, b)
    grid = (b // tile_b, n // TILE_N)
    q3 = q.reshape(b // tile_b, tile_b, d)
    out = pl.pallas_call(
        partial(_kernel, int8dot=int8dot),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, d), lambda qi, ni: (qi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda qi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, TILE_N // SEG),
                               lambda qi, ni: (ni, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n // TILE_N, b, TILE_N // SEG), jnp.float32),
        interpret=interpret,
    )(q3, db_t, sq, pen, g)
    return jnp.transpose(out, (1, 0, 2)).reshape(b, n // SEG)


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: needs the real TPU")
        return 0
    d, b = 128, 128
    n = TILE_N * 4096          # 16.8M rows x 128 dims = 2.1 GB int8
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen():
        k1, k2 = jax.random.split(key)
        db = jax.random.randint(k1, (d, n), -127, 128, jnp.int8)
        qf = jax.random.normal(k2, (b, d), jnp.float32)
        sq = jnp.sum(
            (db.astype(jnp.float32)) ** 2, axis=0, keepdims=True)
        return db, qf, sq

    db_t, qf, sq = gen()
    pen = jnp.zeros((1, n), jnp.float32)
    jax.tree.map(lambda x: x.block_until_ready(), (db_t, qf, sq))

    # Query-side operands: bf16 cast vs int8 quantization (one global
    # scale across the batch — the per-query refinement is a later
    # production decision, not a throughput question).
    q_bf = qf.astype(jnp.bfloat16)
    g = float(np.abs(np.asarray(qf)).max()) / 127.0
    q_i8 = jnp.clip(jnp.rint(qf / g), -127, 127).astype(jnp.int8)
    g_dev = jnp.full((1, 1), g, jnp.float32)

    # 1. go/no-go + 2. rank agreement ------------------------------------
    try:
        m_i8 = np.asarray(
            scan_minima(db_t, sq, pen, q_i8, g_dev, int8dot=True))
    except Exception as e:  # Mosaic rejection is a clean NO-GO
        print(f"INT8 DOT NO-GO: {type(e).__name__}: {str(e)[:300]}")
        return 1
    m_bf = np.asarray(
        scan_minima(db_t, sq, pen, q_bf, g_dev, int8dot=False))
    s_keep = 32
    agree = []
    for i in range(b):
        top_bf = set(np.argsort(m_bf[i])[:s_keep].tolist())
        top_i8 = set(np.argsort(m_i8[i])[:s_keep].tolist())
        agree.append(len(top_bf & top_i8) / s_keep)
    print(f"segment top-{s_keep} overlap int8-vs-bf16: "
          f"mean {np.mean(agree):.4f} min {np.min(agree):.4f}")

    # 3. one-process timed A/B (pipelined 8 deep, materialize to time) ---
    def bench(qq, int8dot, reps=3, depth=8):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [scan_minima(db_t, sq, pen, qq, g_dev, int8dot=int8dot)
                    for _ in range(depth)]
            np.asarray(outs[-1])
            dt = (time.perf_counter() - t0) / depth
            best = min(best, dt)
        return best

    bench(q_bf, False, reps=1, depth=2)   # warm both compiles
    bench(q_i8, True, reps=1, depth=2)
    t_bf = bench(q_bf, False)
    t_i8 = bench(q_i8, True)
    gbps = db_t.nbytes / 1e9
    print(f"bf16 dot: {t_bf*1e3:.2f} ms/pass ({gbps/t_bf:.0f} GB/s eff)")
    print(f"int8 dot: {t_i8*1e3:.2f} ms/pass ({gbps/t_i8:.0f} GB/s eff)")
    print(f"speedup: {t_bf/t_i8:.2f}x"
          f"  -> {'LAND IT' if t_bf/t_i8 >= 1.15 else 'not worth it'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
