"""
Stage breakdown of the 100M exhaustive tiled SQ8 scan (VERDICT round-3
item: close the gap from ~56 ms/batch toward the ~16 ms HBM light-speed
of one 12.9GB pass).

Builds the capacity corpus on device (random codes — stage timing does
not depend on data values), then times, each pipelined PIPE dispatches
deep (the tunnel's ~28 ms dispatch RTT otherwise dominates any
single-dispatch number):

  stage1      segment_minima_tiled alone (the 12.9GB streaming pass)
  stage1+sel  + topk_smallest over the (B, N/128) minima
  full        sq8_topk_blocked end to end (adds the segment DMA gather,
              candidate re-rank and final top-k)

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/profile_100m.py [tiles_per_step ...]
"""
from __future__ import annotations

import json
import sys
from functools import partial
import time

import jax
import jax.numpy as jnp
import numpy as np

from smqtk_indexing_tpu.ops import sq8
from smqtk_indexing_tpu.ops.pallas_scan import (
    segment_minima_tiled, topk_smallest,
)

CHUNK = 65536
N_CHUNKS = 1536
N = CHUNK * N_CHUNKS
D = 128
B = 128
K = 16
PIPE = 8


@jax.jit
def _build(key):
    n_tiles = N // 4096
    keys = jax.random.split(key, n_tiles)

    def body(_, kk):
        codes_t = jax.random.randint(kk, (D, 4096), -127, 128,
                                     dtype=jnp.int8)
        s2 = jnp.sum((codes_t.astype(jnp.float32) / 64.0) ** 2, axis=0)
        return None, (codes_t, s2)

    _, (codes, s2) = jax.lax.scan(body, None, keys)
    return codes, s2.reshape(N)


def timed(label, fn, *args, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(np.asarray, out)          # warm + compile
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(PIPE)]
    for o in outs:
        jax.tree_util.tree_map(np.asarray, o)
    dt = (time.perf_counter() - t0) / PIPE
    print(json.dumps({"stage": label, "batch_ms": round(dt * 1e3, 2),
                      "qps": round(B / dt, 1)}), flush=True)
    return dt


def main() -> None:
    assert jax.default_backend() != "cpu"
    a = jnp.full((D,), 1.0 / 64.0, jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    codes, s2 = _build(jax.random.PRNGKey(0))
    s2.block_until_ready()
    valid = jnp.ones((N,), bool)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    t = q * a[None, :]
    sq_row = s2.reshape(1, N)
    pen = jnp.zeros((1, N), jnp.float32)

    tps_list = [int(x) for x in sys.argv[1:]] or [8]
    for tps in tps_list:
        # Reduce the (B, N/128) minima to (B,) INSIDE the jit: 8
        # pipelined 403MB outputs OOM beside the 12.9GB codes, and
        # materializing them through the ~20MB/s tunnel would swamp the
        # timing anyway.
        @partial(jax.jit, static_argnames=("tiles_per_step",))
        def stage1_sum(codes, sq_row, pen, t, tiles_per_step):
            return jnp.min(segment_minima_tiled(
                codes, sq_row, pen, t,
                tiles_per_step=tiles_per_step), axis=1)

        timed(f"stage1_tps{tps}", stage1_sum, codes, sq_row,
              pen, t, tiles_per_step=tps)

    @jax.jit
    def stage1_blockmin(codes, sq_row, pen, t):
        # Isolate the blocked first reduce (includes the full-width
        # transpose the minima layout forces) from the top_k itself.
        minima = segment_minima_tiled(codes, sq_row, pen, t)
        return jnp.min(minima.reshape(B, -1, 128), axis=2)

    timed("stage1+blockmin", stage1_blockmin, codes, sq_row, pen, t)

    @jax.jit
    def stage1_sel(codes, sq_row, pen, t):
        minima = segment_minima_tiled(codes, sq_row, pen, t)
        return topk_smallest(minima, K + 16, blk=128)

    timed("stage1+sel", stage1_sel, codes, sq_row, pen, t)

    # Cumulative stages of the ACTUAL serving path (sq8_topk_blocked
    # tiled mode): dual-output kernel -> step-major hierarchical
    # selection -> Pallas DMA candidate gather -> surrogate rescore ->
    # exact decode re-rank. Each stage reduces its outputs to tiny
    # checksums IN-JIT (tunnel + HBM discipline as above).
    from smqtk_indexing_tpu.ops.pallas_scan import (
        SEG, seg_gather_tiled, segment_minima_tiled2,
        topk_segments_stepmajor,
    )
    s_keep = K + 16

    @jax.jit
    def s1_dual(codes, sq_row, pen, t):
        m1, m2 = segment_minima_tiled2(codes, sq_row, pen, t)
        return jnp.min(m1, axis=(0, 2)), jnp.min(m2, axis=(0, 2))

    timed("s1_dual", s1_dual, codes, sq_row, pen, t)

    @jax.jit
    def s1_stepsel(codes, sq_row, pen, t):
        m1, m2 = segment_minima_tiled2(codes, sq_row, pen, t)
        return topk_segments_stepmajor(m1, m2, s_keep)

    timed("s1+stepsel", s1_stepsel, codes, sq_row, pen, t)

    @jax.jit
    def s1_gather(codes, sq_row, pen, t):
        m1, m2 = segment_minima_tiled2(codes, sq_row, pen, t)
        smin, sid = topk_segments_stepmajor(m1, m2, s_keep)
        blk = seg_gather_tiled(codes, jnp.maximum(sid, 0))
        return smin, jnp.sum(blk.astype(jnp.int32), axis=(1, 2, 3))

    timed("s1+sel+gather", s1_gather, codes, sq_row, pen, t)

    @jax.jit
    def s1_rescore(codes, sq_row, pen, t):
        m1, m2 = segment_minima_tiled2(codes, sq_row, pen, t)
        smin, sid = topk_segments_stepmajor(m1, m2, s_keep)
        sid_c = jnp.maximum(sid, 0)
        cand_blk = seg_gather_tiled(codes, sid_c)
        m_rows = s_keep * SEG
        cand = jnp.transpose(cand_blk, (0, 1, 3, 2)).reshape(B, m_rows, D)
        ip = jnp.einsum("bmd,bd->bm", cand.astype(jnp.bfloat16),
                        t.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        s = jnp.take(sq_row.reshape(-1, SEG), sid_c, axis=0) \
            .reshape(B, m_rows) - 2.0 * ip
        return topk_smallest(s, K + 8)

    timed("s1+sel+gather+rescore", s1_rescore, codes, sq_row, pen, t)
    timed("full", sq8.sq8_topk_blocked, codes, a, b, s2, valid, q, k=K)


if __name__ == "__main__":
    main()
