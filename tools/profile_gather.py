"""
Same-window A/B of the segment-gather kernels at the 100M serving shape
(the ~100 ms/batch winner-segment gather is why ``rerank="score"``
exists — docs/benchmarks.md Config 5b): per-step-barrier vs the
double-buffered cross-step prefetch (round 4).

Builds the 12.9GB tiled int8 corpus on device (gather timing does not
depend on data values), then times both kernels over identical random
segment ids at the ivf_100m finalize shape (B=1024, kk=24 -> 24K
scattered 16KB blocks) and the exhaustive-scan stage-2 shape
(B=128, s_keep=32). Reduces the gathered blocks to a (B,) checksum
INSIDE the jit — materializing 24K x 16KB through the ~20MB/s tunnel
would swamp the timing.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/profile_gather.py
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smqtk_indexing_tpu.ops.pallas_scan import SEG, _seg_gather_tiled

N = 65536 * 1536          # 100M rows
D = 128
TILE_N = 4096
PIPE = 8


@jax.jit
def _build(key):
    n_tiles = N // TILE_N
    keys = jax.random.split(key, n_tiles)

    def body(_, kk):
        return None, jax.random.randint(kk, (D, TILE_N), -127, 128,
                                        dtype=jnp.int8)

    _, codes = jax.lax.scan(body, None, keys)
    return codes


@partial(jax.jit, static_argnames=("prefetch",))
def _gather_sum(db3, sid, prefetch):
    blocks = _seg_gather_tiled(db3, sid, prefetch=prefetch)
    return jnp.sum(blocks.astype(jnp.int32), axis=(1, 2, 3))


def timed(label, db3, sid, prefetch):
    out = _gather_sum(db3, sid, prefetch)
    np.asarray(out)                                 # warm + compile
    t0 = time.perf_counter()
    outs = [_gather_sum(db3, sid, prefetch) for _ in range(PIPE)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / PIPE
    nblk = sid.shape[0] * sid.shape[1]
    gb = nblk * D * SEG / 1e9
    print(json.dumps({
        "kernel": label, "b": int(sid.shape[0]),
        "s_keep": int(sid.shape[1]), "batch_ms": round(dt * 1e3, 2),
        "eff_gbps": round(gb / dt, 1)}), flush=True)
    return dt


def main() -> None:
    assert jax.default_backend() != "cpu"
    db3 = _build(jax.random.PRNGKey(0))
    db3.block_until_ready()
    nseg = N // SEG
    rng = np.random.default_rng(0)
    for b, s_keep in ((1024, 24), (128, 32)):
        sid = jnp.asarray(
            rng.integers(0, nseg, size=(b, s_keep)).astype(np.int32))
        # Interleaved A/B/A/B: tunnel drift affects both arms equally.
        for rep in range(2):
            t_bar = timed("barrier", db3, sid, False)
            t_pf = timed("prefetch", db3, sid, True)
            print(json.dumps({
                "shape": [b, s_keep], "rep": rep,
                "speedup": round(t_bar / t_pf, 2)}), flush=True)


if __name__ == "__main__":
    main()
