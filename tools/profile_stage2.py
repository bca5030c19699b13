"""Profile the fused flat-scan variants on the real TPU.

Methodology: each measured op runs R times inside ONE jitted fori_loop
(single dispatch, carry-chained). Big arrays must be ARGUMENTS of the
jitted program (closures become HLO constants and overflow the
remote-compile tunnel).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from smqtk_indexing_tpu.ops.pallas_scan import (
    SEG, segment_minima, flat_topk_fused, topk_smallest)

N, D, B, K = 1 << 20, 128, 1024, 16
S_KEEP = K + 8

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
db = rng.normal(size=(N, D)).astype(np.float32)
sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
q = rng.normal(size=(B, D)).astype(np.float32)

t0 = time.perf_counter()
db_dev = jnp.asarray(db)
db_t = jnp.asarray(np.ascontiguousarray(db.T))
db_sq1 = jnp.asarray(sq).reshape(1, N)
db_sq = jnp.asarray(sq)
pen = jnp.zeros((1, N), jnp.float32)
valid = jnp.ones(N, dtype=bool)
q_dev = jnp.asarray(q)
db_seg_lo = db_dev.astype(jnp.bfloat16).reshape(N // SEG, SEG, D)
db_seg32 = db_dev.reshape(N // SEG, SEG, D)
np.asarray(db_seg_lo[0, 0, :2])
print(f"upload {time.perf_counter()-t0:.1f}s", flush=True)

base_fn = jax.jit(lambda c: c + 1.0)
np.asarray(base_fn(0.0))
t0 = time.perf_counter()
for _ in range(4):
    c = base_fn(0.0)
np.asarray(c)
BASE = (time.perf_counter() - t0) / 4
print(f"dispatch baseline {BASE*1e3:.1f} ms", flush=True)


def timeit(name, body, args, R=10):
    """body(carry, *args) -> new carry (f32 scalar, must consume carry)."""
    def prog(c0, *a):
        return jax.lax.fori_loop(0, R, lambda i, c: body(c, *a), c0)
    pj = jax.jit(prog)
    np.asarray(pj(0.0, *args))  # compile + run
    t0 = time.perf_counter()
    np.asarray(pj(0.0, *args))
    dt = (time.perf_counter() - t0 - BASE) / R * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)


def tiny(x):
    return x.ravel()[0].astype(jnp.float32) * 1e-38

# stage 1 variants
for prec, R in (("native", 16), ("split3", 10), ("highest", 4)):
    timeit(f"stage1 {prec}",
           lambda c, dt_, sq_, pe_, q_, p=prec: tiny(
               segment_minima(dt_, sq_, pe_, q_ + c, precision=p)),
           (db_t, db_sq1, pen, q_dev), R=R)

minima = segment_minima(db_t, db_sq1, pen, q_dev, precision="split3")
np.asarray(minima[0, :2])
timeit("topk_a lax.top_k (B,8192)->24",
       lambda c, m: tiny(jax.lax.top_k(-(m + c), S_KEEP)[0]),
       (minima,), R=16)
timeit("topk_a topk_smallest (B,8192)->24",
       lambda c, m: tiny(topk_smallest(m + c, S_KEEP)[0]),
       (minima,), R=16)

sid = topk_smallest(minima, S_KEEP)[1]
np.asarray(sid[0, :2])
timeit("gather f32 segments (1.6GB)",
       lambda c, dbs, s: tiny(
           jnp.take(dbs, s + jnp.int32(c > 1.0), axis=0).astype(jnp.float32)),
       (db_seg32, sid), R=6)
timeit("gather bf16 segments (0.8GB)",
       lambda c, dbs, s: tiny(
           jnp.take(dbs, s + jnp.int32(c > 1.0), axis=0).astype(jnp.float32)),
       (db_seg_lo, sid), R=6)

# full paths
def full(prec, seg_lo):
    def body(c, db_, sq_, va_, q_, dt_, *rest):
        sl = rest[0] if rest else None
        return tiny(flat_topk_fused(db_, sq_, va_, q_ + c, k=K, db_t=dt_,
                                    db_seg_lo=sl, precision=prec)[0])
    return body

timeit("FULL old (highest + f32 stage2)", full("highest", False),
       (db_dev, db_sq, valid, q_dev, db_t), R=4)
timeit("FULL split3 + f32 stage2", full("split3", False),
       (db_dev, db_sq, valid, q_dev, db_t), R=6)
timeit("FULL split3 + bf16 stage2", full("split3", True),
       (db_dev, db_sq, valid, q_dev, db_t, db_seg_lo), R=10)
timeit("FULL native + bf16 stage2", full("native", True),
       (db_dev, db_sq, valid, q_dev, db_t, db_seg_lo), R=10)

# exactness vs float64 + vs highest
d_new, r_new = flat_topk_fused(db_dev, db_sq, valid, q_dev, k=K,
                               db_t=db_t, db_seg_lo=db_seg_lo,
                               precision="split3")
r_new = np.asarray(r_new)
d_old, r_old = flat_topk_fused(db_dev, db_sq, valid, q_dev, k=K,
                               db_t=db_t, precision="highest")
r_old = np.asarray(r_old)
d_nat, r_nat = flat_topk_fused(db_dev, db_sq, valid, q_dev, k=K,
                               db_t=db_t, db_seg_lo=db_seg_lo,
                               precision="native")
r_nat = np.asarray(r_nat)
print(f"row agreement split3-vs-highest: {(r_new == r_old).mean():.6f}",
      flush=True)
print(f"row agreement native-vs-highest: {(r_nat == r_old).mean():.6f}",
      flush=True)
d2 = ((q[:64, None, :].astype(np.float64)
       - db[None, :, :].astype(np.float64)) ** 2).sum(-1)
gt = np.argsort(d2, axis=1)[:, :K]
for nm, r in (("split3+bf16", r_new), ("highest+f32", r_old),
              ("native+bf16", r_nat)):
    rec = np.mean([len(set(r[i]) & set(gt[i])) / K for i in range(64)])
    print(f"recall@16 vs float64 [{nm}]: {rec:.4f}", flush=True)
print("done", flush=True)
