"""Quick full-path profile after the cohort stage-2 rewrite."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from smqtk_indexing_tpu.ops.pallas_scan import SEG, flat_topk_fused

N, D, B, K = 1 << 20, 128, 1024, 16
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
db = rng.normal(size=(N, D)).astype(np.float32)
sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
q = rng.normal(size=(B, D)).astype(np.float32)

db_dev = jnp.asarray(db)
db_t = jnp.asarray(np.ascontiguousarray(db.T))
db_sq = jnp.asarray(sq)
valid = jnp.ones(N, dtype=bool)
q_dev = jnp.asarray(q)
db_seg_lo = db_dev.astype(jnp.bfloat16).reshape(N // SEG, SEG, D)
np.asarray(db_seg_lo[0, 0, :2])
print("uploaded", flush=True)

base_fn = jax.jit(lambda c: c + 1.0)
np.asarray(base_fn(0.0))
t0 = time.perf_counter()
for _ in range(4):
    c = base_fn(0.0)
np.asarray(c)
BASE = (time.perf_counter() - t0) / 4
print(f"dispatch baseline {BASE*1e3:.1f} ms", flush=True)


def timeit(name, body, args, R=10):
    def prog(c0, *a):
        return jax.lax.fori_loop(0, R, lambda i, c: body(c, *a), c0)
    pj = jax.jit(prog)
    np.asarray(pj(0.0, *args))
    t0 = time.perf_counter()
    np.asarray(pj(0.0, *args))
    dt = (time.perf_counter() - t0 - BASE) / R * 1e3
    print(f"{name:46s} {dt:8.2f} ms  ({B/dt*1e3:,.0f} qps)", flush=True)


def tiny(x):
    return x.ravel()[0].astype(jnp.float32) * 1e-38


def full(prec, use_lo, margin=16):
    def body(c, db_, sq_, va_, q_, dt_, *rest):
        sl = rest[0] if rest else None
        return tiny(flat_topk_fused(db_, sq_, va_, q_ + c, k=K, db_t=dt_,
                                    db_seg_lo=sl, precision=prec,
                                    rerank_margin=margin)[0])
    return body

A = (db_dev, db_sq, valid, q_dev, db_t)
AL = A + (db_seg_lo,)
timeit("FULL split3 + bf16-cohort stage2", full("split3", True), AL, R=12)
timeit("FULL native + bf16-cohort stage2", full("native", True), AL, R=12)
timeit("FULL split3 + bf16-cohort margin48", full("split3", True, 48), AL,
       R=12)
timeit("FULL split3 + f32 stage2", full("split3", False), A, R=6)

# exactness checks
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
print(f"rows split3-vs-highest: {(r_new == r_old).mean():.6f}", flush=True)
print(f"rows native-vs-highest: {(r_nat == r_old).mean():.6f}", flush=True)
d2 = ((q[:64, None, :].astype(np.float64)
       - db[None, :, :].astype(np.float64)) ** 2).sum(-1)
gt = np.argsort(d2, axis=1)[:, :K]
for nm, r in (("split3+bf16", r_new), ("highest+f32", r_old),
              ("native+bf16", r_nat)):
    rec = np.mean([len(set(r[i]) & set(gt[i])) / K for i in range(64)])
    print(f"recall@16 vs float64 [{nm}]: {rec:.4f}", flush=True)
print("done", flush=True)
