"""
IVF-SQ8 at 100M vectors on one chip — the capacity configuration that
actually serves a corpus this size (the reference composes it as FAISS
'IVF16384,SQ8', /root/reference/smqtk_indexing/impls/nn_index/faiss.py:190,
368-386, with query-time ``ivf_nprobe`` :715-749).

Everything happens ON DEVICE (the tunnel moves ~20MB/s; a 12.9GB upload is
infeasible):

1. k-means trains 16384 coarse centroids on a 1M-row sample
   (ops/kmeans.kmeans_lloyd).
2. The corpus ingests in 16 chunks of ~6.3M rows, two passes per chunk:
   pass 1 generates rows and records their nearest-centroid assignment;
   pass 2 REGENERATES them in assignment-sorted order (deterministic
   per-row PRNG keyed by global row id — sorting 6.3M rows by gathering a
   768MB int8 block would transiently double the chunk, regeneration
   costs only FLOPs) and emits (d, 4096) tile-transposed int8 SQ8 code
   tiles straight into the donated 12.9GB buffer. No relayout of the big
   array ever happens.
3. build_tiled_csr records each (chunk, list) run as virtual sublists cut
   at the DMA window cap and tile boundaries; build_slot_table maps
   originals -> sublists for the faithful probe selection.
4. Held-out queries (fresh mixture draws, never inserted) get ground
   truth from the EXHAUSTIVE tiled SQ8 scan over the same buffer
   (ops/sq8.sq8_topk_blocked — the on-chip oracle, also the QPS baseline
   the IVF path must beat 10x), then the nprobe sweep runs through
   ops/pallas_ivf.ivf_query_dma_tiled_table with rerank="score"
   (distances straight from the kernel surrogate — the winner-segment
   gather measured ~100 ms/batch at B=1024, and the surrogate's
   cancellation bound sits well below the codec step).
5. PQ16 phase (skip: SMQTK_IVF100M_NO_PQ=1): the SQ8 buffer is freed and
   the SAME corpus (identical row ids -> identical data and k-means
   assignments) rebuilds as (n_tiles, 16, 4096) uint8 PQ codes —
   **1.6 GB for 100M vectors**, the ~800M-vectors/chip ceiling — served
   by the in-kernel ADC one-hot MXU scan
   (ops/pallas_ivf.ivf_query_dma_tiled_table_pq). Encoding is RESIDUAL
   by default (FAISS by_residual, as in the reference's
   'IVF16384,PQ16'): codes carry x - centroid(list), so the codec only
   quantizes the intra-cell noise (SIGMA) — SMQTK_IVF100M_RAW_PQ=1
   restores raw-row encoding, whose codec-limited recall on this
   mixture is documented in docs/benchmarks.md Config 3. Recall is
   reported against the same held-out float-data oracle truth.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    examples/ivf_100m.py

Scale knobs (round 5): SMQTK_IVF100M_CHUNKS=<n> sets the corpus size in
~6.29M-row chunks; SMQTK_IVF100M_NO_SQ8=1 skips the SQ8 phase (REQUIRED
above ~20 chunks — int8-per-dim needs N bytes of HBM; the PQ tier is
~N/8); SMQTK_IVF100M_OPQ=1 adds the OPQ rotation. examples/ivf_400m.py
presets these for the 402.7M capacity demonstration.
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os

#: SMQTK_IVF100M_MINI=1 shrinks every scale knob ~1000x so the identical
#: program (build passes, CSR, kernels in interpret mode) smoke-runs on
#: CPU in under a minute.
MINI = bool(os.environ.get("SMQTK_IVF100M_MINI"))
if MINI:
    # The JAX_PLATFORMS env var is overridden by the axon sitecustomize;
    # force CPU here so the mini smoke-run never claims (or hangs on)
    # the real chip.
    jax.config.update("jax_platforms", "cpu")

D = 128
TILE = 4096
#: SMQTK_IVF100M_CHUNKS scales the corpus (each chunk ~6.29M rows):
#: 16 -> 100.7M (the SQ8+PQ demo), 64 -> 402.7M (the PQ capacity
#: demonstration, examples/ivf_400m.py — SQ8 no longer fits HBM there,
#: so SMQTK_IVF100M_NO_SQ8=1 must accompany CHUNKS > 20).
N_CHUNKS = int(os.environ.get("SMQTK_IVF100M_CHUNKS", "4" if MINI
                              else "16"))
TILES_PER_CHUNK = 4 if MINI else 1536
CHUNK = TILES_PER_CHUNK * TILE           # 6,291,456 at full scale
N = N_CHUNKS * CHUNK                     # 100,663,296 at 16 chunks
#: Skip the 12.9GB-resident SQ8 phase (exhaustive oracle + IVF-SQ8
#: sweep): list lengths then come from an assignment-only pass and the
#: PQ phase's truth is the wide-probe ADC oracle alone. REQUIRED above
#: ~20 chunks (the SQ8 buffer would exceed HBM).
SKIP_SQ8 = bool(os.environ.get("SMQTK_IVF100M_NO_SQ8"))
C_LISTS = 64 if MINI else 16384
#: Human label for metric names ("100m", "403m", ...).
LBL = f"{round(N / 1e6)}m" if not MINI else "mini"
L_GEN = C_LISTS                          # generation mixture components
SIGMA = 0.25
A_SCALE = 1.0 / 16.0                     # codec: x ~= a*u, b = 0
SUB = 4096                               # generation substep rows
TRAIN_ROWS = (1 << 14) if MINI else (1 << 20)
KM_ITERS = 4 if MINI else 8
B = 32 if MINI else 128                  # query batch
K = 16
INTERP = MINI                            # Pallas interpret mode on CPU

_KEY = jax.random.PRNGKey(42)
_CKEY = jax.random.PRNGKey(7)

M_PQ = 16                                # PQ subquantizers
DSUB = D // M_PQ                         # 8 dims per subspace
PQ_PHASE = not bool(os.environ.get("SMQTK_IVF100M_NO_PQ"))
#: Residual encoding (FAISS by_residual — the default here as there):
#: PQ quantizes x - centroid(list), so the codec only carries the
#: intra-cell noise (SIGMA) instead of the full mixture geometry.
#: SMQTK_IVF100M_RAW_PQ=1 restores raw-row encoding for the A/B.
RESIDUAL_PQ = not bool(os.environ.get("SMQTK_IVF100M_RAW_PQ"))
#: SMQTK_IVF100M_OPQ=1 learns an OPQ rotation (ops/opq.opq_train on the
#: residualized training sample) and encodes (x - c) @ R — the
#: 'OPQ16,IVF16384,PQ16' factory configuration at capacity scale. On
#: this near-iid mixture the rotation is close to identity (OPQ's win
#: is on correlated data, docs Config 3b); it is exercised here to
#: demonstrate the full capacity pipeline.
OPQ_ROT = os.environ.get("SMQTK_IVF100M_OPQ", "") not in ("", "0")


def _gen_rows(centers: jnp.ndarray, row_ids: jnp.ndarray) -> jnp.ndarray:
    """Deterministic per-row generation keyed by GLOBAL row id, so pass 2
    can regenerate any row in any order: mixture component via a Knuth
    multiplicative hash of the id, noise via a folded-in PRNG key."""
    cidx = (row_ids.astype(jnp.uint32) * jnp.uint32(2654435761)
            % jnp.uint32(L_GEN)).astype(jnp.int32)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(_KEY, row_ids)
    noise = jax.vmap(lambda k: jax.random.normal(k, (D,)))(keys)
    return centers[cidx] + noise * SIGMA


@jax.jit
def _make_centers() -> jnp.ndarray:
    return jax.random.normal(_CKEY, (L_GEN, D), jnp.float32)


@jax.jit
def _train_sample(centers: jnp.ndarray) -> jnp.ndarray:
    """1M training rows: CONTIGUOUS corpus ids (real rows). Strided ids
    are a trap here — ids sharing a factor f alias the multiplicative
    component hash to gcd-limited residues (measured: stride 96 made the
    sample cover only 512 of 16384 mixture components, k-means then left
    497K-row mega-lists); consecutive ids hash uniformly."""

    def body(_, si):
        ids = si * SUB + jnp.arange(SUB, dtype=jnp.int32)
        return None, _gen_rows(centers, ids)

    _, rows = jax.lax.scan(body, None,
                           jnp.arange(TRAIN_ROWS // SUB, dtype=jnp.int32))
    return rows.reshape(TRAIN_ROWS, D)


@partial(jax.jit, donate_argnums=(0, 1))
def _ingest_chunk(big, s2big, cents, centers, ci):
    """One chunk: assign (pass 1), argsort, sorted regeneration into
    tile-transposed int8 (pass 2), write into the donated buffers.
    Returns per-list row counts for the host-side CSR build."""
    base = ci * CHUNK
    order, _, lens = _assign_order(cents, centers, base)

    def gen_body(_, ti):
        src = jax.lax.dynamic_slice(order, (ti * TILE,), (TILE,))
        rows = _gen_rows(centers, base + src)            # (TILE, D)
        u = jnp.clip(jnp.rint(rows / A_SCALE), -127, 127)
        codes_t = u.astype(jnp.int8).T                   # (D, TILE)
        s2 = jnp.sum((A_SCALE * u) ** 2, axis=-1)        # (TILE,)
        return None, (codes_t, s2)

    _, (tiles, s2rows) = jax.lax.scan(
        gen_body, None, jnp.arange(TILES_PER_CHUNK, dtype=jnp.int32))
    big = jax.lax.dynamic_update_slice(
        big, tiles, (ci * TILES_PER_CHUNK, 0, 0))
    s2big = jax.lax.dynamic_update_slice(
        s2big, s2rows.reshape(TILES_PER_CHUNK, 1, TILE),
        (ci * TILES_PER_CHUNK, 0, 0))
    return big, s2big, lens


def _assign_order(cents: jnp.ndarray, centers: jnp.ndarray,
                  base: jnp.ndarray):
    """Pass-1 assignment + stable sort of one chunk (shared by the SQ8
    and PQ ingests — identical row ids generate identical rows, so both
    layouts sort rows into the same list order and the PQ pass reuses
    the SQ8-built CSR verbatim). Returns (sort order, per-list counts).
    precision=HIGHEST: bf16-truncated assignment would desync from the
    f32 query-time probe ranking near cell boundaries."""
    c_sq = jnp.sum(cents * cents, axis=-1)

    def assign_body(_, si):
        ids = base + si * SUB + jnp.arange(SUB, dtype=jnp.int32)
        rows = _gen_rows(centers, ids)
        ip = jnp.dot(rows, cents.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return None, jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1) \
            .astype(jnp.int32)

    _, asg = jax.lax.scan(assign_body, None,
                          jnp.arange(CHUNK // SUB, dtype=jnp.int32))
    asg = asg.reshape(CHUNK)
    order = jnp.argsort(asg, stable=True).astype(jnp.int32)
    lens = jax.ops.segment_sum(jnp.ones_like(asg), asg,
                               num_segments=C_LISTS)
    return order, asg, lens


@partial(jax.jit, donate_argnums=(0, 1))
def _ingest_chunk_pq(bigp, s2bigp, cents, cb, cb_sq, centers, ci,
                     rot=None):
    """PQ counterpart of :func:`_ingest_chunk`: same assignment/sort
    (the CSR built by the SQ8 pass is reused verbatim), rows encode to
    (M, TILE) uint8 code tiles (bit-reinterpreted int8 — the kernel's
    DMA dtype) + per-row reconstruction norms.

    ``rot``: optional (D, D) OPQ rotation — encoding happens in the
    rotated codec space (enc = (x - c) @ R), stats are rotation
    invariant only through the full reconstruction, so ``xhat`` is
    assembled in codec space (c @ R + r_hat)."""
    base = ci * CHUNK
    order, asg, _ = _assign_order(cents, centers, base)

    def gen_body(_, ti):
        src = jax.lax.dynamic_slice(order, (ti * TILE,), (TILE,))
        rows = _gen_rows(centers, base + src)            # (TILE, D)
        if RESIDUAL_PQ:
            asg_t = jnp.take(asg, src)                   # (TILE,)
            c_rows = jnp.take(cents, asg_t, axis=0)      # (TILE, D)
            enc = rows - c_rows
        else:
            enc = rows
        if rot is not None:
            enc = jnp.dot(enc, rot,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        rs = enc.reshape(TILE, M_PQ, DSUB)
        ip = jnp.einsum("tms,mvs->tmv", rs, cb,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = cb_sq[None, :, :] - 2.0 * ip                # (TILE, M, 256)
        codes = jnp.argmin(d2, axis=2)                   # (TILE, M) int32
        if RESIDUAL_PQ:
            # Full reconstruction norms ||c_T + r_hat||^2 in CODEC space:
            # decode r_hat (16 tiny gathers) and add the (rotated)
            # centroid back — the stats form the residual serving score
            # needs.
            rhat = jnp.concatenate(
                [jnp.take(cb[mi], codes[:, mi], axis=0)
                 for mi in range(M_PQ)], axis=1)         # (TILE, D)
            c_codec = c_rows if rot is None else jnp.dot(
                c_rows, rot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            xhat = c_codec + rhat
            s2 = jnp.sum(xhat * xhat, axis=-1)           # (TILE,)
        else:
            s2 = jnp.sum(jnp.take_along_axis(
                jnp.broadcast_to(cb_sq[None], (TILE, M_PQ, 256)),
                codes[..., None], axis=2)[..., 0], axis=1)
        codes_t = jax.lax.bitcast_convert_type(
            codes.astype(jnp.uint8), jnp.int8).T         # (M, TILE)
        return None, (codes_t, s2)

    _, (tiles, s2rows) = jax.lax.scan(
        gen_body, None, jnp.arange(TILES_PER_CHUNK, dtype=jnp.int32))
    bigp = jax.lax.dynamic_update_slice(
        bigp, tiles, (ci * TILES_PER_CHUNK, 0, 0))
    s2bigp = jax.lax.dynamic_update_slice(
        s2bigp, s2rows.reshape(TILES_PER_CHUNK, 1, TILE),
        (ci * TILES_PER_CHUNK, 0, 0))
    return bigp, s2bigp


@jax.jit
def _chunk_lens_only(cents, centers, ci):
    """Assignment-only pass for SKIP_SQ8 builds: per-list row counts of
    one chunk (the CSR needs lengths, not codes)."""
    _, _, lens = _assign_order(cents, centers, ci * CHUNK)
    return lens


def main() -> None:
    assert MINI or jax.default_backend() != "cpu", \
        "full-scale demo needs a real accelerator (12.9GB resident codes)"
    assert SKIP_SQ8 or N_CHUNKS <= 20, \
        "SQ8 needs N bytes of HBM — set SMQTK_IVF100M_NO_SQ8=1 above " \
        "~20 chunks (the PQ capacity tier is the point at that scale)"
    from smqtk_indexing_tpu.ops import sq8
    from smqtk_indexing_tpu.ops.kmeans import kmeans_lloyd
    from smqtk_indexing_tpu.ops.pallas_ivf import (
        build_slot_table, build_tiled_csr, ivf_query_dma_tiled_table,
    )

    emit = lambda **kw: print(json.dumps(kw), flush=True)  # noqa: E731

    centers = _make_centers()
    t0 = time.perf_counter()
    sample = _train_sample(centers)
    cents, _ = kmeans_lloyd(sample, jnp.ones(TRAIN_ROWS, bool),
                            sample[:C_LISTS], n_iter=KM_ITERS)
    cents.block_until_ready()
    del sample
    train_s = time.perf_counter() - t0
    emit(metric=f"ivf16384_{LBL}_kmeans_train_wall",
         value=round(train_s, 1), unit="s", train_rows=TRAIN_ROWS,
         n_lists=C_LISTS)

    t0 = time.perf_counter()
    chunk_lens = np.zeros((N_CHUNKS, C_LISTS), np.int64)
    if SKIP_SQ8:
        # Assignment-only build pass: the CSR needs per-(chunk, list)
        # lengths; the PQ ingest below regenerates + encodes the rows.
        for ci in range(N_CHUNKS):
            chunk_lens[ci] = np.asarray(
                _chunk_lens_only(cents, centers, jnp.int32(ci)))
        big = s2big = None
        emit(metric=f"ivf16384_{LBL}_assign_pass_wall",
             value=round(time.perf_counter() - t0, 1), unit="s", rows=N)
    else:
        big = jnp.zeros((N_CHUNKS * TILES_PER_CHUNK, D, TILE), jnp.int8)
        s2big = jnp.zeros((N_CHUNKS * TILES_PER_CHUNK, 1, TILE),
                          jnp.float32)
        for ci in range(N_CHUNKS):
            big, s2big, lens = _ingest_chunk(big, s2big, cents, centers,
                                             jnp.int32(ci))
            chunk_lens[ci] = np.asarray(lens)
        emit(metric=f"ivf16384_{LBL}_build_wall",
             value=round(time.perf_counter() - t0, 1),
             unit="s", rows=N,
             hbm_gb=round((N * D + N * 4) / 2 ** 30, 2))
    assert chunk_lens.sum() == N

    chunk_bases = np.arange(N_CHUNKS, dtype=np.int64) * CHUNK
    v_tile, v_col, v_len, v_orig, first_virt = build_tiled_csr(
        chunk_lens, chunk_bases)
    table = build_slot_table(v_orig, C_LISTS)
    emit(metric=f"ivf16384_{LBL}_layout", value=len(v_len),
         unit="sublists",
         s_max=int(table.shape[1]),
         mean_sublist_rows=round(float(v_len.mean()), 1),
         max_list_rows=int(chunk_lens.sum(0).max()))
    v_tile_d = jnp.asarray(v_tile)
    v_col_d = jnp.asarray(v_col)
    v_len_d = jnp.asarray(v_len)
    table_d = jnp.asarray(table)

    # Held-out queries: fresh mixture draws (never inserted — corpus rows
    # are keyed by row id; these use an independent host RNG). B queries
    # carry ground truth; B_LARGE amortize fixed costs for the serving
    # row.
    b_large = 8 * B
    rng = np.random.default_rng(123)
    centers_np = np.asarray(centers)
    q_np = (centers_np[rng.integers(0, L_GEN, b_large)]
            + rng.normal(size=(b_large, D)) * SIGMA).astype(np.float32)
    qd = jnp.asarray(q_np[:B])
    qd_large = jnp.asarray(q_np)
    a_vec = jnp.full((D,), A_SCALE, jnp.float32)
    b_vec = jnp.zeros((D,), jnp.float32)

    # Exhaustive oracle over the SAME tiled buffer: ground truth + the
    # QPS baseline the IVF path must beat.
    truth = None
    reps = 3
    if not SKIP_SQ8:
        s2_rows = s2big.reshape(N)
        valid = jnp.ones((N,), bool)
        t0 = time.perf_counter()
        dd_o, rr_o = sq8.sq8_topk_blocked(big, a_vec, b_vec, s2_rows,
                                          valid, qd, k=K,
                                          interpret=INTERP)
        truth = np.asarray(rr_o)[:, :10]
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            dd_o, rr_o = sq8.sq8_topk_blocked(big, a_vec, b_vec, s2_rows,
                                              valid, qd, k=K,
                                              interpret=INTERP)
        np.asarray(rr_o)
        exh_dt = (time.perf_counter() - t0) / reps
        exh_qps = B / exh_dt
        emit(metric=f"sq8_{LBL}_exhaustive_scan_b128",
             value=round(exh_qps, 1),
             unit="queries/s", batch_ms=round(exh_dt * 1e3, 1),
             cold_incl_compile_s=round(cold, 1))

    # The exhaustive oracle cannot run B_LARGE at all (its (B, N/128)
    # segment-minima buffer alone is 3.2GB at B=1024) — serving large
    # batches at 100M is only possible through the IVF tier, so the
    # amortized-row speedup compares against the exhaustive scan's own
    # best (B=128) figure.
    # nprobe sweep stops at 16: recall is 1.0 from nprobe=4 on this
    # mixture, and at B=1024/nprobe=32 the statically-unrolled batch
    # chunks' score transients exceed the ~2.5GB HBM slack beside the
    # 12.9GB corpus (measured 409MB over).
    for nprobe in () if SKIP_SQ8 else (2, 4, 8, 16):
        run = partial(ivf_query_dma_tiled_table, big, s2big, a_vec,
                      b_vec, cents, table_d, v_tile_d, v_col_d, v_len_d,
                      qd, k=K, nprobe_orig=nprobe, interpret=INTERP,
                      rerank="score")
        t0 = time.perf_counter()
        dd, rr = run()
        got = np.asarray(rr)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            dd, rr = run()
        got = np.asarray(rr)[:, :10]
        dt = (time.perf_counter() - t0) / reps
        recall = float(np.mean([
            len(set(g.tolist()) & set(t.tolist())) / 10.0
            for g, t in zip(got, truth)]))
        run_l = partial(ivf_query_dma_tiled_table, big, s2big, a_vec,
                        b_vec, cents, table_d, v_tile_d, v_col_d,
                        v_len_d, qd_large, k=K, nprobe_orig=nprobe,
                        interpret=INTERP, rerank="score")
        dd, rr = run_l()
        np.asarray(rr)
        t0 = time.perf_counter()
        for _ in range(reps):
            dd, rr = run_l()
        np.asarray(rr)
        dt_l = (time.perf_counter() - t0) / reps
        emit(metric=f"ivf16384_sq8_{LBL}_nprobe{nprobe}",
             value=round(B / dt, 1), unit="queries/s",
             recall_at_10=round(recall, 4),
             batch_ms=round(dt * 1e3, 2),
             qps_b1024=round(b_large / dt_l, 1),
             batch_ms_b1024=round(dt_l * 1e3, 2),
             speedup_vs_exhaustive_b1024=round(
                 (b_large / dt_l) / exh_qps, 1),
             speedup_vs_exhaustive=round((B / dt) / exh_qps, 1),
             cold_incl_compile_s=round(cold, 1))

    if not PQ_PHASE:
        return

    # ---- PQ16 phase: N vectors in N*16 bytes ----------------------------
    # Free the SQ8 buffer first when it exists (regeneration makes the
    # corpus free to rebuild); the CSR/table stay valid (same
    # assignments).
    from smqtk_indexing_tpu.ops.kmeans import kmeans_lloyd
    from smqtk_indexing_tpu.ops.pallas_ivf import (
        ivf_query_dma_tiled_table_pq,
    )
    if not SKIP_SQ8:
        del s2_rows, valid, dd_o, rr_o, dd, rr
    del big, s2big

    t0 = time.perf_counter()
    sample = _train_sample(centers)
    if RESIDUAL_PQ:
        # Codebooks train on RESIDUALS (x - assigned centroid) — the
        # distribution the codes will actually carry.
        @jax.jit
        def _residualize(s, c):
            c_sq = jnp.sum(c * c, axis=-1)

            def body(_, si):
                blk = jax.lax.dynamic_slice(s, (si * SUB, 0), (SUB, D))
                ip = jnp.dot(blk, c.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                a = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=1)
                return None, blk - jnp.take(c, a, axis=0)

            _, res = jax.lax.scan(
                body, None,
                jnp.arange(TRAIN_ROWS // SUB, dtype=jnp.int32))
            return res.reshape(TRAIN_ROWS, D)

        sample = _residualize(sample, cents)
    rot_d = None
    if OPQ_ROT:
        # Learn the rotation + codebooks together on the (residualized)
        # host sample (ops/opq.opq_train subsamples internally); encode
        # and serve in the rotated codec space.
        from smqtk_indexing_tpu.ops.opq import opq_train
        rot_np, cb_np = opq_train(np.asarray(sample), M_PQ)
        rot_d = jnp.asarray(rot_np)
        cb = jnp.asarray(cb_np)
        del sample
    else:
        v_all = jnp.ones(TRAIN_ROWS, bool)
        cbs = []
        for m in range(M_PQ):
            sub = jnp.asarray(sample[:, m * DSUB:(m + 1) * DSUB])
            cb_m, _ = kmeans_lloyd(sub, v_all, sub[:256],
                                   n_iter=KM_ITERS)
            cbs.append(cb_m)
        cb = jnp.stack(cbs)                          # (M, 256, DSUB)
        cb.block_until_ready()
        del sample, v_all
    emit(metric=f"pq16_{LBL}_train_wall",
         value=round(time.perf_counter() - t0, 1), unit="s",
         subspaces=M_PQ, dsub=DSUB, residual=RESIDUAL_PQ, opq=OPQ_ROT)

    t0 = time.perf_counter()
    cb_sq = jnp.sum(cb * cb, axis=-1)                # (M, 256)
    bigp = jnp.zeros((N_CHUNKS * TILES_PER_CHUNK, M_PQ, TILE), jnp.int8)
    s2bigp = jnp.zeros((N_CHUNKS * TILES_PER_CHUNK, 1, TILE), jnp.float32)
    for ci in range(N_CHUNKS):
        bigp, s2bigp = _ingest_chunk_pq(bigp, s2bigp, cents, cb, cb_sq,
                                        centers, jnp.int32(ci),
                                        rot=rot_d)
    bigp.block_until_ready()
    emit(metric=f"pq16_{LBL}_build_wall",
         value=round(time.perf_counter() - t0, 1), unit="s", rows=N,
         hbm_gb=round((N * M_PQ + N * 4) / 2 ** 30, 2))

    # Identity dim interleave: D divides M_PQ evenly, codebooks trained
    # on contiguous subspaces of the ORIGINAL grid — the wrapper's perm
    # arg is arange, or the (D, D) OPQ rotation when learned (queries
    # and probe centroids transform inside the wrapper). Residual mode
    # hands the wrapper the CODEC-SPACE centroid table (score-mode
    # finalization needs no row->list map — only the per-probe -2<q,c>
    # offsets).
    perm = rot_d if rot_d is not None else jnp.arange(D, dtype=jnp.int32)
    if RESIDUAL_PQ:
        res_c = cents if rot_d is None else jnp.dot(
            cents, rot_d, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        res_c = None
    # ADC oracle: a wide-probe scan over the SAME codes separates list-
    # coverage loss (the IVF tier's own contribution) from codec loss
    # (recall vs the float oracle, flat across nprobe when codec-bound).
    # The probe-slot budget is nprobe * s_max: cap it near 2048 slots —
    # at 64 chunks s_max is 128 and an 8192-slot kernel program blew the
    # remote compiler (measured: scoped-VMEM/register spills, HTTP 500).
    # The slot budget WINS over the 16-probe floor: at skewed builds
    # where s_max > 128 the old max(16, ...) re-inflated nprobe*s_max
    # past the ~4K-slot compiler limit this cap exists for.
    oracle_np = min(64, max(1, 2048 // int(table.shape[1])))
    _, rr_adc = ivf_query_dma_tiled_table_pq(
        bigp, s2bigp, cb, perm, cents, table_d, v_tile_d, v_col_d,
        v_len_d, qd, k=K, nprobe_orig=oracle_np, interpret=INTERP,
        rerank="score", res_cents=res_c)
    truth_adc = np.asarray(rr_adc)[:, :10]
    for nprobe in (2, 4, 8, 16):
        run = partial(ivf_query_dma_tiled_table_pq, bigp, s2bigp, cb,
                      perm, cents, table_d, v_tile_d, v_col_d, v_len_d,
                      qd, k=K, nprobe_orig=nprobe, interpret=INTERP,
                      rerank="score", res_cents=res_c)
        t0 = time.perf_counter()
        dd, rr = run()
        got = np.asarray(rr)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            dd, rr = run()
        got = np.asarray(rr)[:, :10]
        dt = (time.perf_counter() - t0) / reps
        # Recall vs the float-data oracle (the SQ8 exhaustive truth —
        # exists only when the SQ8 phase ran): includes PQ16's codec
        # loss on this near-iid mixture — the honest capacity-tier
        # tradeoff, not a pipeline defect. At SKIP_SQ8 scales the ADC
        # oracle (wide-probe scan over the same codes) is the coverage
        # check.
        recall = None if truth is None else float(np.mean([
            len(set(g.tolist()) & set(t.tolist())) / 10.0
            for g, t in zip(got, truth)]))
        recall_adc = float(np.mean([
            len(set(g.tolist()) & set(t.tolist())) / 10.0
            for g, t in zip(got, truth_adc)]))
        run_l = partial(ivf_query_dma_tiled_table_pq, bigp, s2bigp, cb,
                        perm, cents, table_d, v_tile_d, v_col_d,
                        v_len_d, qd_large, k=K, nprobe_orig=nprobe,
                        interpret=INTERP, rerank="score",
                        res_cents=res_c)
        dd, rr = run_l()
        np.asarray(rr)
        t0 = time.perf_counter()
        for _ in range(reps):
            dd, rr = run_l()
        np.asarray(rr)
        dt_l = (time.perf_counter() - t0) / reps
        emit(metric=f"ivf16384_pq16_{LBL}_nprobe{nprobe}",
             value=round(B / dt, 1), unit="queries/s",
             residual=RESIDUAL_PQ, opq=OPQ_ROT, rows=N,
             recall_at_10_vs_float_oracle=(
                 None if recall is None else round(recall, 4)),
             recall_at_10_vs_adc_oracle=round(recall_adc, 4),
             batch_ms=round(dt * 1e3, 2),
             qps_b1024=round(b_large / dt_l, 1),
             batch_ms_b1024=round(dt_l * 1e3, 2),
             cold_incl_compile_s=round(cold, 1))


if __name__ == "__main__":
    main()
