"""
TPU-scale exactness drives (the deep checks CPU tests cannot perform —
TPU matmul precision semantics differ; see CLAUDE.md):

1. Flat fused scan at 1M x 128: rows identical to float64 numpy truth.
2. IVF faithful nprobe at 1M: nn results == brute force over exactly the
   nearest original list's members (FAISS semantics, faiss.py:715-749).
3. SQ8 scan at 1M: distances match float64 over the DEQUANTIZED rows.
4. PQ scan: distances match float64 over the RECONSTRUCTED rows.
5. PQ 'code' tier (tiled ADC DMA kernel) at 256K, full probe: neighbor
   rows == float64 brute force over the reconstructions; exact-rerank
   distances match float64; score-mode agrees on the top-1 row.
6. RESIDUAL PQ code tier (pq_residual=True): same contract over the
   c_T[list] + r_hat reconstructions (per-probe offsets + the
   centroid-adding exact re-rank on chip).
7. SHARDED code tier (n_devices=8; virtual CPU mesh on one chip):
   results identical to the single-device capacity tier at 256K.
8. METRIC AXIS on the code tier (round 4): inner_product (sq8 + pq16)
   results AND distances match a float64 oracle over the decoded codes
   (score-mode IP is exact by construction — the zeroed-stats kernel
   score is -<q, x_hat-b>); cosine (sq8) ranking matches the float64
   angular oracle over the unit-sphere codes. The split-bf16 LUT/fold
   precision is TPU-only behavior — CPU interpret cannot regress it.
9. COSINE RESIDUAL PQ code tier (round 5): residual codes over
   unit-sphere rows + per-probe -2<q,c> offsets, ranking AND distances
   vs the float64 angular oracle over the reconstructions.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_exactness.py
Optional args select a subset of checks, e.g. `... verify_exactness.py 5 8`.
"""
from __future__ import annotations

import os
import sys
import time

# Check 7 builds an 8-device mesh; on the single-chip TPU box make_mesh
# falls back to the CPU host platform, which must be forced to 8 virtual
# devices BEFORE any jax backend initializes (backends are lazy — the
# sitecustomize only registers the plugin). Same pattern as
# __graft_entry__.dryrun_multichip.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

N, D, B, K = 1_000_000, 128, 64, 10


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax.numpy as jnp

    from smqtk_indexing_tpu.ops import sq8
    from smqtk_indexing_tpu.ops.device import capacity_for, pad_rows_np
    from smqtk_indexing_tpu.ops.pallas_scan import flat_topk_fused

    known = set(range(1, 10))
    sel = {int(a) for a in sys.argv[1:]} or known
    unknown = sel - known
    if unknown:
        sys.exit(f"unknown check id(s) {sorted(unknown)}; "
                 f"valid: {sorted(known)}")

    rng = np.random.default_rng(0)
    db = (rng.random((N, D), dtype=np.float32) * 218.0)
    q = (rng.random((B, D), dtype=np.float32) * 218.0)
    db_sq = np.einsum("ij,ij->i", db, db).astype(np.float32)

    import warnings
    from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
    from smqtk_indexing_tpu.models.nn_index.ivf import (
        IvfNearestNeighborsIndex,
    )
    q_elems = [DescriptorMemoryElement(f"q{i}", q[i]) for i in range(8)]
    cap = capacity_for(N)
    valid = np.zeros(cap, bool)
    valid[:N] = True

    if 1 in sel:
        # Float64 truth (needed by the flat check only — 64 x 1M f64).
        d2 = (q.astype(np.float64) ** 2).sum(1)[:, None] \
            + db_sq.astype(np.float64)[None, :] \
            - 2.0 * (q.astype(np.float64) @ db.astype(np.float64).T)
        truth_rows = np.argsort(d2, axis=1)[:, :K]
        _log("float64 truth computed")

        # 1. Flat fused.
        db_p = pad_rows_np(db, cap, D)
        sq_p = np.zeros(cap, np.float32)
        sq_p[:N] = db_sq
        dev = jnp.asarray(db_p)
        dev_t = jnp.asarray(np.ascontiguousarray(db_p.T))
        dd, rr = flat_topk_fused(dev, jnp.asarray(sq_p),
                                 jnp.asarray(valid),
                                 jnp.asarray(q), k=16, db_t=dev_t)
        got = np.asarray(rr)[:, :K]
        assert np.array_equal(got, truth_rows), \
            "flat fused rows != float64"
        _log("1. flat fused scan: rows identical to float64 at 1M OK")

    if 2 in sel:
        # 2. IVF faithful nprobe=1 (model level).
        idx = IvfNearestNeighborsIndex(n_lists=256, nprobe=1,
                                       kmeans_iterations=4, random_seed=0)
        idx.build_index([DescriptorMemoryElement(i, db[i])
                         for i in range(N)])
        cents = idx._centroids_np[:, :D]
        # The index's OWN assignment (list membership as built) by uid.
        assign = np.empty(N, np.int64)
        for row, uid in enumerate(idx._row2uid):
            assign[uid] = int(idx._assign_host[row])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = idx.nn_many(q_elems, K)
        for j, (e_list, _) in enumerate(res):
            c_near = int(np.argmin(((q[j][None, :] - cents) ** 2).sum(1)))
            members = np.where(assign == c_near)[0]
            dm = ((q[j][None].astype(np.float64)
                   - db[members].astype(np.float64)) ** 2).sum(1)
            expect = [int(members[i])
                      for i in np.argsort(dm)[:len(e_list)]]
            got_ids = [e.uuid() for e in e_list]
            assert got_ids == expect, (j, got_ids[:5], expect[:5])
        _log("2. IVF nprobe=1 == exact scan of the nearest list at 1M OK")

    if 3 in sel:
        # 3. SQ8 distances vs float64 over dequantized rows.
        a, bb = sq8.sq8_train(db)
        codes = np.zeros((cap, D), np.int8)
        codes[:N] = sq8.sq8_encode_np(db, a, bb)
        cj = jnp.asarray(codes)
        aj, bj = jnp.asarray(a), jnp.asarray(bb)
        s2, nrm = sq8.sq8_row_stats(cj, aj, bj)
        dd, rr = sq8.sq8_topk(cj, aj, bj, s2, nrm, jnp.asarray(valid),
                              jnp.asarray(q), k=16)
        got_r = np.asarray(rr)[:, :K]
        got_d = np.asarray(dd)[:, :K]
        deq = codes[got_r].astype(np.float64) * a + bb
        ref_d = np.sqrt(((deq - q[:, None, :].astype(np.float64)) ** 2)
                        .sum(-1))
        assert np.allclose(got_d, ref_d, atol=1e-3, rtol=1e-5), \
            np.abs(got_d - ref_d).max()
        _log("3. SQ8 distances exact vs float64 dequantized rows at 1M OK")

    from smqtk_indexing_tpu.ops import pq
    n_pq = min(262_144, N)   # N is module-level so smokes can shrink it

    if 4 in sel:
        # 4. PQ distances vs float64 reconstruction (smaller N: train).
        cbs = pq.pq_train(db[:n_pq], 16, n_iter=5)
        codes_pq = pq.pq_encode_np(db[:n_pq], cbs)
        s2p = pq.pq_row_stats(jnp.asarray(codes_pq), jnp.asarray(cbs))
        dd, rr = pq.pq_topk(jnp.asarray(codes_pq), jnp.asarray(cbs), s2p,
                            jnp.ones(n_pq, bool), jnp.asarray(q), k=16)
        got_r = np.asarray(rr)[:, :K]
        got_d = np.asarray(dd)[:, :K]
        rec = pq.pq_decode_np(codes_pq, cbs)
        sel_rows = rec[got_r].astype(np.float64)
        ref_d = np.sqrt(((sel_rows - q[:, None, :].astype(np.float64))
                         ** 2).sum(-1))
        assert np.allclose(got_d, ref_d, atol=1e-3, rtol=1e-5), \
            np.abs(got_d - ref_d).max()
        _log("4. PQ distances exact vs float64 reconstruction at 256K OK")

    if 5 in sel:
        # 5. PQ 'code' tier — the tiled ADC one-hot DMA kernel
        # (ops/pallas_ivf.ivf_query_dma_tiled_table_pq) at the model
        # level, full probe: winners must equal float64 brute force over
        # the codec reconstruction (the codec is the only loss).
        idx_pq = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="pq16", storage="code")
        idx_pq.build_index([DescriptorMemoryElement(i, db[i])
                            for i in range(n_pq)])
        _, _, perm = idx_pq._pq_grid()
        rec_t = pq.pq_decode_np(idx_pq._host, idx_pq._code_cb) \
            .astype(np.float64)
        uid_of_row = np.asarray(idx_pq._row2uid)
        q_c = np.zeros((B, len(perm)))
        q_c[:, :D] = q
        q_c = q_c[:, perm]
        d2_rec = (q_c ** 2).sum(1)[:, None] \
            + (rec_t ** 2).sum(1)[None, :] - 2.0 * (q_c @ rec_t.T)
        row_of_uid = {int(u): r for r, u in enumerate(uid_of_row)}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = idx_pq.nn_many(q_elems, K)
        for j, (e_list, dists) in enumerate(res):
            expect = {int(uid_of_row[r])
                      for r in np.argsort(d2_rec[j])[:K]}
            got_ids = [e.uuid() for e in e_list]
            # Row-set equality up to float64-vs-f32 near-ties in the
            # quantized distance field (>= 9/10 overlap at K=10).
            assert len(expect & set(got_ids)) >= K - 1, \
                (j, got_ids, expect)
            # Exact-rerank distances of the RETURNED rows must match
            # float64 over the reconstructions.
            ref_d = np.sqrt(np.maximum(
                d2_rec[j][[row_of_uid[u] for u in got_ids]], 0.0))
            assert np.allclose(dists, ref_d, atol=1e-2, rtol=1e-4), \
                np.abs(np.asarray(dists) - ref_d).max()
            assert list(dists) == sorted(dists), j
        idx_pq.rerank = "score"
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res_s = idx_pq.nn_many(q_elems, K)
        for j, (e_list, _) in enumerate(res_s):
            top5 = {int(uid_of_row[r])
                    for r in np.argsort(d2_rec[j])[:5]}
            assert e_list[0].uuid() in top5, j
        _log("5. PQ code tier (tiled ADC kernel) exact vs float64 at "
             "256K OK")

    if 6 in sel:
        # 6. RESIDUAL PQ code tier (pq_residual=True — FAISS
        # by_residual): same contract with the reconstruction now
        # c_T[list] + r_hat; the per-probe -2<q,c> offsets and the
        # centroid-adding exact re-rank must keep winners/distances
        # float64-exact on the real chip (the split-bf16 offset/LUT
        # interplay is invisible to CPU interpret).
        idx_res = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="pq16", storage="code", pq_residual=True)
        idx_res.build_index([DescriptorMemoryElement(i, db[i])
                             for i in range(n_pq)])
        _, _, perm_r = idx_res._pq_grid()
        cents_c = idx_res._pq_cents_codec(idx_res._code_rot) \
            .astype(np.float64)
        rec_r = pq.pq_decode_np(idx_res._host, idx_res._code_cb) \
            .astype(np.float64) + cents_c[idx_res._assign_host]
        uid_of_row = np.asarray(idx_res._row2uid)
        q_c = np.zeros((B, len(perm_r)))
        q_c[:, :D] = q
        q_c = q_c[:, perm_r]
        d2_rec = (q_c ** 2).sum(1)[:, None] \
            + (rec_r ** 2).sum(1)[None, :] - 2.0 * (q_c @ rec_r.T)
        row_of_uid = {int(u): r for r, u in enumerate(uid_of_row)}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = idx_res.nn_many(q_elems, K)
        for j, (e_list, dists) in enumerate(res):
            expect = {int(uid_of_row[r])
                      for r in np.argsort(d2_rec[j])[:K]}
            got_ids = [e.uuid() for e in e_list]
            assert len(expect & set(got_ids)) >= K - 1, \
                (j, got_ids, expect)
            ref_d = np.sqrt(np.maximum(
                d2_rec[j][[row_of_uid[u] for u in got_ids]], 0.0))
            assert np.allclose(dists, ref_d, atol=1e-2, rtol=1e-4), \
                np.abs(np.asarray(dists) - ref_d).max()
            assert list(dists) == sorted(dists), j
        _log("6. RESIDUAL PQ code tier exact vs float64 at 256K OK")

    if 7 in sel:
        # 7. SHARDED code tier (round 4): the 8-way mesh (virtual CPU
        # when only one real chip exists — make_mesh falls back) must
        # return the single-device results exactly: same codec, same
        # layout semantics, per-shard clipped scans + hierarchical merge.
        idx_sh = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="sq8", storage="code", n_devices=8)
        idx_sh.build_index([DescriptorMemoryElement(i, db[i])
                            for i in range(n_pq)])
        idx_1 = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="sq8", storage="code")
        idx_1.build_index([DescriptorMemoryElement(i, db[i])
                           for i in range(n_pq)])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res_sh = idx_sh.nn_many(q_elems, K)
            res_1 = idx_1.nn_many(q_elems, K)
        for j, ((e_s, d_s), (e_1, d_1)) in enumerate(zip(res_sh, res_1)):
            assert e_s[0].uuid() == e_1[0].uuid(), j
            assert np.allclose(d_s, d_1, atol=1e-3, rtol=1e-5), \
                (j, np.abs(np.asarray(d_s) - np.asarray(d_1)).max())
        _log("7. SHARDED code tier == single-device at 256K OK")

    if 8 in sel:
        # 8. METRIC AXIS on the code tier (round 4 — FAISS
        # METRIC_INNER_PRODUCT / normalized-cosine parity, reference
        # faiss.py:51-67): full-probe results vs a float64 oracle over
        # the DECODED codes under each metric. Run on the real chip —
        # the zeroed-stats IP fold and the split-bf16 ADC LUT are
        # TPU-precision behaviors interpret mode cannot regress.
        def _decoded(idx):
            if idx._pq_m(idx.dtype) is not None:
                return pq.pq_decode_np(idx._host, idx._code_cb) \
                    .astype(np.float64)
            return (idx._host.astype(np.float64) * idx._code_a
                    + idx._code_b)

        def _codec_q(idx, qv):
            if idx._pq_m(idx.dtype) is None:
                return qv.astype(np.float64)
            _, _, perm = idx._pq_grid()
            qc = np.zeros(len(perm))
            qc[:D] = qv
            return qc[perm]

        for dtype in ("sq8", "pq16"):
            idx_ip = IvfNearestNeighborsIndex(
                n_lists=64, nprobe=64, kmeans_iterations=4,
                random_seed=0, dtype=dtype, storage="code",
                metric="inner_product")
            idx_ip.build_index([DescriptorMemoryElement(i, db[i])
                                for i in range(n_pq)])
            db_rec = _decoded(idx_ip)
            uid_of_row = np.asarray(idx_ip._row2uid)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                res = idx_ip.nn_many(q_elems, K)
            for j, (e_list, dists) in enumerate(res):
                d_ref = -(db_rec @ _codec_q(idx_ip, q[j]))
                order = np.argsort(d_ref, kind="stable")[:K]
                expect = {int(uid_of_row[r]) for r in order}
                got_ids = [e.uuid() for e in e_list]
                assert len(expect & set(got_ids)) >= K - 1, \
                    (dtype, j, got_ids, sorted(expect))
                ref_d = d_ref[[int(np.where(uid_of_row == u)[0][0])
                               for u in got_ids]]
                # IP magnitudes here are ~1e5-1e6 (unnormalized 218-
                # scale rows) — bound relative to the score scale.
                scale = np.abs(ref_d).max()
                assert np.allclose(dists, ref_d, atol=3e-4 * scale), \
                    (dtype, j,
                     np.abs(np.asarray(dists) - ref_d).max(), scale)
                assert list(dists) == sorted(dists), (dtype, j)
            _log(f"8a. code-tier inner_product ({dtype}) exact vs "
                 "float64 decoded codes at 256K OK")

        idx_cos = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="sq8", storage="code", metric="cosine")
        idx_cos.build_index([DescriptorMemoryElement(i, db[i])
                             for i in range(n_pq)])
        db_rec = _decoded(idx_cos)   # ~unit-norm reconstructions
        uid_of_row = np.asarray(idx_cos._row2uid)
        nrm = np.linalg.norm(db_rec, axis=1)
        assert np.allclose(nrm, 1.0, atol=5e-2), \
            (nrm.min(), nrm.max())
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = idx_cos.nn_many(q_elems, K)
        for j, (e_list, dists) in enumerate(res):
            qn = q[j].astype(np.float64)
            qn = qn / np.linalg.norm(qn)
            sim = np.clip((db_rec @ qn) / np.where(nrm == 0, 1.0, nrm),
                          -1.0, 1.0)
            d_ref = 2.0 * np.arccos(sim) / np.pi
            order = np.argsort(d_ref, kind="stable")[:K]
            expect = {int(uid_of_row[r]) for r in order}
            got_ids = [e.uuid() for e in e_list]
            assert len(expect & set(got_ids)) >= K - 1, \
                (j, got_ids, sorted(expect))
            ref_d = d_ref[[int(np.where(uid_of_row == u)[0][0])
                           for u in got_ids]]
            assert np.allclose(dists, ref_d, atol=1e-2), \
                (j, np.abs(np.asarray(dists) - ref_d).max())
        _log("8b. code-tier cosine (sq8) == float64 angular oracle at "
             "256K OK")

    if 9 in sel:
        # 9. COSINE RESIDUAL PQ on the code tier (round 5): residual
        # codes over unit-sphere rows + the per-probe -2<q,c> offsets +
        # split-bf16 ADC, vs a float64 angular oracle over the index's
        # OWN reconstructions — all in the CODEC frame (the perm is
        # orthogonal, so norms/angles are identical there). On-chip
        # only: interpret mode folds the split-bf16 ADC dots.
        idx_cr = IvfNearestNeighborsIndex(
            n_lists=64, nprobe=64, kmeans_iterations=4, random_seed=0,
            dtype="pq16", storage="code", metric="cosine",
            pq_residual=True)
        idx_cr.build_index([DescriptorMemoryElement(i, db[i])
                            for i in range(n_pq)])
        assert idx_cr._cents_codec_dev is not None
        rec_c = pq.pq_decode_np(idx_cr._host, idx_cr._code_cb) \
            .astype(np.float64)
        rec_c += idx_cr._pq_cents_codec(None)[idx_cr._assign_host] \
            .astype(np.float64)
        nrm = np.linalg.norm(rec_c, axis=1)
        # PQ16 reconstructions of unit rows scatter wider than sq8's
        # (16-byte codec): sanity-band only.
        assert np.allclose(nrm, 1.0, atol=0.2), (nrm.min(), nrm.max())
        _, _, perm9 = idx_cr._pq_grid()
        uid_of_row = np.asarray(idx_cr._row2uid)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = idx_cr.nn_many(q_elems, K)
        for j, (e_list, dists) in enumerate(res):
            qc = np.zeros(len(perm9))
            qc[:D] = q[j]
            qc = qc[perm9]
            qc = qc / np.linalg.norm(qc)
            sim = np.clip((rec_c @ qc) / np.where(nrm == 0, 1.0, nrm),
                          -1.0, 1.0)
            d_ref = 2.0 * np.arccos(sim) / np.pi
            got_ids = [e.uuid() for e in e_list]
            ref_d = d_ref[[int(np.where(uid_of_row == u)[0][0])
                           for u in got_ids]]
            # Positive-quadrant data clusters EVERY angular distance
            # near one value, so near-tie swaps under the split-bf16
            # surrogate noise are expected well beyond one slot — the
            # robust contract is the DISTANCE BOUNDARY: every returned
            # id must sit within the true K-th distance + the surrogate
            # band, and reported distances must be exact w.r.t. the
            # reconstructions (gather re-rank).
            k_boundary = np.sort(d_ref)[K - 1]
            assert (ref_d <= k_boundary + 2e-3).all(), \
                (j, ref_d.max(), k_boundary)
            assert np.allclose(dists, ref_d, atol=1e-2), \
                (j, np.abs(np.asarray(dists) - ref_d).max())
        _log("9. code-tier COSINE RESIDUAL pq16 == float64 angular "
             "oracle over reconstructions at 256K OK")

    _log(f"EXACTNESS DRIVES PASSED: {sorted(sel)}")


if __name__ == "__main__":
    sys.exit(main())
