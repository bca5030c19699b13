"""Per-cell coverage of the IVF supported-configuration matrix.

Every (metric x dtype x storage x rerank x devices x residual) cell is
checked against models/nn_index/ivf.validate_ivf_combination — rejected
cells must raise with the documented reason, and a representative grid of
accepted cells is BUILT and QUERIED end-to-end so no supported
combination exists only on paper. Reference surface being covered: FAISS
factory codecs 'IVF<n>,{Flat,SQ8,PQ<M>}' (+ OPQ pre-transform, +
by_residual) — /root/reference/smqtk_indexing/impls/nn_index/faiss.py:182-199.
"""
import itertools

import numpy as np
import pytest

from smqtk_indexing_tpu.data.descriptor import (
    DescriptorMemoryElement, MemoryDescriptorSet,
)
from smqtk_indexing_tpu.models.nn_index.ivf import (
    IvfNearestNeighborsIndex, validate_ivf_combination,
)

METRICS = ("euclidean", "inner_product", "cosine")
DTYPES = ("float32", "bfloat16", "sq8", "pq4", "opq4")
STORAGES = ("rows", "code")
RERANKS = ("exact", "score")
DEVICES = (None, 8)
RESIDUALS = (False, True)


def _expected_ok(metric, dtype, storage, rerank, n_devices, residual):
    """Independent restatement of the support matrix (the test oracle)."""
    is_pq = dtype in ("pq4", "opq4")
    if residual:
        if not is_pq:
            return False
        # euclidean: both tiers; cosine: code tier only (unit-sphere
        # codes); inner_product: never (round 5).
        if metric == "inner_product":
            return False
        if metric == "cosine" and storage != "code":
            return False
    if storage == "code" and dtype in ("float32", "bfloat16"):
        return False
    return True


ALL_CELLS = list(itertools.product(METRICS, DTYPES, STORAGES, RERANKS,
                                   DEVICES, RESIDUALS))


@pytest.mark.parametrize(
    "metric,dtype,storage,rerank,n_devices,residual", ALL_CELLS)
def test_matrix_cell_validation(metric, dtype, storage, rerank, n_devices,
                                residual):
    ok = _expected_ok(metric, dtype, storage, rerank, n_devices, residual)
    if ok:
        validate_ivf_combination(metric, dtype, storage, rerank,
                                 n_devices, residual)
    else:
        with pytest.raises(ValueError):
            validate_ivf_combination(metric, dtype, storage, rerank,
                                     n_devices, residual)


@pytest.mark.parametrize("bad_kw", [
    dict(metric="hamming"),
    dict(dtype="pq4x12"),
    dict(storage="tiles"),
    dict(rerank="none"),
])
def test_unknown_values_rejected(bad_kw):
    kw = dict(metric="euclidean", dtype="float32", storage="rows",
              rerank="exact", n_devices=None, pq_residual=False)
    kw.update(bad_kw if "pq_residual" in bad_kw else bad_kw)
    with pytest.raises(ValueError):
        validate_ivf_combination(kw["metric"], kw["dtype"], kw["storage"],
                                 kw["rerank"], kw["n_devices"],
                                 kw["pq_residual"])


# ---------------------------------------------------------------------------
# End-to-end build+query of a representative accepted-cell grid: every
# distinct serving path (metric variants on rows; each codec; the code
# tier incl. sharded; residual; score-mode) runs for real.
# ---------------------------------------------------------------------------

BUILD_CELLS = (
    # rows tier, every metric x codec (single device)
    [("rows", dt, m, None, "exact", False)
     for dt in DTYPES for m in METRICS]
    # rows tier sharded (one per codec family)
    + [("rows", dt, "euclidean", 8, "exact", False)
       for dt in ("float32", "sq8", "pq4")]
    # capacity tier, single + sharded
    + [("code", dt, "euclidean", nd, "exact", False)
       for dt in ("sq8", "pq4", "opq4") for nd in (None, 8)]
    # capacity tier metric axis (round 4): IP/cosine through the tiled
    # kernels, single + sharded, both finalizations
    + [("code", dt, m, nd, rr, False)
       for dt in ("sq8", "pq4") for m in ("inner_product", "cosine")
       for nd in (None, 8) for rr in ("exact", "score")]
    # residual cells (incl. sharded residual on BOTH tiers)
    + [("rows", "pq4", "euclidean", None, "exact", True),
       ("rows", "pq4", "euclidean", 8, "exact", True),
       ("code", "pq4", "euclidean", None, "exact", True),
       ("code", "pq4", "euclidean", 8, "exact", True)]
    # cosine residual (round 5): code tier only, single + sharded,
    # both finalizations
    + [("code", "pq4", "cosine", nd, rr, True)
       for nd in (None, 8) for rr in ("exact", "score")]
    + [("code", "opq4", "cosine", None, "exact", True)]
    # score-mode finalization on the tiled tier
    + [("code", "sq8", "euclidean", None, "score", False)]
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(400, 24)).astype(np.float32)
    els = []
    for i, v in enumerate(vecs):
        e = DescriptorMemoryElement(i)
        e.set_vector(v)
        els.append(e)
    return els, vecs


@pytest.mark.parametrize(
    "storage,dtype,metric,n_devices,rerank,residual", BUILD_CELLS)
def test_supported_cell_builds_and_queries(storage, dtype, metric,
                                           n_devices, rerank, residual,
                                           corpus):
    els, vecs = corpus
    idx = IvfNearestNeighborsIndex(
        descriptor_set=MemoryDescriptorSet(), n_lists=4, nprobe=4,
        metric=metric, dtype=dtype, storage=storage, rerank=rerank,
        n_devices=n_devices, pq_residual=residual, random_seed=0)
    idx.build_index(els)
    res = idx.nn(els[17], 5)
    assert len(res[0]) == 5
    # Lossy codecs can demote the self-match on tiny random data only in
    # extreme cases; everywhere it must at least be in the result set for
    # exhaustive probing of a 400-point corpus.
    got = [e.uuid() for e in res[0]]
    assert 17 in got, (storage, dtype, metric, got)
    if dtype in ("float32", "bfloat16"):
        assert got[0] == 17
