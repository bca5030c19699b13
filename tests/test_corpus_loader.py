"""End-to-end real-corpus hook: $SMQTK_TPU_DATA -> bench_all._load_or_make.

Drives the exact path a user takes to benchmark on TexMex corpora
(docs/benchmarks.md: "drop .fvecs files in $SMQTK_TPU_DATA") against
committed real-format fixtures (tests/data/tiny_*.fvecs|bvecs), checksummed
so fixture corruption cannot silently pass, through BOTH the native C++
reader and the numpy fallback.
"""
import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
SHA = {
    "tiny_base.fvecs":
        "d5efbdd96af09026417073276b6bc131510b812fdf5ae77ec6c8073ee0c774f7",
    "tiny_query.fvecs":
        "f2a4889e79befd8eb87726f884fccfe70e4457cca1b032f76191130394c6dcfe",
    "tiny_base.bvecs":
        "7521840a2ce11ba85ecba4535e63742874b5338676904de4af901bbaf6e6aa1e",
}


@pytest.fixture(scope="module")
def expected():
    for name, want in SHA.items():
        with open(os.path.join(DATA, name), "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == want, f"fixture {name} corrupted"
    return np.load(os.path.join(DATA, "tiny_expected.npy"),
                   allow_pickle=True).item()


@pytest.fixture(params=["native", "numpy"])
def native_mode(request, monkeypatch):
    import smqtk_indexing_tpu.native as native
    if request.param == "numpy":
        monkeypatch.setenv("SMQTK_TPU_NO_NATIVE", "1")
    # Reset the memoized handle so the env flag takes effect per-param.
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    yield request.param
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)


def test_load_or_make_uses_real_corpus(monkeypatch, expected, native_mode):
    import bench_all
    monkeypatch.setenv("SMQTK_TPU_DATA", DATA)
    db, q, label = bench_all._load_or_make(
        "tiny_base.fvecs", n=64, d=16, scale=1.0, seed=0, nq=8)
    assert label == "tiny_base.fvecs"
    # The companion *_query.fvecs must be picked up as held-out queries.
    np.testing.assert_array_equal(db, expected["base"])
    np.testing.assert_array_equal(q, expected["query"])


def test_load_or_make_holds_out_tail_without_query_file(
        monkeypatch, expected, native_mode, tmp_path):
    import bench_all
    import shutil
    shutil.copy(os.path.join(DATA, "tiny_base.fvecs"),
                tmp_path / "solo_base.fvecs")
    monkeypatch.setenv("SMQTK_TPU_DATA", str(tmp_path))
    db, q, _ = bench_all._load_or_make(
        "solo_base.fvecs", n=64, d=16, scale=1.0, seed=0, nq=8)
    np.testing.assert_array_equal(db, expected["base"][:-8])
    np.testing.assert_array_equal(q, expected["base"][-8:])


def test_load_or_make_synthetic_fallback(monkeypatch):
    import bench_all
    monkeypatch.setenv("SMQTK_TPU_DATA", "")
    db, q, label = bench_all._load_or_make(
        "absent_base.fvecs", n=128, d=8, scale=1.0, seed=0, nq=8)
    assert label == "synthetic" and db.shape == (128, 8) and q.shape == (8, 8)


def test_read_vecs_fvecs_and_bvecs(expected, native_mode):
    from smqtk_indexing_tpu import native
    mat = native.read_vecs(os.path.join(DATA, "tiny_base.fvecs"), 64, 16)
    np.testing.assert_array_equal(mat, expected["base"])
    # Truncated reads honor max_n.
    mat8 = native.read_vecs(os.path.join(DATA, "tiny_base.fvecs"), 8, 16)
    np.testing.assert_array_equal(mat8, expected["base"][:8])
    b = native.read_vecs(os.path.join(DATA, "tiny_base.bvecs"), 32, 16)
    np.testing.assert_array_equal(b, expected["bvecs"].astype(np.float32))


def test_read_vecs_dim_mismatch_raises(native_mode):
    from smqtk_indexing_tpu import native
    with pytest.raises(ValueError):
        native.read_vecs(os.path.join(DATA, "tiny_base.fvecs"), 64, 24)
