"""
Native (C++) host runtime tests: build/bindings, equivalence with the
pure-numpy paths, and the vec-file readers.
"""
import os
import tempfile

import numpy as np
import pytest

from smqtk_indexing_tpu import native
from smqtk_indexing_tpu.utils import bits as bits_util


def test_native_builds():
    # g++ is baked into the image; the build must succeed here.
    assert native.available(), "native library failed to build/load"


@pytest.mark.parametrize("bits", [8, 31, 64, 256])
def test_pack_matches_numpy(bits):
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 2, size=(17, bits)).astype(bool)
    np_packed = bits_util.pack_bit_vectors_u32(mat)
    na_packed = native.pack_bits(mat)
    assert np.array_equal(np_packed, na_packed)
    assert np.array_equal(native.unpack_bits(na_packed, bits), mat)


def test_hamming_topk_matches_bruteforce():
    rng = np.random.default_rng(1)
    n, bits, b, k = 200, 96, 5, 7
    codes = rng.integers(0, 2, size=(n, bits)).astype(bool)
    qs = rng.integers(0, 2, size=(b, bits)).astype(bool)
    db = bits_util.pack_bit_vectors_u32(codes)
    q = bits_util.pack_bit_vectors_u32(qs)
    valid = np.ones(n, dtype=bool)
    valid[3] = False

    dd, rr = native.hamming_topk(db, valid, q, k)
    ref = (qs[:, None, :] ^ codes[None, :, :]).sum(-1)
    ref[:, 3] = 1 << 30
    ref_sorted = np.sort(ref, axis=1)[:, :k]
    assert np.array_equal(dd, ref_sorted)
    assert not np.any(rr == 3)
    got = np.take_along_axis(ref, rr, axis=1)
    assert np.array_equal(got, dd)


def test_hamming_topk_underfilled():
    codes = np.array([[1, 0, 1, 0]], dtype=bool)
    db = bits_util.pack_bit_vectors_u32(codes)
    q = bits_util.pack_bit_vectors_u32(codes)
    dd, rr = native.hamming_topk(db, np.ones(1, bool), q, 3)
    assert rr[0, 0] == 0 and dd[0, 0] == 0
    assert list(rr[0, 1:]) == [-1, -1]


def test_read_fvecs_roundtrip():
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(10, 16)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.fvecs")
        with open(path, "wb") as f:
            for row in mat:
                f.write(np.int32(16).tobytes())
                f.write(row.tobytes())
        out = native.read_vecs(path, 10, 16)
        assert np.array_equal(out, mat)
        out5 = native.read_vecs(path, 5, 16)
        assert np.array_equal(out5, mat[:5])
        with pytest.raises(ValueError):
            native.read_vecs(path, 10, 8)


def test_read_bvecs_roundtrip():
    rng = np.random.default_rng(3)
    mat = rng.integers(0, 255, size=(6, 12)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.bvecs")
        with open(path, "wb") as f:
            for row in mat:
                f.write(np.int32(12).tobytes())
                f.write(row.tobytes())
        out = native.read_vecs(path, 10, 12)
        assert np.array_equal(out, mat.astype(np.float32))
