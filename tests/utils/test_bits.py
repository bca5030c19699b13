import numpy as np
import pytest

from smqtk_indexing_tpu.utils.bits import (
    bit_vector_to_int_large,
    int_to_bit_vector_large,
    ints_to_packed_u32,
    pack_bit_vectors_u32,
    packed_u32_to_ints,
    unpack_bit_vectors_u32,
)


def _reference_shift_accumulate(v) -> int:
    c = 0
    for b in v:
        c = (c << 1) + int(b)
    return c


class TestBitVectorIntConversion:

    def test_matches_shift_accumulate_semantics(self) -> None:
        rng = np.random.default_rng(42)
        for bits in (1, 7, 8, 9, 63, 64, 65, 128, 256, 300):
            v = rng.random(bits) > 0.5
            assert bit_vector_to_int_large(v) == \
                _reference_shift_accumulate(v)

    def test_big_endian_bit0_is_msb(self) -> None:
        v = np.zeros(8, dtype=bool)
        v[0] = True
        assert bit_vector_to_int_large(v) == 128

    def test_nonbool_positive_values_count_as_one(self) -> None:
        assert bit_vector_to_int_large(np.array([2, 0, 5])) == 5  # 101

    def test_roundtrip(self) -> None:
        rng = np.random.default_rng(7)
        for bits in (1, 31, 32, 33, 256):
            v = rng.random(bits) > 0.5
            i = bit_vector_to_int_large(v)
            assert np.array_equal(int_to_bit_vector_large(i, bits), v)

    def test_int_to_vector_minimal_width(self) -> None:
        assert np.array_equal(int_to_bit_vector_large(5),
                              np.array([True, False, True]))
        # Zero is representable in one bit.
        assert np.array_equal(int_to_bit_vector_large(0),
                              np.array([False]))

    def test_int_to_vector_too_small_raises(self) -> None:
        with pytest.raises(ValueError):
            int_to_bit_vector_large(256, bits=8)

    def test_large_int_beyond_64_bits(self) -> None:
        i = (1 << 200) | 1
        v = int_to_bit_vector_large(i)
        assert len(v) == 201
        assert bit_vector_to_int_large(v) == i


class TestPackedU32:

    def test_pack_unpack_roundtrip(self) -> None:
        rng = np.random.default_rng(3)
        for bits in (8, 32, 33, 64, 100, 256):
            m = rng.random((5, bits)) > 0.5
            p = pack_bit_vectors_u32(m)
            assert p.dtype == np.uint32
            assert p.shape == (5, (bits + 31) // 32)
            assert np.array_equal(unpack_bit_vectors_u32(p, bits), m)

    def test_ints_roundtrip(self) -> None:
        rng = np.random.default_rng(5)
        bits = 96
        m = rng.random((4, bits)) > 0.5
        ints = [bit_vector_to_int_large(r) for r in m]
        p = ints_to_packed_u32(ints, bits)
        assert packed_u32_to_ints(p, bits) == ints
        assert np.array_equal(p, pack_bit_vectors_u32(m))

    def test_hamming_preserved_by_packing(self) -> None:
        rng = np.random.default_rng(9)
        bits = 77
        a = rng.random(bits) > 0.5
        b = rng.random(bits) > 0.5
        pa = pack_bit_vectors_u32(a[None])
        pb = pack_bit_vectors_u32(b[None])
        word_ham = bin(int.from_bytes((pa ^ pb).tobytes(), "little")) \
            .count("1")
        assert word_ham == int(np.sum(a != b))


def test_bit_matrix_to_ints_matches_scalar():
    import numpy as np
    from smqtk_indexing_tpu.utils.bits import (
        bit_matrix_to_ints, bit_vector_to_int_large,
    )
    rng = np.random.default_rng(0)
    for bits in (1, 7, 8, 33, 100, 256):
        mat = rng.integers(0, 2, size=(13, bits)).astype(bool)
        batch = bit_matrix_to_ints(mat)
        scalar = [bit_vector_to_int_large(r) for r in mat]
        assert batch == scalar
