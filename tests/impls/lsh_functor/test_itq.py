"""
ItqFunctor tests: geometric/recall invariants rather than bit-exact parity
(the device fit uses eigh + fori_loop; see SURVEY.md §7 "ITQ numerical
parity"), plus the reference's model-cache persistence patterns
(/root/reference/tests/impls/lsh_functor/test_itq.py:146-302).
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.data_element import DataMemoryElement
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.interfaces.lsh_functor import LshFunctor
from smqtk_indexing_tpu.models.lsh_functor.itq import ItqFunctor


def _elems(mat):
    return [DescriptorMemoryElement(i, row) for i, row in enumerate(mat)]


class TestItqFunctor:
    def test_plugin_discoverable(self):
        assert ItqFunctor in LshFunctor.get_impls()

    def test_configuration_roundtrip(self):
        f = ItqFunctor(bit_length=16, itq_iterations=11, normalize=2,
                       random_seed=3)
        for inst in configuration_test_helper(f):
            assert isinstance(inst, ItqFunctor)
            assert inst.bit_length == 16
            assert inst.itq_iterations == 11
            assert inst.normalize == 2
            assert inst.random_seed == 3

    def test_fit_empty_raises(self):
        with pytest.raises(ValueError):
            ItqFunctor(bit_length=4).fit([])

    def test_fit_dim_guard(self):
        # Descriptor dim must be >= bit_length (reference itq.py:326-330).
        mat = np.random.default_rng(0).normal(size=(10, 4))
        with pytest.raises(ValueError):
            ItqFunctor(bit_length=8).fit(_elems(mat))

    def test_fit_twice_raises(self):
        mat = np.random.default_rng(0).normal(size=(32, 16))
        f = ItqFunctor(bit_length=8, itq_iterations=5, random_seed=0)
        f.fit(_elems(mat))
        with pytest.raises(RuntimeError):
            f.fit(_elems(mat))

    def test_hash_requires_model(self):
        f = ItqFunctor(bit_length=8)
        with pytest.raises(RuntimeError):
            f.get_hash(np.zeros(16))

    def test_hash_shape_and_dtype(self):
        rng = np.random.default_rng(1)
        mat = rng.normal(size=(64, 32)).astype(np.float32)
        f = ItqFunctor(bit_length=16, itq_iterations=10, random_seed=0)
        f.fit(_elems(mat))
        h = f.get_hash(mat[0])
        assert h.shape == (16,)
        assert h.dtype == bool
        hb = f.get_hash_batch(mat[:5])
        assert hb.shape == (5, 16)
        assert np.array_equal(hb[0], h)

    def test_locality_preservation(self):
        # Clustered data: same-cluster pairs should agree on far more bits
        # than cross-cluster pairs.
        rng = np.random.default_rng(2)
        centers = rng.normal(size=(4, 64)) * 10
        pts = np.vstack([
            c + rng.normal(size=(50, 64)) for c in centers
        ]).astype(np.float32)
        f = ItqFunctor(bit_length=32, itq_iterations=30, random_seed=0)
        f.fit(_elems(pts))
        codes = f.get_hash_batch(pts)

        def mean_ham(a, b):
            return float((a[:, None, :] ^ b[None, :, :]).sum(-1).mean())

        same = np.mean([mean_ham(codes[i * 50:(i + 1) * 50],
                                 codes[i * 50:(i + 1) * 50])
                        for i in range(4)])
        cross = mean_ham(codes[:50], codes[50:100])
        assert same < cross

    def test_bit_balance(self):
        # ITQ on mean-centered data should produce roughly balanced bits.
        rng = np.random.default_rng(3)
        mat = rng.normal(size=(500, 64)).astype(np.float32)
        f = ItqFunctor(bit_length=16, itq_iterations=20, random_seed=1)
        f.fit(_elems(mat))
        codes = f.get_hash_batch(mat)
        frac = codes.mean(axis=0)
        assert np.all(frac > 0.2) and np.all(frac < 0.8)

    def test_model_cache_save_load(self):
        mv_cache = DataMemoryElement()
        rot_cache = DataMemoryElement()
        rng = np.random.default_rng(4)
        mat = rng.normal(size=(64, 32)).astype(np.float32)
        f = ItqFunctor(mean_vec_cache_elem=mv_cache,
                       rotation_cache_elem=rot_cache,
                       bit_length=8, itq_iterations=5, random_seed=0)
        f.fit(_elems(mat))
        assert not mv_cache.is_empty()
        assert not rot_cache.is_empty()

        f2 = ItqFunctor(mean_vec_cache_elem=mv_cache,
                        rotation_cache_elem=rot_cache,
                        bit_length=8)
        assert f2.has_model()
        assert np.array_equal(f2.get_hash_batch(mat),
                              f.get_hash_batch(mat))

    def test_normalize_option(self):
        rng = np.random.default_rng(5)
        mat = rng.normal(size=(64, 16)).astype(np.float32)
        f = ItqFunctor(bit_length=8, itq_iterations=5, normalize=2,
                       random_seed=0)
        f.fit(_elems(mat))
        # Scaling a vector must not change its hash under L2 normalization.
        h1 = f.get_hash(mat[0])
        h2 = f.get_hash(mat[0] * 100.0)
        assert np.array_equal(h1, h2)
