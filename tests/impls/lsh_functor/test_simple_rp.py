"""SimpleRPFunctor tests (reference test_simple_rp.py patterns)."""
import numpy as np
import pytest

from smqtk_indexing_tpu.core.configuration import configuration_test_helper
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.interfaces.lsh_functor import LshFunctor
from smqtk_indexing_tpu.models.lsh_functor.simple_rp import SimpleRPFunctor


def _elems(mat):
    return [DescriptorMemoryElement(i, row) for i, row in enumerate(mat)]


class TestSimpleRPFunctor:
    def test_plugin_discoverable(self):
        assert SimpleRPFunctor in LshFunctor.get_impls()

    def test_configuration_roundtrip(self):
        f = SimpleRPFunctor(bit_length=16, normalize=2, random_seed=9)
        for inst in configuration_test_helper(f):
            assert isinstance(inst, SimpleRPFunctor)
            assert inst.bit_length == 16
            assert inst.normalize == 2
            assert inst.random_seed == 9

    def test_fit_and_hash(self):
        rng = np.random.default_rng(0)
        mat = rng.normal(size=(32, 24)).astype(np.float32)
        f = SimpleRPFunctor(bit_length=8, random_seed=0)
        f.fit(_elems(mat))
        h = f.get_hash(mat[0])
        assert h.shape == (8,)
        assert h.dtype == bool
        assert np.array_equal(f.get_hash_batch(mat[:3])[0], h)

    def test_hash_without_model_raises(self):
        with pytest.raises(RuntimeError):
            SimpleRPFunctor().get_hash(np.zeros(8))

    def test_fit_empty_raises(self):
        with pytest.raises(ValueError):
            SimpleRPFunctor().fit([])

    def test_deterministic_with_seed(self):
        rng = np.random.default_rng(1)
        mat = rng.normal(size=(16, 12)).astype(np.float32)
        f1 = SimpleRPFunctor(bit_length=8, random_seed=42)
        f2 = SimpleRPFunctor(bit_length=8, random_seed=42)
        f1.fit(_elems(mat))
        f2.fit(_elems(mat))
        assert np.array_equal(f1.get_hash_batch(mat), f2.get_hash_batch(mat))
