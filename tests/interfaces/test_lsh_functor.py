"""LshFunctor interface contract tests (dummy subclass pattern, reference
tests/interfaces style)."""
import numpy as np

from smqtk_indexing_tpu.interfaces.lsh_functor import LshFunctor


class DummyFunctor (LshFunctor):
    @classmethod
    def is_usable(cls):
        return True

    def get_config(self):
        return {}

    def get_hash(self, descriptor):
        return np.asarray(descriptor) > 0


def test_call_aliases_get_hash():
    f = DummyFunctor()
    v = np.array([1.0, -1.0, 2.0])
    assert np.array_equal(f(v), f.get_hash(v))


def test_default_batch_loops_get_hash():
    f = DummyFunctor()
    mat = np.array([[1.0, -1.0], [-2.0, 3.0]])
    out = f.get_hash_batch(mat)
    assert out.shape == (2, 2)
    assert np.array_equal(out, mat > 0)


def test_batch_accepts_single_row():
    f = DummyFunctor()
    out = f.get_hash_batch(np.array([1.0, -1.0]))
    assert out.shape == (1, 2)
