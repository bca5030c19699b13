"""parallel_map ecosystem shim (utils/parallel.py).

Covers the reference call-site shapes
(/root/reference/smqtk_indexing/impls/nn_index/lsh.py:507-509,
mrpt.py:260-264): positional zip of ordered results, multiple sequences,
the use_multiprocessing compatibility kwarg, and unordered mode.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.utils.parallel import parallel_map


def test_ordered_positional_alignment():
    # The mrpt.py:260 pattern: results assigned positionally into a
    # preallocated array.
    vecs = [np.full(4, i, dtype=np.float32) for i in range(50)]

    class El:
        def __init__(self, v):
            self._v = v

        def vector(self):
            return self._v

    els = [El(v) for v in vecs]
    out = np.empty((50, 4), dtype=np.float32)
    out[:] = list(parallel_map(lambda d_: d_.vector(), els))
    np.testing.assert_array_equal(out, np.stack(vecs))


def test_multiple_sequences():
    assert list(parallel_map(lambda a, b: a - b, [5, 9], [1, 2])) == [4, 7]


def test_lazy_iterator():
    it = parallel_map(lambda x: x + 1, range(5))
    assert next(it) == 1


def test_use_multiprocessing_downgrades_with_warning():
    with pytest.warns(UserWarning, match="threads"):
        res = list(parallel_map(lambda x: x * x, [1, 2, 3],
                                use_multiprocessing=True))
    assert res == [1, 4, 9]


def test_unordered_returns_all():
    got = sorted(parallel_map(lambda x: x * 2, range(20), ordered=False))
    assert got == [2 * i for i in range(20)]


def test_compat_kwargs_ignored():
    assert list(parallel_map(str, [1], cores=2, buffer_factor=2.0,
                             name="x", heart_beat=0.1)) == ["1"]


def test_worker_exception_propagates():
    def boom(x):
        raise RuntimeError("inner")

    with pytest.raises(RuntimeError, match="inner"):
        list(parallel_map(boom, [1]))
