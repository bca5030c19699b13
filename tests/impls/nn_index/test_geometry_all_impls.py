"""
The reference's behavioral-geometry trio, applied uniformly to every
NN-index implementation (reference runs it per backend:
test_lsh.py:754-961, test_faiss.py:443-515, test_mrpt.py:260-334,
test_flann.py:143-223):

1. random vectors: each indexed point is its own 1-NN at distance ~0, a
   perturbed vector retrieves its source, distances ascend;
2. orthogonal unit vectors: the query's own axis comes back first;
3. colinear points [j+1, 2(j+1)]: results in exact index order.
"""
import numpy as np
import pytest

from smqtk_indexing_tpu.data.descriptor import (
    DescriptorMemoryElement, MemoryDescriptorSet,
)
from smqtk_indexing_tpu.data.key_value import MemoryKeyValueStore
from smqtk_indexing_tpu.models.lsh_functor.itq import ItqFunctor
from smqtk_indexing_tpu.models.nn_index.autotune import (
    AutotunedNearestNeighborsIndex,
)
from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex
from smqtk_indexing_tpu.models.nn_index.ivf import IvfNearestNeighborsIndex
from smqtk_indexing_tpu.models.nn_index.lsh import LSHNearestNeighborIndex
from smqtk_indexing_tpu.models.nn_index.mrpt import (
    MRPTNearestNeighborsIndex,
)


def _elem(uid, vec):
    return DescriptorMemoryElement(uid, np.asarray(vec, dtype=np.float32))


def _make_index(kind, elems):
    """Index factory configured so every impl is effectively exhaustive on
    the small fixtures (geometry must be exact, not probabilistic)."""
    if kind == "flat":
        i = FlatNearestNeighborsIndex(metric="euclidean")
    elif kind == "ivf":
        i = IvfNearestNeighborsIndex(n_lists=2, nprobe=2,
                                     kmeans_iterations=4, random_seed=0)
    elif kind == "mrpt":
        i = MRPTNearestNeighborsIndex(num_trees=8, depth=1, random_seed=0)
    elif kind == "autotune":
        i = AutotunedNearestNeighborsIndex(distance_method="euclidean")
    elif kind == "lsh":
        dim = len(np.asarray(elems[0].vector()))
        functor = ItqFunctor(bit_length=min(4, dim), itq_iterations=10,
                             random_seed=0)
        functor.fit(elems)
        i = LSHNearestNeighborIndex(
            lsh_functor=functor, descriptor_set=MemoryDescriptorSet(),
            hash2uuids_kvstore=MemoryKeyValueStore(),
            distance_method="euclidean")
    else:  # pragma: no cover
        raise ValueError(kind)
    i.build_index(elems)
    return i


KINDS = ("flat", "ivf", "mrpt", "autotune", "lsh")


@pytest.mark.parametrize("kind", KINDS)
def test_random_self_retrieval(kind):
    rng = np.random.default_rng(0)
    elems = [_elem(j, rng.normal(size=16)) for j in range(64)]
    i = _make_index(kind, elems)
    for j in (0, 31, 63):
        res, dists = i.nn(elems[j], 4)
        assert res[0].uuid() == j
        assert dists[0] == pytest.approx(0.0, abs=1e-4)
        assert list(dists) == sorted(dists)


@pytest.mark.parametrize("kind", KINDS)
def test_perturbed_retrieves_source(kind):
    rng = np.random.default_rng(1)
    elems = [_elem(j, rng.normal(size=16) * 10) for j in range(64)]
    i = _make_index(kind, elems)
    for j in (3, 40):
        q = _elem("q", np.asarray(elems[j].vector()) + 0.01)
        res, dists = i.nn(q, 1)
        assert res[0].uuid() == j


@pytest.mark.parametrize("kind", KINDS)
def test_unit_vector_axes(kind):
    dim = 16
    elems = [_elem(j, np.eye(dim, dtype=np.float32)[j]) for j in range(dim)]
    i = _make_index(kind, elems)
    res, dists = i.nn(elems[5], 3)
    assert res[0].uuid() == 5
    assert dists[0] == pytest.approx(0.0, abs=1e-5)
    # All other axes are at euclidean distance sqrt(2).
    for d in dists[1:]:
        assert d == pytest.approx(np.sqrt(2.0), abs=1e-4)


@pytest.mark.parametrize("kind", KINDS)
def test_colinear_exact_order(kind):
    elems = [_elem(j, [j + 1.0, 2.0 * (j + 1.0)]) for j in range(16)]
    i = _make_index(kind, elems)
    res, dists = i.nn(elems[0], 5)
    assert [e.uuid() for e in res] == [0, 1, 2, 3, 4]
    assert list(dists) == sorted(dists)
