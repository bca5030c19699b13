"""
Building and querying an index — script equivalent of the reference's
``examples/building_and_querying.ipynb`` (qualitative retrieval demo):
generate descriptors, fit an ITQ functor, build an LSH index and a flat
index, query both, and persist/reload the models.

Run: python examples/building_and_querying.py
"""
import os
import tempfile

import numpy as np

from smqtk_indexing_tpu.data.data_element import DataFileElement
from smqtk_indexing_tpu.data.descriptor import (
    DescriptorMemoryElement, MemoryDescriptorSet,
)
from smqtk_indexing_tpu.data.key_value import MemoryKeyValueStore
from smqtk_indexing_tpu.models.hash_index.linear import LinearHashIndex
from smqtk_indexing_tpu.models.lsh_functor.itq import ItqFunctor
from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex
from smqtk_indexing_tpu.models.nn_index.lsh import LSHNearestNeighborIndex


def main() -> None:
    # 1. Some descriptors: 10 clusters of 128-d vectors standing in for
    #    image features (the notebook used butterfly images).
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(10, 128)) * 5
    elems = [
        DescriptorMemoryElement(
            f"img-{c}-{j}",
            (centers[c] + rng.normal(size=128) * 0.4).astype(np.float32))
        for c in range(10) for j in range(200)
    ]
    print(f"{len(elems)} descriptors of dim 128")

    # 2. Exact flat index (one fused scan+top-k program per query batch).
    flat = FlatNearestNeighborsIndex(metric="euclidean")
    flat.build_index(elems)
    q = elems[42]
    neighbors, dists = flat.nn(q, 5)
    print("flat top-5:",
          [(e.uuid(), round(d, 3)) for e, d in zip(neighbors, dists)])

    # 3. LSH: fit ITQ on the corpus, build the composite index with a
    #    Hamming hash index, persist the trained model to disk.
    tmp = tempfile.mkdtemp()
    functor = ItqFunctor(
        mean_vec_cache_elem=DataFileElement(os.path.join(tmp, "mean.npy")),
        rotation_cache_elem=DataFileElement(os.path.join(tmp, "rot.npy")),
        bit_length=64, itq_iterations=50, random_seed=0)
    functor.fit(elems)
    lsh = LSHNearestNeighborIndex(
        lsh_functor=functor,
        descriptor_set=MemoryDescriptorSet(),
        hash2uuids_kvstore=MemoryKeyValueStore(),
        hash_index=LinearHashIndex(),
        distance_method="euclidean")
    lsh.build_index(elems)
    neighbors, dists = lsh.nn(q, 5)
    print("lsh  top-5:",
          [(e.uuid(), round(d, 3)) for e, d in zip(neighbors, dists)])

    # 4. Batched serving: many queries in one device launch.
    results = lsh.nn_many(elems[:32], 3)
    hit = sum(res[0].uuid() == e.uuid()
              for e, (res, _) in zip(elems[:32], results))
    print(f"batched self-retrieval: {hit}/32")

    # 5. The trained ITQ model reloads from its cache elements.
    functor2 = ItqFunctor(
        mean_vec_cache_elem=DataFileElement(os.path.join(tmp, "mean.npy")),
        rotation_cache_elem=DataFileElement(os.path.join(tmp, "rot.npy")),
        bit_length=64)
    assert functor2.has_model()
    print("ITQ model reloaded from cache: OK")


if __name__ == "__main__":
    main()
