"""
Randomized operation-sequence oracle test: FlatNearestNeighborsIndex must
agree with a brute-force float64 numpy oracle after any interleaving of
build/update/remove operations (the strongest form of the reference's
mutation-consistency tests).
"""
import numpy as np

from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex


def test_random_mutation_sequence_matches_oracle():
    rng = np.random.default_rng(1234)
    d = 8
    idx = FlatNearestNeighborsIndex()
    oracle = {}  # uid -> vector
    next_uid = 0

    def new_elems(n):
        nonlocal next_uid
        out = []
        for _ in range(n):
            v = rng.normal(size=d).astype(np.float32)
            out.append(DescriptorMemoryElement(next_uid, v))
            oracle[next_uid] = v
            next_uid += 1
        return out

    idx.build_index(new_elems(20))
    for step in range(30):
        op = rng.choice(["add", "remove", "query"])
        if op == "add":
            idx.update_index(new_elems(int(rng.integers(1, 5))))
        elif op == "remove" and len(oracle) > 5:
            uids = rng.choice(list(oracle), size=2, replace=False)
            idx.remove_from_index(list(uids))
            for u in uids:
                del oracle[u]
        else:
            q = rng.normal(size=d).astype(np.float32)
            k = int(rng.integers(1, 6))
            res, dists = idx.nn(DescriptorMemoryElement("q", q), k)
            # Oracle in float64.
            uids = list(oracle)
            mat = np.stack([oracle[u] for u in uids]).astype(np.float64)
            ref = np.sqrt(((mat - q.astype(np.float64)) ** 2).sum(1))
            order = np.argsort(ref, kind="stable")
            k_eff = min(k, len(uids))
            assert len(res) == k_eff
            np.testing.assert_allclose(
                dists, np.sort(ref)[:k_eff], atol=1e-4)
            got = {e.uuid() for e in res}
            want = {uids[i] for i in order[:k_eff]}
            # Allow tie permutations: compare distance multisets (done
            # above) and require overlap on strictly-better entries.
            strict = {uids[i] for i in order[:k_eff]
                      if ref[order[k_eff - 1]] - ref[i] > 1e-6}
            assert strict <= got
    assert idx.count() == len(oracle)
