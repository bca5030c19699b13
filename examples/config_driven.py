"""
Config-driven (service-style) instantiation — the JSON plugin contract the
SMQTK ecosystem builds services on (SURVEY.md §5 "Config / flag system"):
an index is described entirely as a JSON document and constructed with
``from_config_dict`` against the discovered implementations.
"""
import json

import numpy as np

from smqtk_indexing_tpu.core.configuration import (
    from_config_dict, to_config_dict,
)
from smqtk_indexing_tpu.data.descriptor import DescriptorMemoryElement
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (
    NearestNeighborsIndex,
)


def main() -> None:
    config = {
        "type": "IvfNearestNeighborsIndex",
        "IvfNearestNeighborsIndex": {
            "metric": "euclidean",
            "n_lists": 16,
            "nprobe": 4,
            "kmeans_iterations": 5,
            "random_seed": 0,
        },
    }
    index = from_config_dict(config, NearestNeighborsIndex.get_impls())
    print("instantiated:", type(index).__name__)

    rng = np.random.default_rng(0)
    elems = [DescriptorMemoryElement(i, rng.normal(size=32).astype(np.float32))
             for i in range(1000)]
    index.build_index(elems)
    res, dists = index.nn(elems[42], 3)
    print("top-3:", [(e.uuid(), round(d, 3)) for e, d in zip(res, dists)])
    assert res[0].uuid() == 42

    # The live instance serializes back to a JSON-compliant document.
    print("round-trip config json:",
          json.dumps(to_config_dict(index))[:120], "...")


if __name__ == "__main__":
    main()
