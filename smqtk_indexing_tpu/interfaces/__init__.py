from smqtk_indexing_tpu.interfaces.hash_index import HashIndex  # noqa: F401
from smqtk_indexing_tpu.interfaces.lsh_functor import LshFunctor  # noqa: F401
from smqtk_indexing_tpu.interfaces.nearest_neighbor_index import (  # noqa: F401
    NearestNeighborsIndex,
)
