"""LSH functor implementations (convenience re-exports)."""
from smqtk_indexing_tpu.models.lsh_functor.itq import ItqFunctor  # noqa: F401
from smqtk_indexing_tpu.models.lsh_functor.simple_rp import (  # noqa: F401
    SimpleRPFunctor,
)
