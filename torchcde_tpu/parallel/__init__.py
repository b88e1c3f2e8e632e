from .mesh import (
    NEURAL_CDE_TP_RULES,
    batch_sharding,
    make_mesh,
    neural_cde_param_sharding,
    param_sharding_rules,
    place_params,
    replicated,
    shard_batch,
)
from .seq_pcr import tridiagonal_solve_seq_sharded

__all__ = [
    "NEURAL_CDE_TP_RULES",
    "batch_sharding",
    "make_mesh",
    "neural_cde_param_sharding",
    "param_sharding_rules",
    "place_params",
    "replicated",
    "shard_batch",
    "tridiagonal_solve_seq_sharded",
]
