from zebra_tpu.parallel.distributed import initialize_distributed
from zebra_tpu.parallel.mesh import make_mesh
from zebra_tpu.parallel.sharding import (
    interleave_permutation,
    replicate,
    shard_batch,
    shard_index_state,
    shard_memory,
    shard_params,
    shard_queries,
    shard_seed_trees,
)

__all__ = [
    "initialize_distributed",
    "interleave_permutation",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_index_state",
    "shard_memory",
    "shard_params",
    "shard_queries",
    "shard_seed_trees",
]
