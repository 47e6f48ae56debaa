from zebra_tpu.parallel.distributed import initialize_distributed
from zebra_tpu.parallel.mesh import make_mesh
from zebra_tpu.parallel.sharding import (
    shard_batch,
    shard_index_state,
    shard_memory,
    shard_params,
    shard_queries,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "shard_batch",
    "shard_index_state",
    "shard_memory",
    "shard_params",
    "shard_queries",
]
