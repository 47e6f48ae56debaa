"""Sharding layouts for the train state and stream chunks.

Layouts (axis ``data`` = the DP/state axis of the mesh):

- params / optimizer state: replicated (the dense towers are ~100-dim — far
  below the threshold where TP pays; gradients all-reduce over ``data``).
- node memory [N, d] and T-PPR state [M, N, k]: row-sharded over nodes —
  the graph-scaling axis (SURVEY.md §5 "long-context" note: the hard axis is
  N, not sequence length). Gathers/scatters by node id become XLA
  collective-backed dynamic slices.
- batch arrays [C] and query tensors [C, M, 3, k]: sharded over the event
  axis, so each device runs the dense towers for its slice of each batch.

``jax.jit`` propagates these through the chunk scans; no code changes in the
steps themselves."""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _put(tree: Any, mesh: Mesh, spec: P):
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params(tree: Any, mesh: Mesh):
    """Replicate parameters / optimizer state."""
    return _put(tree, mesh, P())


def shard_memory(mem, mesh: Mesh, axis: str = "data"):
    """Row-shard the node-memory tables over the mesh (rank-generic: 2-D
    fields split rows, 1-D fields split directly)."""
    def put(x):
        spec = P(axis, None) if x.ndim == 2 else P(axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, mem)


def shard_index_state(state, mesh: Mesh, axis: str = "data"):
    """Row-shard the flat packed T-PPR state over nodes (axis 0 of [N, F])."""
    if state is None or state == ():
        return state
    s2 = NamedSharding(mesh, P(axis, None))
    return type(state)(data=jax.device_put(state.data, s2))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard the flat event axis of a chunk."""
    return _put(batch, mesh, P(axis))


def shard_queries(queries, mesh: Mesh, axis: str = "data"):
    """Shard query tensors [C, M, 3, k] over the event axis."""
    return _put(queries, mesh, P(axis, None, None, None))
