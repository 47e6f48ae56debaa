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


def interleave_permutation(n_nodes: int, n_shards: int):
    """Round-robin node-id relabeling for owner-aligned sharding:
    ``new_id = perm[old_id]`` sends consecutive old ids to consecutive
    SHARDS (old id i → shard i % n_shards, contiguous-row owner layout
    owner(v) = v // (n_nodes/n_shards), matching native/ingest.cc
    zt_wave_schedule_aligned). Rationale: JODIE-style bipartite numbering
    puts every user (= every src) in one contiguous block, so at
    n_shards=2 the aligned scheduler packs EVERY edge into shard 0's lane
    block — 2.00× wave inflation (docs/SCALING.md study); interleaving
    spreads the src set uniformly over the shards' blocks.

    A bijection on [0, n_nodes) with 0 (the padding id) as a fixed point;
    inverse: ``inv[j] = (j % rows) * n_shards + j // rows``. Deterministic
    in (n_nodes, n_shards), so checkpoints only need to record the shard
    count (``Config.interleave_shards``) for serving to reconstruct it."""
    import numpy as np

    if n_nodes % n_shards:
        raise ValueError(
            f"n_nodes ({n_nodes}) must be a multiple of n_shards "
            f"({n_shards}) — the Trainer pads N to a multiple of 128"
        )
    i = np.arange(n_nodes, dtype=np.int64)
    rows = n_nodes // n_shards
    return ((i % n_shards) * rows + i // n_shards).astype(np.int32)


def shard_seed_trees(tree: Any, mesh: Mesh, axis: str = "data"):
    """Shard seed-stacked state (leading [S] axis on every leaf: params,
    optimizer, memory, RNG keys) over the mesh — whole seeds per device, the
    layout the seed-sharded phase expects (train/phase.py:
    _run_phase_seeds_sharded). Distinct from :func:`shard_memory`: the
    single-seed mesh splits node ROWS; the seed mesh splits SEEDS and keeps
    each seed's rows device-local."""
    return _put(tree, mesh, P(axis))


def replicate(tree: Any, mesh: Mesh):
    """Replicate a tree across the mesh (shared index/adjacency state under
    seed sharding)."""
    if tree is None or tree == ():
        return tree
    return _put(tree, mesh, P())
