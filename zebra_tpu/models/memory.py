"""Functional TGN node-memory state.

The reference keeps mutable buffers on an nn.Module (modules/memory.py:7-60);
here the memory is an immutable pytree threaded through jitted steps, so the
reference's backup/restore dance (memory.py:49-53, train.py:252-269) becomes
plain value retention and checkpointing is trivial.

Pending-message semantics by aggregator (reference message_aggregator.py —
declared but with no call sites; 'last' is hard-baked by the overwrite in
``store_raw_messages``, memory.py:27-30):

- ``last``: the slot holds the most recent raw message directed at the node.
- ``mean``: the slot accumulates the SUM of raw messages since the last
  commit plus a count, and the updater consumes their mean — the upstream
  TGN MeanMessageAggregator semantics, expressed without ragged per-node
  lists."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MemoryState(NamedTuple):
    memory: jnp.ndarray       # f32|bf16 [N, mem_dim]
    last_update: jnp.ndarray  # f32 [N]
    messages: jnp.ndarray     # f32|bf16 [N, msg_dim] pending message (or sum)
    msg_ts: jnp.ndarray       # f32 [N] latest pending-message timestamp
    msg_flag: jnp.ndarray     # bool [N] message pending?
    msg_count: jnp.ndarray    # f32 [N] pending count (mean aggregator)


def init_memory(n_nodes: int, mem_dim: int, msg_dim: int,
                msg_dtype=jnp.bfloat16, mem_dtype=jnp.float32) -> MemoryState:
    """Zero state (reference __init_memory__, memory.py:19-25); re-created at
    every epoch start (reference train.py:188). Messages default to bf16
    storage: the [N, msg_dim] table dominates HBM capacity and the lazy-GRU
    gather bandwidth; the updater upcasts to f32 at consumption. The memory
    table itself can also be bf16 (--memory_dtype): it is recurrent state, so
    the precision cut compounds across commits — gate on the parity harness
    before using (PARITY.md); cell math stays f32 either way."""
    return MemoryState(
        memory=jnp.zeros((n_nodes, mem_dim), mem_dtype),
        last_update=jnp.zeros((n_nodes,), jnp.float32),
        messages=jnp.zeros((n_nodes, msg_dim), msg_dtype),
        msg_ts=jnp.zeros((n_nodes,), jnp.float32),
        msg_flag=jnp.zeros((n_nodes,), bool),
        msg_count=jnp.zeros((n_nodes,), jnp.float32),
    )
