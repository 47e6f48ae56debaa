"""Functional TGN node-memory state.

The reference keeps mutable buffers on an nn.Module (modules/memory.py:7-60);
here the memory is an immutable pytree threaded through jitted steps, so the
reference's backup/restore dance (memory.py:49-53, train.py:252-269) becomes
plain value retention and checkpointing is trivial.

Single-pending-message semantics: ``store_raw_messages`` overwrites, so each
node holds at most the *last* raw message directed at it (reference
memory.py:27-30 — this hard-bakes the 'last' aggregator)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MemoryState(NamedTuple):
    memory: jnp.ndarray       # f32 [N, mem_dim]
    last_update: jnp.ndarray  # f32 [N]
    messages: jnp.ndarray     # f32 [N, msg_dim] pending raw message per node
    msg_ts: jnp.ndarray       # f32 [N] its timestamp
    msg_flag: jnp.ndarray     # bool [N] message pending?


def init_memory(n_nodes: int, mem_dim: int, msg_dim: int) -> MemoryState:
    """Zero state (reference __init_memory__, memory.py:19-25); re-created at
    every epoch start (reference train.py:188)."""
    return MemoryState(
        memory=jnp.zeros((n_nodes, mem_dim), jnp.float32),
        last_update=jnp.zeros((n_nodes,), jnp.float32),
        messages=jnp.zeros((n_nodes, msg_dim), jnp.float32),
        msg_ts=jnp.zeros((n_nodes,), jnp.float32),
        msg_flag=jnp.zeros((n_nodes,), bool),
    )
