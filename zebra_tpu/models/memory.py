"""Functional node-memory state (reference modules/memory.py:7-60).

The reference keeps five per-node tensors plus a single pending raw message
per node (last-message semantics baked in by overwrite,
reference memory.py:19-30). Here the same state is one immutable pytree;
"backup/restore" (reference memory.py:49-53) is value retention of the
tuple, and all updates are functional scatters inside jit.

Layout note: the pending-message *flag* is stored as the last column of the
``messages`` table rather than as its own [N] array. The hot path gathers
the 3b·M·k selected-neighbor message rows every batch; a separate skinny
flag gather is a 1-D element gather (~6.6ns/row on TPU, and it appears
twice — forward + backward remat) while the flag column rides the existing
wide row gather for free. Flag semantics: nonzero ⇔ message pending (the
mean aggregator accumulates 1.0 per message; values can only grow until the
row is cleared, so nonzero-ness is preserved even under bf16 rounding).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MemoryState(NamedTuple):
    memory: jnp.ndarray       # f32|bf16 [N, mem_dim]
    last_update: jnp.ndarray  # f32 [N]
    messages: jnp.ndarray     # f32|bf16 [N, W+1] pending message row (or its
                              #   accumulating sum, aggregator='mean'); last
                              #   column = pending flag (see above). W is
                              #   Config.msg_table_dim: under the default
                              #   compact layout (Config.compact_messages) the
                              #   sender-memory part is NOT stored — consumers
                              #   hold it already (it is the updater cell's
                              #   hidden-state gather) and message_input
                              #   re-attaches it
    msg_ts: jnp.ndarray       # f32 [N] latest pending-message timestamp
    msg_count: jnp.ndarray    # f32 [N] pending count (mean aggregator)

    @property
    def msg_flag(self) -> jnp.ndarray:
        """Dense [N] bool pending mask (flush/test paths; hot paths slice
        the flag column out of already-gathered message rows instead)."""
        return self.messages[:, -1] != 0


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
        messages=jnp.zeros((n_nodes, msg_dim + 1), msg_dtype),
        msg_ts=jnp.zeros((n_nodes,), jnp.float32),
        msg_count=jnp.zeros((n_nodes,), jnp.float32),
    )
