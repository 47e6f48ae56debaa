"""Multi-process (multi-host) bring-up.

The reference is strictly single-process (SURVEY.md §2 rows 26-27). Here a
training job spans processes the standard JAX way: every process calls
``jax.distributed.initialize`` and then runs the *same* program over a mesh
of all global devices; XLA SPMD handles cross-process collectives (ICI
within a host's slice, DCN/Gloo across). The Trainer's host-side work — the
wave scheduler, negative sampling, chunk looping — is deterministic given
the stream and the seeds, so every process computes identical schedules and
feeds identical global arrays (a requirement of multi-controller JAX).

Configuration comes from flags or the conventional env vars
(``ZEBRA_COORDINATOR``, ``ZEBRA_NUM_PROCESSES``, ``ZEBRA_PROCESS_ID``).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process JAX when configured; returns True if a
    multi-process runtime was brought up. No-op (False) for the common
    single-process case."""
    coordinator = coordinator or os.environ.get("ZEBRA_COORDINATOR")
    # env vars fall back for values the CLI left at their single-process
    # defaults (the CLI always passes ints, never None — so "unset" means
    # num_processes<=1 / process_id==0)
    env_np = os.environ.get("ZEBRA_NUM_PROCESSES")
    if (num_processes is None or num_processes <= 1) and env_np:
        num_processes = int(env_np)
    env_pid = os.environ.get("ZEBRA_PROCESS_ID")
    if (process_id is None or process_id == 0) and env_pid:
        process_id = int(env_pid)
    if num_processes is None or num_processes <= 1:
        return False
    if not coordinator:
        raise ValueError(
            "multi-process run needs a coordinator address "
            "(--dist_coordinator or ZEBRA_COORDINATOR)"
        )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
