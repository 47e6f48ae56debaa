"""TPU compiler-option plumbing for the fused phase programs.

XLA's memory-space-assignment pass (MSA) stages buffers into alternate
memory (VMEM, space S(1)) with async copies. On the whole-epoch fused scan
the pass re-stages the full node tables and the loop-invariant weights
every iteration — the device profile shows ~70% of the train-scan wall
clock spent in `copy-start` ops (NOTES.md). Two libtpu flags that steer the
pass are accepted through the remote-compile path, so we thread per-jit
``compiler_options`` from the environment:

    ZEBRA_XLA_TPU_OPTIONS="xla_tpu_disallow_in_alt_mem=true,..."

Empty (the default) means no options — required on CPU backends, which
reject TPU flags. The Trainer sets validated defaults when running on TPU
(see train/loop.py); the env var always wins for experimentation.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_ENV = "ZEBRA_XLA_TPU_OPTIONS"


def env_compiler_options() -> Optional[Dict[str, str]]:
    """Parse ZEBRA_XLA_TPU_OPTIONS ("k=v,k=v") into a compiler-options dict;
    None when unset/empty (jax.jit treats None as no options)."""
    raw = os.environ.get(_ENV, "").strip()
    if not raw:
        return None
    out: Dict[str, str] = {}
    for kv in raw.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(f"{_ENV}: expected k=v, got {kv!r}")
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out or None
