"""TPU compiler-option plumbing for the fused phase programs.

XLA's memory-space-assignment pass (MSA) stages buffers into alternate
memory (VMEM, space S(1)) with async copies. On the whole-epoch fused scan
the pass re-stages the full node tables every iteration; disabling
alternate-memory placement for these programs measured +4% end-to-end
(103.3k vs 99.5k ev/s on the bench stream) — the sparse row gathers/
scatters are cheaper served straight from HBM than the full-table staging
copies. XLA_FLAGS cannot carry TPU-backend flags on tunneled deployments
(the client-side parser rejects them), but per-jit ``compiler_options``
are forwarded to the backend compiler and validated there, so the hot jits
thread their options through :func:`resolve_compiler_options`:

- ``ZEBRA_XLA_TPU_OPTIONS="k=v,k=v"`` always wins (set it to "none" to
  force no options on a TPU backend);
- otherwise, on a TPU backend, the measured default below;
- otherwise (CPU/GPU backends, which reject TPU flags) no options.

Resolution happens lazily at the first call of each hot jit — never at
import — so ``jax.distributed.initialize`` still runs before any backend
probe on multi-process bring-up.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

_ENV = "ZEBRA_XLA_TPU_OPTIONS"

# Measured on one v5e chip (bench stream, streaming strategy): see NOTES.md.
# disallow_in_alt_mem: +4% (A/B'd against
# xla_tpu_msa_inefficient_use_to_copy_ratio∈{0.5, 8.0} at +2%/+0% and no
# options). The remat limit keeps XLA's HLO-rematerialization pass from
# re-running the fused scan's cheap-but-not-free integer/gather chains in
# the backward (device profiles show them twice): +2-3%.
TPU_DEFAULT_OPTIONS: Dict[str, str] = {
    "xla_tpu_disallow_in_alt_mem": "true",
    "xla_jf_rematerialization_percent_shared_memory_limit": "99",
}


def env_compiler_options() -> Optional[Dict[str, str]]:
    """Parse ZEBRA_XLA_TPU_OPTIONS ("k=v,k=v") into a compiler-options dict;
    None when unset/empty; {} for the sentinel "none" (explicitly no
    options)."""
    raw = os.environ.get(_ENV, "").strip()
    if not raw:
        return None
    if raw.lower() == "none":
        return {}
    out: Dict[str, str] = {}
    for kv in raw.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(f"{_ENV}: expected k=v, got {kv!r}")
        k, v = kv.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def resolve_compiler_options() -> Optional[Dict[str, str]]:
    """Compiler options for a hot jit: the env override, else the measured
    TPU defaults when the active backend is TPU, else None. Call at first
    use, not import (initializes the backend)."""
    env = env_compiler_options()
    if env is not None:
        return env or None
    import jax

    if jax.default_backend() == "tpu":
        opts = dict(TPU_DEFAULT_OPTIONS)
        # the rank-counting Pallas top-k materializes [B, C, C] comparison
        # buffers that overflow the default 16M scoped-VMEM stack (measured:
        # 22.94M at the bench config); it is selected by the same env var,
        # so its requirement rides along automatically
        if os.environ.get("ZEBRA_PALLAS_TOPK", "argmax") == "rank":
            opts["xla_tpu_scoped_vmem_limit_kib"] = "65536"
        return opts
    return None
