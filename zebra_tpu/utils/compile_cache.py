"""Persistent-compile-cache location, keyed by the host CPU.

XLA:CPU AOT cache entries embed the *build* host's CPU feature set, and
JAX's cache key does not cover it. When a container is rescheduled onto a
machine with a different feature set (e.g. a different AVX-512 mix), JAX
logs ``Machine type used for XLA:CPU compilation doesn't match the machine
type for execution ... could lead to execution errors such as SIGILL`` —
and then actually segfaults inside ``backend_compile_and_load`` when a
poisoned entry is loaded. Folding a fingerprint of the host's cpuinfo
flags into the directory name makes each machine read only its own cache.

``JAX_COMPILATION_CACHE_DIR`` still overrides everything (the driver and
CI set it deliberately).
"""

from __future__ import annotations

import hashlib
import os
import re

_BASE = "/tmp/jax_cache"


def host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        m = re.search(r"^flags\s*:\s*(.*)$", txt, re.M)
        flags = " ".join(sorted((m.group(1) if m else "").split()))
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        return "nocpuinfo"


def cache_dir(base: str = _BASE) -> str:
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    return f"{base}-{host_fingerprint()}"


def enable(jax_module) -> "str | None":
    """Point JAX's persistent compile cache at this host's directory.

    TPU/accelerator backends only. XLA:CPU's AOT serialization is
    unreliable in this jaxlib even for same-host entries (the loader
    reports pseudo-feature mismatches like ``+prefer-no-scatter`` and then
    segfaults inside ``backend_compile_and_load`` on some programs —
    reproduced deterministically by the test suite's serve path), and CPU
    compiles are cheap enough not to need it. The cache exists for the
    tunneled-TPU deployment, where a cold compile of the fused phase
    programs costs tens of seconds to minutes.

    ``JAX_COMPILATION_CACHE_DIR`` overrides everything, including the CPU
    opt-out — an explicit directory is a deliberate choice."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is None and jax_module.default_backend() == "cpu":
        return None
    path = env or cache_dir()
    jax_module.config.update("jax_compilation_cache_dir", path)
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    return path
