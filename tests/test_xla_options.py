"""Compiler-option plumbing (zebra_tpu/utils/xla_options.py).

These options are only *applied* on a real TPU backend, but the resolution
logic (env override, TPU defaults, the rank-top-k VMEM rider) is pure and
testable anywhere by stubbing the backend probe.
"""

import pytest

from zebra_tpu.utils import xla_options


def test_env_override_parses_pairs(monkeypatch):
    monkeypatch.setenv("ZEBRA_XLA_TPU_OPTIONS", "a=1, b = x=y")
    assert xla_options.env_compiler_options() == {"a": "1", "b": "x=y"}


def test_env_override_none_sentinel(monkeypatch):
    monkeypatch.setenv("ZEBRA_XLA_TPU_OPTIONS", "none")
    assert xla_options.env_compiler_options() == {}
    # resolve: explicit "none" forces no options even on a TPU backend
    assert xla_options.resolve_compiler_options() is None


def test_env_override_rejects_bare_key(monkeypatch):
    monkeypatch.setenv("ZEBRA_XLA_TPU_OPTIONS", "novalue")
    with pytest.raises(ValueError):
        xla_options.env_compiler_options()


def test_cpu_backend_gets_no_options(monkeypatch):
    monkeypatch.delenv("ZEBRA_XLA_TPU_OPTIONS", raising=False)
    # the test session runs on the forced-CPU mesh (conftest), so the real
    # backend probe answers "cpu"
    assert xla_options.resolve_compiler_options() is None


def test_tpu_defaults_and_rank_vmem_rider(monkeypatch):
    import jax

    monkeypatch.delenv("ZEBRA_XLA_TPU_OPTIONS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.delenv("ZEBRA_PALLAS_TOPK", raising=False)
    opts = xla_options.resolve_compiler_options()
    assert opts == xla_options.TPU_DEFAULT_OPTIONS
    assert "xla_tpu_scoped_vmem_limit_kib" not in opts

    # the rank-counting Pallas top-k needs a larger scoped-VMEM stack
    # (measured 22.94M > the 16M default); selecting it via the env var
    # must carry the limit along automatically
    monkeypatch.setenv("ZEBRA_PALLAS_TOPK", "rank")
    opts = xla_options.resolve_compiler_options()
    assert opts["xla_tpu_scoped_vmem_limit_kib"] == "65536"
    for k, v in xla_options.TPU_DEFAULT_OPTIONS.items():
        assert opts[k] == v


def test_compile_cache_dir_is_host_keyed(monkeypatch):
    """The persistent compile cache must never be shared across machines:
    XLA:CPU AOT entries embed build-host CPU features and loading a foreign
    entry can segfault (observed when a container moved hosts)."""
    from zebra_tpu.utils import compile_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    d1 = compile_cache.cache_dir()
    assert d1 != "/tmp/jax_cache"          # bare shared dir is forbidden
    assert d1 == compile_cache.cache_dir()  # stable on one host
    assert compile_cache.host_fingerprint() in d1

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/explicit")
    assert compile_cache.cache_dir() == "/tmp/explicit"
