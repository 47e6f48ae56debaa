"""No-op numba shim so the *reference* implementation can run in containers
without numba (it is not installable here — zero egress).

The reference (/root/reference) uses numba purely as a JIT accelerator:
``@njit`` / ``@jit(nopython=True)`` on pure-Python functions,
``@jitclass(spec)`` on pure-Python classes, and ``typed.List``/``typed.Dict``
as typed containers with list/dict semantics. Stripping the JIT layer leaves
the exact same Python semantics, only slower — which is all the parity
harness (scripts/parity_run.py) needs for a head-to-head accuracy A/B on
small synthetic streams.

This package is prepended to PYTHONPATH only for the reference subprocess;
zebra_tpu itself never imports numba.
"""

from __future__ import annotations


def jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


njit = jit


def typeof(x):
    """Only used inside jitclass specs, which the shim ignores."""
    return type(x).__name__


class _TypeStub:
    """Stands in for numba.types.*: any attribute access or call returns
    another stub; specs built from these are never interpreted."""

    def __init__(self, name: str = "type"):
        self._name = name

    def __call__(self, *args, **kwargs):
        return _TypeStub(self._name + "()")

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _TypeStub(f"{self._name}.{name}")

    def __repr__(self):
        return self._name


types = _TypeStub("types")


class _TypedList(list):
    """numba.typed.List with plain-list semantics."""


class _TypedDict(dict):
    """numba.typed.Dict with plain-dict semantics (both insertion-ordered)."""

    @classmethod
    def empty(cls, key_type=None, value_type=None):
        return cls()


class typed:
    List = _TypedList
    Dict = _TypedDict


from . import core, experimental  # noqa: E402,F401  (submodule registration)
