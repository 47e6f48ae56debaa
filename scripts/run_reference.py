"""Launcher for the *reference* implementation under this container's
Python 3.12 (see scripts/parity_run.py).

Two compatibility patches, neither changing semantics:

- ``random.sample(set, k)`` was removed in Python 3.11; the reference calls
  it on a set (/root/reference/utils/data_processing.py:102). Patched to
  sample from the sorted population — the draw a 3.8-era run makes is
  interpreter-dependent anyway (set iteration order), and sorting matches
  zebra_tpu's split (zebra_tpu/data/dataset.py), so the seed-2020 inductive
  holdout becomes *identical* across the two implementations.
- numba is resolved from scripts/_numba_shim (pure-Python no-op JIT).

Usage: PYTHONPATH=scripts/_numba_shim:/root/reference \
           python scripts/run_reference.py <reference train.py args...>
"""

from __future__ import annotations

import random
import runpy
import sys

_orig_sample = random.sample


def _sample(population, k, **kw):
    if isinstance(population, (set, frozenset, dict)):
        population = sorted(population)
    return _orig_sample(population, k, **kw)


random.sample = _sample

if __name__ == "__main__":
    sys.argv = ["train.py"] + sys.argv[1:]
    runpy.run_path("/root/reference/train.py", run_name="__main__")
