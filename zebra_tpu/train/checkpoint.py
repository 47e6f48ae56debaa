"""Checkpointing of the full functional train state.

The reference saves only ``(state_dict, memory)`` at new best-val epochs
(reference train.py:289-291) and reconstructs the T-PPR index by replay; here
the whole state is a pytree, so checkpoints cover params, optimizer state,
node memory (incl. pending messages), and — optionally — the dense index
state plus the stream cursor, enabling exact restart (SURVEY.md §5)."""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any) -> None:
    host_tree = jax.tree.map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_tree, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
