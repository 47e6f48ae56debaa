"""Checkpointing of the full functional train state.

The reference saves only ``(state_dict, memory)`` at new best-val epochs
(reference train.py:289-291) and reconstructs the T-PPR index by replay; here
the whole state is a pytree, so checkpoints cover params, optimizer state,
node memory (incl. pending messages), the dense index state, and the stream
cursor, enabling exact restart (SURVEY.md §5).

On-disk format: a pickled dict ``{"magic", "version", "tree"}``. The version
gates layout changes across releases — loading a checkpoint written by an
incompatible layout fails loudly instead of mis-deserializing. Version 1
checkpoints (raw pickled trees from round 1) load transparently."""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any

import jax
import numpy as np

MAGIC = "zebra_tpu_checkpoint"
# v3: MemoryState lost its separate msg_flag array (the flag is the last
# messages column, models/memory.py)
# v4: under the default compact layout the messages table no longer stores
# the sender-memory part (Config.compact_messages)
VERSION = 4


def _to_host(x: Any) -> Any:
    """Device → host. In a multi-process run, row-sharded node tables are not
    fully addressable from any one process; gather them collectively (every
    process must therefore reach save_checkpoint — it is a collective there,
    like the phases themselves). Non-array leaves (e.g. the Config dataclass)
    pickle as-is."""
    if dataclasses.is_dataclass(x):
        return x
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save_checkpoint(path: str, tree: Any) -> None:
    """Write the checkpoint (all processes gather; process 0 writes)."""
    host_tree = jax.tree.map(_to_host, tree)
    if jax.process_index() != 0:
        return
    payload = {"magic": MAGIC, "version": VERSION, "tree": host_tree}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if not (isinstance(payload, dict) and payload.get("magic") == MAGIC):
        return payload  # version-1 (round-1) checkpoint: the raw tree
    version = payload["version"]
    if version > VERSION:
        raise ValueError(
            f"checkpoint {path!r} has version {version}, newer than this "
            f"build's {VERSION} — refusing to guess at its layout"
        )
    if version < 4:
        raise ValueError(
            f"checkpoint {path!r} has version {version}: its MemoryState "
            "layout predates v4 (compact message rows) and cannot be "
            "loaded by this build"
        )
    tree = payload["tree"]
    if isinstance(tree, dict):
        from zebra_tpu.config import Config

        cfg = tree.get("cfg")
        if isinstance(cfg, Config):
            # fill in Config fields added since the checkpoint was written
            # (pickle restores state without __init__)
            tree["cfg"] = Config.upgrade(cfg)
    return tree
