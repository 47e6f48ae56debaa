"""Synthetic temporal interaction streams for tests and benchmarks.

Generates a bipartite JODIE-style stream with preferential-attachment-ish node
reuse and increasing timestamps, shaped like the reference's datasets (1-based
node ids, 1-based edge idxs, optional edge features with a zero padding row).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from zebra_tpu.data.dataset import Data


def synthetic_stream(
    n_events: int,
    n_users: int,
    n_items: int,
    edge_dim: int = 0,
    seed: int = 0,
    zipf_a: float = 1.3,
) -> Tuple[Data, Optional[np.ndarray]]:
    """Return a chronological Data stream plus an edge-feature matrix of shape
    ``[n_events + 1, edge_dim]`` (row 0 zero) or None when edge_dim == 0."""
    rng = np.random.RandomState(seed)

    # Zipf-distributed node popularity, clipped into range, so the stream has
    # the heavy repeat-interaction structure real temporal graphs have.
    users = 1 + (rng.zipf(zipf_a, n_events) - 1) % n_users
    items = 1 + n_users + (rng.zipf(zipf_a, n_events) - 1) % n_items

    # strictly increasing timestamps with jittered gaps
    gaps = rng.exponential(1.0, n_events)
    timestamps = np.cumsum(gaps)

    edge_idxs = np.arange(1, n_events + 1, dtype=np.int32)
    labels = np.zeros(n_events)

    data = Data(users.astype(np.int32), items.astype(np.int32), timestamps, edge_idxs, labels)

    edge_feats = None
    if edge_dim > 0:
        edge_feats = rng.randn(n_events + 1, edge_dim).astype(np.float32) * 0.1
        edge_feats[0] = 0.0
    return data, edge_feats
