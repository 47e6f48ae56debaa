"""Event-stream dataset containers and the chronological/inductive split protocol.

Reproduces the reference split semantics exactly (reference
utils/data_processing.py:80-149): 70/15/15 chronological split by timestamp
quantiles, plus an inductive holdout of 10% of the nodes active after the
validation cut (sampled with ``random.seed(2020)``) whose training edges are
dropped; "new-node" val/test sets are the val/test edges touching any node
unseen in training.

Node ids are 1-based (0 is the padding node), edge idxs are 1-based (0 is the
padding edge with a zero feature row) — established by the offline
preprocessors (reference utils/preprocess_data.py:37-61).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class Data:
    """One chronological slice of a temporal interaction stream.

    Mirrors the reference ``Data`` container (data_processing.py:8-31):
    parallel arrays sources/destinations/timestamps/edge_idxs/labels.
    """

    sources: np.ndarray
    destinations: np.ndarray
    timestamps: np.ndarray
    edge_idxs: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        self.sources = np.asarray(self.sources, dtype=np.int32)
        self.destinations = np.asarray(self.destinations, dtype=np.int32)
        self.timestamps = np.asarray(self.timestamps, dtype=np.float64)
        self.edge_idxs = np.asarray(self.edge_idxs, dtype=np.int32)
        self.labels = np.asarray(self.labels)
        self.n_interactions = len(self.sources)
        self.unique_nodes = set(self.sources.tolist()) | set(self.destinations.tolist())
        self.n_unique_nodes = len(self.unique_nodes)

    def slice(self, lo: int, hi: int) -> "Data":
        return Data(
            self.sources[lo:hi],
            self.destinations[lo:hi],
            self.timestamps[lo:hi],
            self.edge_idxs[lo:hi],
            self.labels[lo:hi],
        )

    def sample(self, ratio: float, seed: int = 0) -> "Data":
        """Random chronologically-ordered subsample (reference Data.sample,
        data_processing.py:21-31)."""
        rng = np.random.RandomState(seed)
        size = int(ratio * self.n_interactions)
        idx = np.sort(rng.choice(self.n_interactions, size, replace=False))
        return Data(
            self.sources[idx], self.destinations[idx], self.timestamps[idx],
            self.edge_idxs[idx], self.labels[idx],
        )


@dataclass
class DatasetSplits:
    full: Data
    train: Data
    val: Data
    test: Data
    new_node_val: Data
    new_node_test: Data
    n_nodes: int  # number of unique nodes in the full stream
    n_edges: int  # number of interactions in the full stream


def split_data(
    sources: np.ndarray,
    destinations: np.ndarray,
    timestamps: np.ndarray,
    edge_idxs: np.ndarray,
    labels: np.ndarray,
    new_node_seed: int = 2020,
    quantiles: Tuple[float, float] = (0.70, 0.85),
) -> DatasetSplits:
    """Chronological 70/15/15 split with the inductive new-node holdout.

    Semantics match reference data_processing.py:87-132, including the
    ``random.seed(2020)`` sampling of the held-out node set.
    """
    sources = np.asarray(sources)
    destinations = np.asarray(destinations)
    timestamps = np.asarray(timestamps)
    edge_idxs = np.asarray(edge_idxs)
    labels = np.asarray(labels)

    val_time, test_time = list(np.quantile(timestamps, quantiles))
    full_data = Data(sources, destinations, timestamps, edge_idxs, labels)

    rng = random.Random(new_node_seed)
    node_set = set(sources.tolist()) | set(destinations.tolist())
    n_total_unique_nodes = len(node_set)
    n_edges = len(sources)

    # nodes active strictly after the validation cut; hold out 10% of all nodes
    # from that pool (reference data_processing.py:101-102).
    test_node_set = set(sources[timestamps > val_time].tolist()) | set(
        destinations[timestamps > val_time].tolist()
    )
    # random.Random(x).sample on a sorted list reproduces the reference's
    # protocol shape (the reference samples from an unordered set, so the exact
    # membership is interpreter-dependent there too; only the *protocol* is
    # load-bearing).
    new_test_node_set = set(
        rng.sample(sorted(test_node_set), int(0.1 * n_total_unique_nodes))
    )

    new_test_source_mask = np.fromiter(
        (s in new_test_node_set for s in sources.tolist()), bool, len(sources)
    )
    new_test_destination_mask = np.fromiter(
        (d in new_test_node_set for d in destinations.tolist()), bool, len(destinations)
    )
    observed_edges_mask = ~new_test_source_mask & ~new_test_destination_mask

    train_mask = (timestamps <= val_time) & observed_edges_mask
    train_data = Data(
        sources[train_mask], destinations[train_mask], timestamps[train_mask],
        edge_idxs[train_mask], labels[train_mask],
    )
    train_node_set = set(train_data.sources.tolist()) | set(
        train_data.destinations.tolist()
    )
    assert len(train_node_set & new_test_node_set) == 0

    # any node not seen in training counts as new (reference :115)
    new_node_set = node_set - train_node_set
    val_mask = (timestamps <= test_time) & (timestamps > val_time)
    test_mask = timestamps > test_time
    edge_contains_new_node_mask = np.fromiter(
        (
            (a in new_node_set or b in new_node_set)
            for a, b in zip(sources.tolist(), destinations.tolist())
        ),
        bool,
        len(sources),
    )
    new_node_val_mask = val_mask & edge_contains_new_node_mask
    new_node_test_mask = test_mask & edge_contains_new_node_mask

    def take(mask):
        return Data(
            sources[mask], destinations[mask], timestamps[mask],
            edge_idxs[mask], labels[mask],
        )

    # The reference reports the unique-node count (train.py:123-124), which
    # sizes state tables correctly only because its preprocessors compact ids;
    # we size by the largest id actually present so sparse id spaces cannot
    # index out of bounds.
    max_id = int(max(sources.max(), destinations.max()))
    return DatasetSplits(
        full=full_data,
        train=train_data,
        val=take(val_mask),
        test=take(test_mask),
        new_node_val=take(new_node_val_mask),
        new_node_test=take(new_node_test_mask),
        n_nodes=max(max_id, n_total_unique_nodes),
        n_edges=n_edges,
    )


def get_data(dataset_name: str, data_dir: str = "data") -> DatasetSplits:
    """Load ``{data_dir}/{name}/ml_{name}.csv`` and split (reference
    data_processing.py:80-149)."""
    import pandas as pd

    path = os.path.join(data_dir, dataset_name, f"ml_{dataset_name}.csv")
    graph_df = pd.read_csv(path)
    return split_data(
        graph_df.u.values,
        graph_df.i.values,
        graph_df.ts.values,
        graph_df.idx.values,
        graph_df.label.values,
    )


def load_feat(
    dataset_name: str, data_dir: str = "data"
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Load optional node/edge feature matrices (reference
    data_processing.py:68-76). Row 0 of the edge features is the zero padding
    row prepended by the preprocessor."""
    node_path = os.path.join(data_dir, dataset_name, f"ml_{dataset_name}_node.npy")
    edge_path = os.path.join(data_dir, dataset_name, f"ml_{dataset_name}.npy")
    node_feats = np.load(node_path) if os.path.exists(node_path) else None
    edge_feats = np.load(edge_path) if os.path.exists(edge_path) else None
    return node_feats, edge_feats


def compute_time_statistics(sources, destinations, timestamps):
    """Mean/std of inter-event gaps per source and destination (reference
    data_processing.py:34-61; unused by the reference training path, kept
    for JODIE-style Δt normalization). Vectorized."""
    sources = np.asarray(sources)
    destinations = np.asarray(destinations)
    timestamps = np.asarray(timestamps, np.float64)

    def diffs(nodes):
        last = {}
        out = np.empty(len(nodes))
        for i, (v, t) in enumerate(zip(nodes.tolist(), timestamps.tolist())):
            out[i] = t - last.get(v, 0.0)
            last[v] = t
        return out

    ds = diffs(sources)
    dd = diffs(destinations)
    return float(ds.mean()), float(ds.std()), float(dd.mean()), float(dd.std())
