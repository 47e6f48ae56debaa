"""Chronological split + inductive new-node holdout protocol (reference
data_processing.py:80-149)."""

import numpy as np

from zebra_tpu.data.dataset import split_data
from zebra_tpu.data.synthetic import synthetic_stream


def _splits(n_events=5000, seed=0):
    data, _ = synthetic_stream(n_events=n_events, n_users=300, n_items=300,
                               seed=seed)
    return data, split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )


def test_chronological_quantiles():
    data, s = _splits()
    val_time = np.quantile(data.timestamps, 0.70)
    test_time = np.quantile(data.timestamps, 0.85)
    assert s.train.timestamps.max() <= val_time
    assert s.val.timestamps.min() > val_time
    assert s.val.timestamps.max() <= test_time
    assert s.test.timestamps.min() > test_time


def test_inductive_holdout():
    data, s = _splits()
    train_nodes = set(s.train.sources) | set(s.train.destinations)
    # new-node edges touch at least one node unseen in training
    for d in (s.new_node_val, s.new_node_test):
        for a, b in zip(d.sources, d.destinations):
            assert a not in train_nodes or b not in train_nodes
    # ~10% of all nodes were held out of training entirely
    all_nodes = set(data.sources) | set(data.destinations)
    held = all_nodes - train_nodes
    assert len(held) >= int(0.1 * len(all_nodes))

    # train ∪ val ∪ test partitions the stream (some edges dropped from train
    # because they touch held-out nodes)
    n_total = data.n_interactions
    assert s.val.n_interactions + s.test.n_interactions + s.train.n_interactions <= n_total
    assert s.new_node_val.n_interactions <= s.val.n_interactions
    assert s.new_node_test.n_interactions <= s.test.n_interactions


def test_split_deterministic():
    _, s1 = _splits(seed=4)
    _, s2 = _splits(seed=4)
    np.testing.assert_array_equal(s1.train.sources, s2.train.sources)
    np.testing.assert_array_equal(
        s1.new_node_test.sources, s2.new_node_test.sources
    )


def test_n_nodes_covers_max_id():
    data, s = _splits()
    assert s.n_nodes >= max(data.sources.max(), data.destinations.max())
