"""The stateless pruned-BFS T-PPR query must reproduce the walk-enumeration
oracle, and the padded-CSR neighbor index must answer temporal-neighbor
queries exactly."""

import numpy as np
import pytest

from tests.oracle import PruningOracle
from zebra_tpu.index.neighbor_finder import (
    build_neighbor_index,
    count_before,
    most_recent_neighbors,
)
from zebra_tpu.index.pruning import pruned_topk

import jax.numpy as jnp


def random_stream(n_events, n_nodes, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(1, n_nodes, n_events).astype(np.int32)
    dst = rng.randint(1, n_nodes, n_events).astype(np.int32)
    dst = np.where(dst == src, (dst % (n_nodes - 1)) + 1, dst)
    ts = np.cumsum(rng.exponential(1.0, n_events))
    eidx = np.arange(1, n_events + 1, dtype=np.int32)
    return src, dst, ts, eidx


def test_count_before_and_recent_neighbors():
    n_nodes, n_events = 20, 150
    src, dst, ts, eidx = random_stream(n_events, n_nodes, seed=0)
    index = build_neighbor_index(src, dst, ts, eidx, n_nodes)
    oracle = PruningOracle(src, dst, ts, eidx, n_nodes)

    rng = np.random.RandomState(1)
    q_nodes = rng.randint(0, n_nodes, 64).astype(np.int32)
    q_ts = rng.uniform(0, ts.max() * 1.1, 64).astype(np.float32)

    counts = np.asarray(count_before(index, jnp.asarray(q_nodes), jnp.asarray(q_ts)))
    offsets = np.asarray(index.offsets)
    for i, (v, t) in enumerate(zip(q_nodes, q_ts)):
        want = len(oracle.neighbors_before(int(v), np.float32(t)))
        got = counts[i] - offsets[v]
        assert got == want, (v, t)

    n = 5
    nbr, eidx_o, nts, valid, n_before = most_recent_neighbors(
        index, jnp.asarray(q_nodes), jnp.asarray(q_ts), n
    )
    for i, (v, t) in enumerate(zip(q_nodes, q_ts)):
        want = oracle.neighbors_before(int(v), np.float32(t))[::-1][:n]  # newest first
        got = [
            (float(nts[i, z]), int(nbr[i, z]), int(eidx_o[i, z]))
            for z in range(n)
            if bool(valid[i, z])
        ]
        assert got == [(float(a), b, c) for (a, b, c) in want]
        assert int(n_before[i]) == len(oracle.neighbors_before(int(v), np.float32(t)))


@pytest.mark.parametrize(
    "alpha_list,beta_list,width,depth,k",
    [
        ((0.1,), (0.9,), 4, 2, 6),
        ((0.1, 0.3), (0.9, 0.5), 3, 3, 5),
        ((0.0,), (0.6,), 5, 1, 8),
        # C = 7+49+343 = 399 > 256: exercises the sort-based dedup path
        # (the O(C²) match matrix would blow HBM at real depth-3 widths)
        ((0.1,), (0.9,), 7, 3, 6),
    ],
)
def test_pruned_topk_matches_oracle(alpha_list, beta_list, width, depth, k):
    n_nodes, n_events = 25, 200
    src, dst, ts, eidx = random_stream(n_events, n_nodes, seed=7)
    index = build_neighbor_index(src, dst, ts, eidx, n_nodes)
    oracle = PruningOracle(src, dst, ts, eidx, n_nodes)

    rng = np.random.RandomState(3)
    q_nodes = rng.randint(1, n_nodes, 40).astype(np.int32)
    q_ts = rng.uniform(ts.min(), ts.max(), 40).astype(np.float32)

    out = pruned_topk(
        index,
        jnp.asarray(alpha_list, jnp.float32),
        jnp.asarray(beta_list, jnp.float32),
        jnp.asarray(q_nodes),
        jnp.asarray(q_ts),
        width,
        depth,
        k,
    )

    for m, (alpha, beta) in enumerate(zip(alpha_list, beta_list)):
        for i, (v, t) in enumerate(zip(q_nodes, q_ts)):
            o_nbr, o_eidx, o_dt, o_w = oracle.query(
                int(v), float(t), width, depth, alpha, beta, k
            )
            want = {
                (int(e), int(n)): float(x)
                for e, n, x in zip(o_eidx, o_nbr, o_w)
                if x > 0
            }
            got = {
                (int(e), int(n)): float(x)
                for e, n, x in zip(out.eidx[m, i], out.nbr[m, i], out.w[m, i])
                if x > 0
            }
            # boundary entries within float accumulation noise of the k-th
            # weight may legitimately differ (dedup sums are reassociated on
            # device); everything else must agree.
            cut = min(want.values()) if want else 0.0
            for key in set(want) ^ set(got):
                w_any = want.get(key, got.get(key))
                assert w_any == pytest.approx(cut, rel=1e-4), (m, i, key)
            for key in set(want) & set(got):
                assert got[key] == pytest.approx(want[key], rel=1e-4), (m, i, key)


def test_dedup_paths_agree(monkeypatch):
    """Match-matrix and sort-based dedup produce identical top-k output on
    the same query set."""
    import zebra_tpu.index.pruning as pruning

    n_nodes, n_events = 25, 200
    src, dst, ts, eidx = random_stream(n_events, n_nodes, seed=11)
    index = build_neighbor_index(src, dst, ts, eidx, n_nodes)
    rng = np.random.RandomState(5)
    q_nodes = jnp.asarray(rng.randint(1, n_nodes, 32).astype(np.int32))
    q_ts = jnp.asarray(rng.uniform(ts.min(), ts.max(), 32).astype(np.float32))
    alpha = jnp.asarray([0.1, 0.0], jnp.float32)
    beta = jnp.asarray([0.9, 0.5], jnp.float32)

    out_matrix = pruning.pruned_topk_impl(index, alpha, beta, q_nodes, q_ts, 4, 2, 6)
    monkeypatch.setattr(pruning, "_MATCH_MATRIX_MAX_C", 0)
    out_sorted = pruning.pruned_topk_impl(index, alpha, beta, q_nodes, q_ts, 4, 2, 6)

    for a, b in zip(out_matrix, out_sorted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_count_before_power_of_two_arena_converges():
    """A slice of length n needs floor(log2 n)+1 halvings; the previous
    ceil(log2 T) bound was one short when T is an exact power of two and one
    node owns the whole arena (all-self-loop degenerate stream), returning an
    unconverged lower bound for some cuts (ADVICE r3)."""
    e = 4  # self-loops on node 1 -> arena = 2e = 8 slots, all owned by node 1
    src = np.ones(e, np.int64)
    dst = np.ones(e, np.int64)
    ts = np.arange(1, e + 1, dtype=np.float64)
    eidx = np.arange(1, e + 1, dtype=np.int64)
    idx = build_neighbor_index(src, dst, ts, eidx, n_nodes=2)
    assert idx.ts.shape[0] == 8  # exact power of two

    # arena ts (node 1's slice) = [1,1,2,2,3,3,4,4]; sweep every cut
    arena = np.sort(np.concatenate([ts, ts]))
    cuts = np.arange(0.5, 5.0, 0.5, dtype=np.float32)
    nodes = jnp.ones(len(cuts), jnp.int32)
    got = np.asarray(count_before(idx, nodes, jnp.asarray(cuts)))
    want = np.searchsorted(arena, cuts, side="left")
    np.testing.assert_array_equal(got, want)

    # and the newest neighbor below a mid-slice cut is actually returned
    nbr, _, nts, valid, _ = most_recent_neighbors(
        idx, jnp.asarray([1], jnp.int32), jnp.asarray([1.5], jnp.float32), 3
    )
    assert bool(valid[0, 0]) and float(nts[0, 0]) == 1.0
