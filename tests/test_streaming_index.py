"""The dense on-device streaming T-PPR index must reproduce the dict-based
SANTA oracle edge for edge: state (entries + weights + norms) and the
model-facing extraction outputs."""

import numpy as np
import pytest

from tests.oracle import TpprOracle
from zebra_tpu.index.streaming import (
    TpprParams,
    init_tppr_state,
    run_stream,
    unpack_state,
)


def random_stream(n_events, n_nodes, seed, self_loops=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(1, n_nodes, n_events).astype(np.int32)
    dst = rng.randint(1, n_nodes, n_events).astype(np.int32)
    if not self_loops:
        dst = np.where(dst == src, (dst % (n_nodes - 1)) + 1, dst)
    ts = np.cumsum(rng.exponential(1.0, n_events)).astype(np.float64)
    eidx = np.arange(1, n_events + 1, dtype=np.int32)
    neg = rng.randint(1, n_nodes, n_events).astype(np.int32)
    return src, dst, neg, ts, eidx


def dense_row_dict(state, m, node, n_tppr=1, k=None):
    """(eidx, nbr) → w view of one dense row."""
    if k is None:
        k = (state.data.shape[1] // n_tppr - 1) // 4
    nbr, eidx, ts, w, norm = unpack_state(state, n_tppr, k)
    return {
        (int(e), int(n)): float(x)
        for e, n, x in zip(eidx[m, node], nbr[m, node], w[m, node])
        if x > 0
    }


def assert_state_matches(state, oracle, n_nodes, tol=1e-4):
    u_nbr, u_eidx, u_ts, u_w, u_norm = unpack_state(state, oracle.n_tppr, oracle.k)
    for m in range(oracle.n_tppr):
        np.testing.assert_allclose(
            u_norm[m][:n_nodes],
            oracle.norm[m][:n_nodes],
            rtol=tol,
            err_msg=f"norm mismatch, member {m}",
        )
        for v in range(n_nodes):
            got = {
                (int(e), int(n)): float(x)
                for e, n, x in zip(u_eidx[m, v], u_nbr[m, v], u_w[m, v])
                if x > 0
            }
            want = oracle.topk_dict(m, v)
            assert set(got) == set(want), (
                f"entry-key mismatch member {m} node {v}: {got} vs {want}"
            )
            for key in want:
                assert got[key] == pytest.approx(want[key], rel=tol), (
                    f"weight mismatch member {m} node {v} key {key}"
                )


@pytest.mark.parametrize(
    "alpha_list,beta_list,k",
    [
        ((0.1,), (0.9,), 10),
        ((0.1, 0.2), (0.95, 0.9), 10),
        ((0.0,), (0.5,), 8),  # α == 0 path: insert weight is scale_s2 itself
    ],
)
def test_streaming_matches_oracle(alpha_list, beta_list, k):
    n_nodes, n_events = 30, 300
    src, dst, neg, ts, eidx = random_stream(n_events, n_nodes, seed=3)
    params = TpprParams.create(alpha_list, beta_list, k)
    state = init_tppr_state(len(alpha_list), n_nodes, k)

    oracle = TpprOracle(n_nodes, k, alpha_list, beta_list)
    oracle_q = []
    for i in range(n_events):
        per_node = [
            oracle.extract(int(n), float(ts[i]))
            for n in (src[i], dst[i], neg[i])
        ]
        oracle_q.append(per_node)
        oracle.update(int(src[i]), int(dst[i]), float(ts[i]), int(eidx[i]))

    state, queries = run_stream(state, params, src, dst, neg, ts, eidx, chunk=128)

    assert_state_matches(state, oracle, n_nodes)

    # extraction outputs: compare as key→weight maps (slot order is free) and
    # the Δt of live slots
    for i in range(0, n_events, 7):
        for j in range(3):  # src, dst, neg
            for m in range(len(alpha_list)):
                o_nbr, o_eidx, o_dt, o_w = oracle_q[i][j][m]
                want = {
                    (int(e), int(n)): (float(d), float(x))
                    for e, n, d, x in zip(o_eidx, o_nbr, o_dt, o_w)
                    if x > 0
                }
                got = {
                    (int(e), int(n)): (float(d), float(x))
                    for e, n, d, x in zip(
                        queries.eidx[i, m, j],
                        queries.nbr[i, m, j],
                        queries.dt[i, m, j],
                        queries.w[i, m, j],
                    )
                    if x > 0
                }
                assert set(got) == set(want), (i, j, m)
                for key, (d_want, w_want) in want.items():
                    d_got, w_got = got[key]
                    assert w_got == pytest.approx(w_want, rel=1e-4)
                    assert d_got == pytest.approx(d_want, rel=1e-3, abs=1e-2)


def test_self_loop_edge():
    """A self-loop applies a single symmetric update (reference util.py:501)."""
    alpha_list, beta_list, k = (0.1,), (0.9,), 5
    params = TpprParams.create(alpha_list, beta_list, k)
    n_nodes = 5
    src = np.array([1, 2, 2], np.int32)
    dst = np.array([2, 2, 3], np.int32)  # second edge is a self-loop on 2
    neg = np.array([3, 3, 1], np.int32)
    ts = np.array([1.0, 2.0, 3.0])
    eidx = np.array([1, 2, 3], np.int32)

    oracle = TpprOracle(n_nodes, k, alpha_list, beta_list)
    for i in range(3):
        oracle.update(int(src[i]), int(dst[i]), float(ts[i]), int(eidx[i]))

    state = init_tppr_state(1, n_nodes, k)
    state, _ = run_stream(state, params, src, dst, neg, ts, eidx, chunk=4)
    assert_state_matches(state, oracle, n_nodes)


def test_single_edge_algebra():
    """Closed-form check of one interaction between fresh nodes: each endpoint
    ends with exactly {(e, other, t): (1-α)·α} and norm β."""
    alpha, beta, k = 0.3, 0.8, 4
    params = TpprParams.create((alpha,), (beta,), k)
    state = init_tppr_state(1, 4, k)
    state, _ = run_stream(
        state,
        params,
        np.array([1], np.int32),
        np.array([2], np.int32),
        np.array([3], np.int32),
        np.array([5.0]),
        np.array([1], np.int32),
        chunk=1,
    )
    assert dense_row_dict(state, 0, 1) == pytest.approx({(1, 2): (1 - alpha) * alpha})
    assert dense_row_dict(state, 0, 2) == pytest.approx({(1, 1): (1 - alpha) * alpha})
    _, _, _, _, norm = unpack_state(state, 1, k)
    assert float(norm[0, 1]) == pytest.approx(beta)
    assert float(norm[0, 2]) == pytest.approx(beta)
    assert dense_row_dict(state, 0, 3) == {}


def test_valid_mask_skips_updates():
    """Padding edges (valid=False) must not mutate the state."""
    import jax

    from zebra_tpu.index.streaming import streaming_scan

    params = TpprParams.create((0.1,), (0.9,), 4)
    state = init_tppr_state(1, 6, 4)
    src = np.array([1, 2, 0, 0], np.int32)
    dst = np.array([2, 3, 0, 0], np.int32)
    neg = np.array([4, 4, 0, 0], np.int32)
    ts = np.array([1.0, 2.0, 0.0, 0.0], np.float32)
    eidx = np.array([1, 2, 0, 0], np.int32)
    valid = np.array([True, True, False, False])
    state, _ = streaming_scan(state, params, src, dst, neg, ts, eidx, valid)

    ref_state = init_tppr_state(1, 6, 4)
    ref_state, _ = streaming_scan(
        ref_state, params, src[:2], dst[:2], neg[:2], ts[:2], eidx[:2],
        np.array([True, True]),
    )
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fill_scan_equals_streaming_state():
    """fill_scan (no extraction) must land on the identical state as the
    extracting scan — the epoch-boundary handoff retains state instead of
    replaying (reference compute_val_tppr, util.py:787)."""
    import jax

    from zebra_tpu.index.streaming import fill_scan

    n_nodes, n_events = 20, 100
    src, dst, neg, ts, eidx = random_stream(n_events, n_nodes, seed=11)
    params = TpprParams.create((0.1, 0.5), (0.9, 0.7), 6)

    s1 = init_tppr_state(2, n_nodes, 6)
    s1, _ = run_stream(s1, params, src, dst, neg, ts, eidx, chunk=32)

    s2 = init_tppr_state(2, n_nodes, 6)
    s2 = fill_scan(
        s2, params, src, dst, ts.astype(np.float32), eidx,
        np.ones(n_events, bool),
    )
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
