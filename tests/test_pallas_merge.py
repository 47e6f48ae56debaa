"""Pallas wave-merge kernel: bit-identical to the XLA merge (interpret mode
on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zebra_tpu.index.pallas_merge import merge_both_pallas
from zebra_tpu.index.streaming import (
    TpprParams,
    _merge_both,
    _split_rows,
    init_tppr_state,
    streaming_scan,
)


def _random_state_rows(w, m, k, n_nodes, seed):
    """Realistic gathered rows: run a short stream, then gather random rows."""
    rng = np.random.RandomState(seed)
    e = 300
    src = rng.randint(1, n_nodes, e).astype(np.int32)
    dst = rng.randint(1, n_nodes, e).astype(np.int32)
    neg = rng.randint(1, n_nodes, e).astype(np.int32)
    ts = np.cumsum(rng.exponential(1.0, e)).astype(np.float32)
    eidx = np.arange(1, e + 1, dtype=np.int32)
    params = TpprParams.create(
        tuple([0.1, 0.2, 0.0][:m]), tuple([0.9, 0.6, 0.5][:m]), k
    )
    state = init_tppr_state(m, n_nodes, k)
    state, _ = streaming_scan(state, params, src, dst, neg, ts, eidx,
                              np.ones(e, bool))

    g_src = rng.randint(1, n_nodes, w).astype(np.int32)
    g_dst = rng.randint(1, n_nodes, w).astype(np.int32)
    g_neg = rng.randint(1, n_nodes, w).astype(np.int32)
    sdn = np.stack([g_src, g_dst, g_neg], axis=1)
    rows = jnp.asarray(np.asarray(state.data))[sdn]      # [W, 3, F]
    fields3, norm3 = _split_rows(rows, m, k)
    g_ts = (ts[-1] + 1 + rng.rand(w)).astype(np.float32)
    g_eidx = np.arange(e + 1, e + 1 + w, dtype=np.int32)
    return params, fields3, norm3[:, :2], g_src, g_dst, g_eidx, g_ts


def test_kernel_matches_xla_merge():
    """Kernel and XLA merge agree to float rounding: identical entry sets
    (boundary entries may differ only when weights are within rounding of
    the k-th cut — compiler FMA contraction differs by an ulp) and weights
    within 1e-5 relative."""
    for m, k, seed in ((1, 5, 0), (2, 10, 1), (2, 20, 2)):
        w = 16
        params, fields3, norm_sd, src, dst, eidx, ts = _random_state_rows(
            w, m, k, 30, seed
        )
        want_f, want_n = jax.vmap(
            lambda f3, nsd, s, d, e, tt: _merge_both(f3, nsd, s, d, e, tt, params)
        )(fields3, norm_sd, jnp.asarray(src), jnp.asarray(dst),
          jnp.asarray(eidx), jnp.asarray(ts))

        got_f, got_n = merge_both_pallas(
            fields3, norm_sd, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(eidx), jnp.asarray(ts), params, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_n), np.asarray(want_n), rtol=1e-6,
            err_msg=f"norms m={m} k={k}",
        )
        gf, wf = np.asarray(got_f), np.asarray(want_f)
        for wi in range(w):
            for d in range(2):
                for mi in range(m):
                    # field order: w, nbr, eidx, ts
                    g = {
                        (int(e), int(n)): (float(x), float(t))
                        for x, n, e, t in zip(*gf[wi, d, mi])
                        if x > 0
                    }
                    ww = {
                        (int(e), int(n)): (float(x), float(t))
                        for x, n, e, t in zip(*wf[wi, d, mi])
                        if x > 0
                    }
                    cut = min(x for x, _ in ww.values()) if ww else 0.0
                    for key in set(g) ^ set(ww):
                        x = (g.get(key) or ww.get(key))[0]
                        assert x == pytest.approx(cut, rel=1e-4), (wi, d, mi, key)
                    for key in set(g) & set(ww):
                        assert g[key][0] == pytest.approx(ww[key][0], rel=1e-5)
                        assert g[key][1] == ww[key][1]  # ts exact (copied)


def test_wave_scan_with_pallas_interpret():
    """End-to-end wave scan with the Pallas merge (interpret mode): states
    agree with the XLA merge to float rounding."""
    from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk

    n_nodes, e = 30, 200
    rng = np.random.RandomState(7)
    src = rng.randint(1, n_nodes, e).astype(np.int32)
    dst = rng.randint(1, n_nodes, e).astype(np.int32)
    neg = rng.randint(1, n_nodes, e).astype(np.int32)
    ts = np.cumsum(rng.exponential(1.0, e)).astype(np.float32)
    eidx = np.arange(1, e + 1, dtype=np.int32)
    valid = np.ones(e, bool)
    params = TpprParams.create((0.1, 0.2), (0.9, 0.8), 6)
    flat, n_waves = wave_flat_index(src, dst, neg, n_nodes, cap=8,
                                    wave_bucket=16)

    states = {}
    for use_pallas in (False, True):
        s = init_tppr_state(2, n_nodes, 6)
        s, q = wave_scan_chunk(
            s, params, src, dst, neg, ts, eidx, valid,
            jnp.asarray(flat), n_waves, 8, use_pallas,
        )
        states[use_pallas] = np.asarray(s.data)
    np.testing.assert_allclose(states[True], states[False], rtol=2e-4,
                               atol=1e-6)


def test_rank_topk_matches_argmax():
    """The rank-counting top-k variant (one parallel lexicographic
    comparison) selects the identical entry sequence as the k argmax
    rounds: the id/ts fields and norms are bit-equal; the weights agree to
    one ulp (the two variants compile as different programs, so FMA
    contraction in the shared scale/dedup prefix may round differently —
    same caveat as the XLA-vs-Pallas comparison above)."""
    for m, k, seed in ((1, 5, 3), (2, 10, 4), (2, 20, 5), (3, 7, 6)):
        w = 16
        params, fields3, norm_sd, src, dst, eidx, ts = _random_state_rows(
            w, m, k, 30, seed
        )
        args = (fields3, norm_sd, jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(eidx), jnp.asarray(ts), params)
        base_f, base_n = merge_both_pallas(
            *args, interpret=True, topk_impl="argmax"
        )
        rank_f, rank_n = merge_both_pallas(
            *args, interpret=True, topk_impl="rank"
        )
        base_f, rank_f = np.asarray(base_f), np.asarray(rank_f)
        # field order: w, nbr, eidx, ts — ids and timestamps are copied
        # values, exact; weights are computed, 1-ulp tolerant
        np.testing.assert_array_equal(rank_f[:, :, :, 1:], base_f[:, :, :, 1:])
        np.testing.assert_allclose(
            rank_f[:, :, :, 0], base_f[:, :, :, 0], rtol=3e-7, atol=0
        )
        np.testing.assert_array_equal(np.asarray(rank_n), np.asarray(base_n))


def test_blocked_grid_matches_single_block():
    """block_b grids the lane axis into disjoint row blocks — same math on
    the same rows, so results agree to float rounding (compiler FMA/fusion
    choices differ by block shape, ~1 ulp). The grid exists because large
    (k, wave-cap) single-block forms exceed the v5e compiler;
    resolve_pallas_block probes for it."""
    for m, k, block in ((2, 10, 16), (2, 20, 8), (1, 7, 6)):
        w = 16  # B = 2*m*w lanes
        params, fields3, norm_sd, src, dst, eidx, ts = _random_state_rows(
            w, m, k, 30, 3
        )
        args = (fields3, norm_sd, jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(eidx), jnp.asarray(ts), params)
        base_f, base_n = merge_both_pallas(*args, interpret=True)
        grid_f, grid_n = merge_both_pallas(*args, interpret=True,
                                           block_b=block)
        np.testing.assert_allclose(np.asarray(grid_f), np.asarray(base_f),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(grid_n), np.asarray(base_n),
                                   rtol=1e-6)
