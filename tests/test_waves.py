"""Wave-parallel SANTA scan: schedule validity and bit-exact equivalence
with the sequential edge scan."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from zebra_tpu.index.streaming import (
    TpprParams,
    init_tppr_state,
    streaming_scan,
    unpack_queries,
)
from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk
from zebra_tpu.native.ingest import wave_schedule


def random_stream(n_events, n_nodes, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(1, n_nodes, n_events).astype(np.int32)
    dst = rng.randint(1, n_nodes, n_events).astype(np.int32)
    neg = rng.randint(1, n_nodes, n_events).astype(np.int32)
    ts = np.cumsum(rng.exponential(1.0, n_events)).astype(np.float32)
    eidx = np.arange(1, n_events + 1, dtype=np.int32)
    return src, dst, neg, ts, eidx


def test_schedule_respects_dependencies():
    """The real invariant: executing waves in order (within a wave all reads
    precede all writes) must make every edge observe exactly the node
    versions it observes under sequential execution."""
    n_nodes, e, cap = 50, 500, 8
    src, dst, neg, ts, eidx = random_stream(e, n_nodes, seed=0)
    wave, slot, n_waves = wave_schedule(src, dst, neg, n_nodes, cap)
    assert slot.max() < cap
    assert np.bincount(wave).max() <= cap

    # sequential versions read by each edge
    ver = np.zeros(n_nodes, np.int64)
    seq_reads = np.zeros((e, 3), np.int64)
    for i in range(e):
        seq_reads[i] = [ver[src[i]], ver[dst[i]], ver[neg[i]]]
        ver[src[i]] += 1
        ver[dst[i]] += 1

    # wave-order versions
    ver = np.zeros(n_nodes, np.int64)
    wave_reads = np.zeros((e, 3), np.int64)
    for w in range(n_waves):
        idx = np.where(wave == w)[0]
        for i in idx:  # reads first
            wave_reads[i] = [ver[src[i]], ver[dst[i]], ver[neg[i]]]
        both = [(s, d) for s, d in zip(src[idx], dst[idx])]
        flat = [v for s, d in both for v in ((s,) if s == d else (s, d))]
        assert len(set(flat)) == len(flat), f"write collision in wave {w}"
        for i in idx:  # then writes
            ver[src[i]] += 1
            ver[dst[i]] += 1

    np.testing.assert_array_equal(wave_reads, seq_reads)


def test_wave_scan_bit_exact_vs_sequential():
    n_nodes, e = 40, 600
    src, dst, neg, ts, eidx = random_stream(e, n_nodes, seed=3)
    params = TpprParams.create((0.1, 0.2), (0.9, 0.8), 6)

    s_seq = init_tppr_state(2, n_nodes, 6)
    s_seq, q_seq = streaming_scan(
        s_seq, params, src, dst, neg, ts, eidx, np.ones(e, bool)
    )

    # include some invalid tail edges to exercise the sentinel path
    pad = 13
    def padded(a):
        return np.concatenate([a, np.zeros(pad, a.dtype)])
    valid = np.concatenate([np.ones(e, bool), np.zeros(pad, bool)])

    flat_valid, n_waves = wave_flat_index(src, dst, neg, n_nodes, cap=8,
                                          wave_bucket=16)
    flat = np.full(e + pad, n_waves * 8, np.int32)
    flat[:e] = flat_valid

    s_wav = init_tppr_state(2, n_nodes, 6)
    s_wav, packed = wave_scan_chunk(
        s_wav, params, padded(src), padded(dst), padded(neg), padded(ts),
        padded(eidx), valid, jnp.asarray(flat), n_waves, 8,
    )
    q_wav = unpack_queries(packed[:e], jnp.asarray(ts), 2, 6)

    np.testing.assert_array_equal(
        np.asarray(s_seq.data), np.asarray(s_wav.data),
        err_msg="state diverges",
    )
    for a, b in zip(q_seq, q_wav):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="queries diverge")
    # unscheduled edges emit zero rows
    np.testing.assert_array_equal(np.asarray(packed[e:]), 0.0)


def test_wave_scan_with_self_loops():
    params = TpprParams.create((0.2,), (0.7,), 4)
    src = np.array([1, 2, 2, 3], np.int32)
    dst = np.array([2, 2, 3, 1], np.int32)  # includes a self-loop (2,2)
    neg = np.array([3, 1, 1, 2], np.int32)
    ts = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    eidx = np.array([1, 2, 3, 4], np.int32)

    s_seq = init_tppr_state(1, 5, 4)
    s_seq, _ = streaming_scan(s_seq, params, src, dst, neg, ts, eidx,
                              np.ones(4, bool))
    flat, n_waves = wave_flat_index(src, dst, neg, 5, cap=4, wave_bucket=4)
    s_wav = init_tppr_state(1, 5, 4)
    s_wav, _ = wave_scan_chunk(
        s_wav, params, src, dst, neg, ts, eidx, np.ones(4, bool),
        jnp.asarray(flat), n_waves, 4,
    )
    np.testing.assert_array_equal(np.asarray(s_seq.data), np.asarray(s_wav.data))


def test_owner_aligned_schedule():
    """Owner-aligned scheduling keeps every edge in its src row owner's lane
    block, preserves all data dependencies, and the wave scan over it stays
    bit-exact with the sequential scan."""
    n_nodes, e, cap, n_shards = 64, 500, 16, 4
    block = cap // n_shards
    rows_per_shard = -(-n_nodes // n_shards)
    src, dst, neg, ts, eidx = random_stream(e, n_nodes, seed=5)

    wave, slot, n_waves = wave_schedule(src, dst, neg, n_nodes, cap,
                                        n_shards=n_shards)
    assert slot.max() < cap

    # alignment: slot block == owner(src)
    np.testing.assert_array_equal(slot // block, src // rows_per_shard)

    # same dependency invariant as the unaligned scheduler
    ver = np.zeros(n_nodes, np.int64)
    seq_reads = np.zeros((e, 3), np.int64)
    for i in range(e):
        seq_reads[i] = [ver[src[i]], ver[dst[i]], ver[neg[i]]]
        ver[src[i]] += 1
        ver[dst[i]] += 1
    ver = np.zeros(n_nodes, np.int64)
    wave_reads = np.zeros((e, 3), np.int64)
    for w in range(n_waves):
        idx = np.where(wave == w)[0]
        for i in idx:
            wave_reads[i] = [ver[src[i]], ver[dst[i]], ver[neg[i]]]
        both = [(s, d) for s, d in zip(src[idx], dst[idx])]
        flat = [v for s, d in both for v in ((s,) if s == d else (s, d))]
        assert len(set(flat)) == len(flat), f"write collision in wave {w}"
        for i in idx:
            ver[src[i]] += 1
            ver[dst[i]] += 1
    np.testing.assert_array_equal(wave_reads, seq_reads)

    # the device scan over the aligned schedule matches sequential
    params = TpprParams.create((0.1,), (0.9,), 5)
    s_seq = init_tppr_state(1, n_nodes, 5)
    s_seq, _ = streaming_scan(s_seq, params, src, dst, neg, ts, eidx,
                              np.ones(e, bool))
    flat_idx, n_w = wave_flat_index(src, dst, neg, n_nodes, cap=cap,
                                    wave_bucket=16, n_shards=n_shards)
    s_wav = init_tppr_state(1, n_nodes, 5)
    s_wav, _ = wave_scan_chunk(
        s_wav, params, src, dst, neg, ts, eidx, np.ones(e, bool),
        jnp.asarray(flat_idx), n_w, cap,
    )
    np.testing.assert_array_equal(np.asarray(s_seq.data), np.asarray(s_wav.data))


def test_owner_aligned_python_fallback_matches_native():
    """The pure-python fallback scheduler implements the same algorithm as
    the C++ one (both variants)."""
    from zebra_tpu.native import ingest

    if not ingest.native_available():
        import pytest

        pytest.skip("native library unavailable")
    n_nodes, e = 32, 200
    src, dst, neg, _, _ = random_stream(e, n_nodes, seed=9)

    for n_shards in (1, 4):
        w_c, s_c, n_c = ingest.wave_schedule(src, dst, neg, n_nodes, 8,
                                             n_shards=n_shards)
        lib, ingest._lib = ingest._lib, None
        flag = ingest._build_failed
        ingest._build_failed = True
        try:
            w_p, s_p, n_p = ingest.wave_schedule(src, dst, neg, n_nodes, 8,
                                                 n_shards=n_shards)
        finally:
            ingest._lib, ingest._build_failed = lib, flag
        assert n_c == n_p
        np.testing.assert_array_equal(w_c, w_p)
        np.testing.assert_array_equal(s_c, s_p)


@pytest.mark.parametrize("seed,cap,skew", [(7, 1, False), (11, 4, True),
                                           (13, 8, True), (17, 3, False)])
def test_wave_scan_fuzz_bit_exact(seed, cap, skew):
    """Fuzz the scheduler + wave scan against the sequential edge scan:
    random streams (optionally with a hot node touching ~1/3 of events,
    the worst case for wave packing), tiny caps down to 1, self-loops."""
    n_nodes, e = 30, 300
    rng = np.random.RandomState(seed)
    src = rng.randint(1, n_nodes, e).astype(np.int32)
    dst = rng.randint(1, n_nodes, e).astype(np.int32)
    neg = rng.randint(1, n_nodes, e).astype(np.int32)
    if skew:  # hot node: worst case for packing; also forces self-loops
        hot = rng.randint(0, e, e // 3)
        src[hot] = 1
        dst[hot[: e // 9]] = 1
    ts = np.cumsum(rng.exponential(1.0, e)).astype(np.float32)
    eidx = np.arange(1, e + 1, dtype=np.int32)
    params = TpprParams.create((0.15,), (0.7,), 4)

    s_seq = init_tppr_state(1, n_nodes, 4)
    s_seq, _ = streaming_scan(
        s_seq, params, src, dst, neg, ts, eidx, np.ones(e, bool)
    )

    flat, n_waves = wave_flat_index(src, dst, neg, n_nodes, cap=cap,
                                    wave_bucket=8)
    s_wav = init_tppr_state(1, n_nodes, 4)
    s_wav, _ = wave_scan_chunk(
        s_wav, params, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(neg),
        jnp.asarray(ts), jnp.asarray(eidx), jnp.ones(e, bool),
        jnp.asarray(flat), n_waves, cap,
    )
    np.testing.assert_array_equal(
        np.asarray(s_seq.data), np.asarray(s_wav.data),
        err_msg=f"seed={seed} cap={cap} skew={skew}",
    )


def test_wave_count_padding_is_invariant():
    """Padding a schedule's n_waves upward (the per-stream high-water mark,
    loop.py:_wave_scheds) must not change scan results: the extra waves hold
    no valid lanes."""
    import jax.numpy as jnp
    import numpy as np

    from zebra_tpu.index.streaming import TpprParams, init_tppr_state
    from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk

    rng = np.random.RandomState(0)
    n_nodes, e, cap = 64, 256, 8
    src = rng.randint(1, n_nodes, e).astype(np.int32)
    dst = rng.randint(1, n_nodes, e).astype(np.int32)
    neg = rng.randint(1, n_nodes, e).astype(np.int32)
    t = np.sort(rng.rand(e)).astype(np.float32) * 100
    eidx = np.arange(1, e + 1, dtype=np.int32)
    valid = np.ones(e, bool)
    params = TpprParams.create((0.1,), (0.9,), 4)

    flat, n_waves = wave_flat_index(src, dst, neg, n_nodes, cap=cap)
    outs = []
    for extra in (0, 256):
        state = init_tppr_state(1, n_nodes, 4)
        s, rows = wave_scan_chunk(
            state, params, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(neg), jnp.asarray(t), jnp.asarray(eidx),
            jnp.asarray(valid), jnp.asarray(flat), n_waves + extra, cap,
            False,
        )
        outs.append((np.asarray(s.data), np.asarray(rows)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_multi_neg_wave_scan_matches_per_seed_sequential():
    """Seed-parallel extraction: ONE wave scan scheduled over S negative
    streams must (a) leave the index state bit-identical to any single-seed
    scan (negatives are extraction-only — SANTA updates touch src/dst alone),
    and (b) emit, for every seed, exactly the queries that seed's own
    sequential scan would."""
    n_nodes, e, cap, s_seeds = 40, 300, 8, 3
    src, dst, _, ts, eidx = random_stream(e, n_nodes, seed=7)
    rng = np.random.RandomState(11)
    negs = rng.randint(1, n_nodes, (s_seeds, e)).astype(np.int32)
    valid = np.ones(e, bool)
    params = TpprParams.create((0.1, 0.2), (0.9, 0.5), 5)
    m, k = 2, 5

    flat, n_waves = wave_flat_index(src, dst, negs, n_nodes, cap=cap)
    state_w, rows = wave_scan_chunk(
        init_tppr_state(m, n_nodes, k), params,
        jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(negs.T),                      # device layout [E, S]
        jnp.asarray(ts), jnp.asarray(eidx), jnp.asarray(valid),
        jnp.asarray(flat), n_waves, cap,
    )
    assert rows.shape[1] == 2 + s_seeds

    for s in range(s_seeds):
        state_s, q_seq = streaming_scan(
            init_tppr_state(m, n_nodes, k), params,
            src, dst, negs[s], ts, eidx, valid,
        )
        np.testing.assert_array_equal(
            np.asarray(state_w.data), np.asarray(state_s.data),
            err_msg=f"index state differs (seed {s})",
        )
        q_w = unpack_queries(rows[:, [0, 1, 2 + s]], jnp.asarray(ts), m, k)
        for a, b in zip(q_w, q_seq):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"seed {s}")
