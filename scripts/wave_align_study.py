"""Owner-aligned wave scheduling: wave-count / occupancy cost vs n_shards.

The aligned scheduler (native/ingest.cc zt_wave_schedule_aligned) pins each
edge to the lane block of its src row's owner shard, keeping src-row reads
host-local under multi-process row sharding — at the cost of wave-count
inflation: each shard's lane block is cap/n_shards wide, so a shard's
hottest nodes serialize within their own block instead of spreading over
the full cap lanes. This host-only study quantifies that cost on the bench
stream (heavy-tail skew: hottest node ~1% of events) and under a harsher
skew, and grounds the auto-enable policy
(zebra_tpu.train.loop.resolve_owner_aligned: on iff multi-process).

    python scripts/wave_align_study.py [n_events]

Results table lives in docs/SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def study(src, dst, neg, n_nodes, cap, shard_list, interleave=False):
    from zebra_tpu.native.ingest import wave_schedule

    if interleave:
        from zebra_tpu.parallel import interleave_permutation

    rows = []
    base = None
    for s in shard_list:
        if interleave and s > 1:
            perm = interleave_permutation(n_nodes, s)
            a, b, c = perm[src], perm[dst], perm[neg]
        else:
            a, b, c = src, dst, neg
        t0 = time.time()
        _, _, n_waves = wave_schedule(a, b, c, n_nodes, cap, s)
        dt = time.time() - t0
        occ = len(src) / (n_waves * cap)
        if base is None:
            base = n_waves
        rows.append((s, n_waves, n_waves / base, occ, dt))
    return rows


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    from zebra_tpu.data.synthetic import synthetic_stream

    rs = np.random.RandomState(0)
    print(f"cap=64, {n_events} events")
    for label, skew in (("bench skew (hottest ~1%)", 0.9),
                        ("harsh skew (hottest ~5%)", 1.4)):
        data, _ = synthetic_stream(
            n_events=n_events, n_users=20_000, n_items=20_000, edge_dim=0,
            seed=0, skew=skew,
        )
        src = data.sources.astype(np.int32)
        dst = data.destinations.astype(np.int32)
        n_nodes = int(max(src.max(), dst.max())) + 1
        neg = rs.randint(1, n_nodes, n_events).astype(np.int32)
        hot = np.bincount(np.concatenate([src, dst])).max() / (2 * n_events)
        # node-id interleaving needs the Trainer's padded N (multiple of 128)
        n_pad = -(-n_nodes // 128) * 128
        print(f"\n== {label}: measured hottest {100 * hot:.2f}% ==")
        print(f"{'n_shards':>8s} {'n_waves':>8s} {'inflation':>9s} "
              f"{'occupancy':>9s} {'sched_s':>8s}   (raw ids | interleaved)")
        raw = study(src, dst, neg, n_pad, 64, [1, 2, 4, 8, 16])
        il = study(src, dst, neg, n_pad, 64, [1, 2, 4, 8, 16],
                   interleave=True)
        for (s, w, infl, occ, dt), (_, wi, infli, occi, _) in zip(raw, il):
            print(f"{s:8d} {w:8d} {infl:9.2f} {occ:9.3f} {dt:8.3f}   "
                  f"| {wi:8d} {infli:9.2f} {occi:9.3f}")


if __name__ == "__main__":
    main()
