"""Full-stream-length f32 drift study for the streaming T-PPR index.

The reference keeps index state in float64 host dicts
(/root/reference/utils/util.py:377-387); the dense on-device index is f32
end-to-end (norms, weights, entry timestamps — index/streaming.py). This
script drives BOTH through a Wiki-Talk-shaped stream — same event count
(default 7.8M), heavy-tail node reuse, integer-second timestamps spanning
~2.3e8 s (where f32 ulp is 16 s) — and reports, at checkpoints along the
stream:

  - norm relative error (f32 device scan vs f64 dict oracle), sampled over
    the hottest nodes (worst case: drift compounds per touch) + random nodes;
  - top-k set agreement ((eidx, nbr) identity, order-insensitive) and weight
    error over agreeing entries;
  - entry-timestamp quantization (|f32(ts) − ts|) over stored entries.

CPU-only; the device side runs the sequential fill scan (no extraction —
reference compute_val_tppr semantics) in jitted chunks.

    JAX_PLATFORMS=cpu python scripts/drift_study.py \
        [--n_events 7833140] [--n_nodes 200000] [--checkpoints 4]

At full length the f64 oracle costs a few minutes of pure Python and ~3 GB
(k-entry dicts over the seen nodes); pass a smaller --n_events for smoke.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_events", type=int, default=7_833_140)
    ap.add_argument("--n_nodes", type=int, default=200_000)
    ap.add_argument("--ts_span", type=float, default=2.3e8,
                    help="timestamp range in (integer) seconds; Wiki-Talk "
                         "spans 2320 days ≈ 2.0e8 s")
    ap.add_argument("--checkpoints", type=int, default=4)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--alpha", type=float, nargs="+", default=[0.1, 0.1])
    ap.add_argument("--beta", type=float, nargs="+", default=[0.05, 0.95])
    ap.add_argument("--sample_hot", type=int, default=200)
    ap.add_argument("--sample_rand", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tests.oracle import TpprOracle
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.index.streaming import (
        TpprParams,
        fill_scan,
        init_tppr_state,
        unpack_state,
    )

    rng = np.random.RandomState(0)
    data, _ = synthetic_stream(
        n_events=args.n_events, n_users=args.n_nodes // 2,
        n_items=args.n_nodes // 2, edge_dim=0, seed=0,
    )
    src = data.sources.astype(np.int64)
    dst = data.destinations.astype(np.int64)
    # integer-second timestamps at Wiki-Talk magnitude, exact in f64,
    # quantized (ulp up to 16 s) when stored as f32 index state
    ts64 = np.sort(
        rng.randint(1, int(args.ts_span), args.n_events)
    ).astype(np.float64)
    eidx = data.edge_idxs.astype(np.int64)
    n_nodes = int(max(src.max(), dst.max())) + 1
    m, k = len(args.alpha), args.topk

    params = TpprParams.create(tuple(args.alpha), tuple(args.beta), k)
    state = init_tppr_state(m, n_nodes, k)
    oracle = TpprOracle(n_nodes, k, args.alpha, args.beta, dtype=np.float64)

    counts = np.bincount(np.concatenate([src, dst]), minlength=n_nodes)
    hot = np.argsort(-counts)[: args.sample_hot]
    seen_any = np.where(counts > 0)[0]
    rand = rng.choice(seen_any, size=min(args.sample_rand, seen_any.size),
                      replace=False)
    sample = np.unique(np.concatenate([hot, rand]))

    # params is a static (hashable) NamedTuple — same convention as
    # wave_scan_chunk's static_argnames
    fill = jax.jit(fill_scan, static_argnums=(1,), donate_argnums=(0,))
    # chunk-aligned checkpoints: every non-final chunk keeps one static
    # shape (one jit compile); only the final remainder compiles separately
    marks = sorted({
        min(args.n_events,
            max(args.chunk,
                (args.n_events * (i + 1) // args.checkpoints)
                // args.chunk * args.chunk))
        for i in range(args.checkpoints - 1)
    } | {args.n_events})
    print(f"stream: {args.n_events} events, {seen_any.size} active nodes, "
          f"ts span {ts64[-1]:.3e} s, M={m}, k={k}, "
          f"hottest node {counts.max()} touches", flush=True)

    lo = 0
    t0 = time.time()
    for mark in marks:
        while lo < mark:
            hi = min(lo + args.chunk, mark)
            sl = slice(lo, hi)
            state = fill(
                state, params,
                jnp.asarray(src[sl], jnp.int32), jnp.asarray(dst[sl], jnp.int32),
                jnp.asarray(ts64[sl], jnp.float32),
                jnp.asarray(eidx[sl], jnp.int32),
                jnp.ones(hi - lo, bool),
            )
            for i in range(lo, hi):
                oracle.update(int(src[i]), int(dst[i]), ts64[i], int(eidx[i]))
            lo = hi

        nbr32, eidx32, ts32, w32, norm32 = unpack_state(state, m, k)
        norm_rel, jacc, w_err, ts_err = [], [], [], []
        for node in sample:
            if counts[node] == 0:
                continue
            for mm in range(m):
                n64 = oracle.norm[mm][node]
                if n64 > 0:
                    norm_rel.append(abs(norm32[mm][node] - n64) / n64)
                d64 = oracle.topk_dict(mm, node)
                live = w32[mm][node] > 0
                d32 = {
                    (int(e), int(nb)): float(w)
                    for e, nb, w in zip(
                        eidx32[mm][node][live], nbr32[mm][node][live],
                        w32[mm][node][live],
                    )
                }
                inter = set(d32) & set(d64)
                union = set(d32) | set(d64)
                if union:
                    jacc.append(len(inter) / len(union))
                w_err.extend(
                    abs(d32[key] - d64[key]) / d64[key] for key in inter
                )
                # stored entry-ts quantization vs the oracle's exact key ts
                exact = {(ky[0], ky[1]): ky[2] for ky in oracle.ppr[mm][node]}
                ts_err.extend(
                    abs(float(tv) - exact[(int(e), int(nb))])
                    for e, nb, tv in zip(
                        eidx32[mm][node][live], nbr32[mm][node][live],
                        ts32[mm][node][live],
                    )
                    if (int(e), int(nb)) in exact
                )

        def pct(x, q):
            return np.percentile(np.asarray(x), q) if len(x) else float("nan")

        print(
            f"@{mark:>9d} events ({time.time() - t0:6.0f}s): "
            f"norm rel err p50 {pct(norm_rel, 50):.2e} "
            f"p99 {pct(norm_rel, 99):.2e} max {pct(norm_rel, 100):.2e} | "
            f"topk jaccard p50 {pct(jacc, 50):.4f} p1 {pct(jacc, 1):.4f} | "
            f"w rel err p99 {pct(w_err, 99):.2e} max {pct(w_err, 100):.2e} | "
            f"entry-ts |err| max {pct(ts_err, 100):.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
