"""Measure the pending-message structure the train-forward lazy update sees.

Round-2 review hypothesized the pending set is bounded by the previous
batch's <= 2b senders, which would let the updater cell run on ~400 rows
instead of per-position over all M*3b*k selected neighbors. Reference
semantics say otherwise: update_memory (reference model/tgn_model.py:156,
modules/memory_updater.py:29-43) clears the flags of this batch's
*positives*, and get_raw_messages -> store_raw_messages (tgn_model.py:159-168)
re-sets the flags of this batch's *senders* - and those are the same node
set (src union dst). Net effect per batch: flags of the batch's nodes end SET,
and no other node's flag is ever cleared during training. So a node is
pending iff it has appeared in ANY earlier batch - the pending set grows to
all-seen-so-far, and T-PPR-selected neighbors (which are by construction
previously-seen nodes) are pending with density ~ 1.

This script measures, over a synthetic heavy-tail stream (bench config):
  - density of pending flags among valid selected-neighbor slots
    (fraction of positions whose lazy GRU application the reference requires);
  - the fraction attributable to the previous batch's senders alone
    (what the <=2b-sender formulation would cover);
  - unique selected nodes per batch (the within-batch dedup opportunity,
    already measured: --lazy_unique_cap, NOTES.md).

Runs on CPU (JAX_PLATFORMS=cpu recommended); the flag dynamics are exact
host-side bookkeeping, only the index queries run through the real scan.

    JAX_PLATFORMS=cpu python scripts/lazy_pending_stats.py [n_batches]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    import jax.numpy as jnp

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.index.streaming import (
        TpprParams,
        init_tppr_state,
        streaming_scan,
    )

    cfg = Config(
        data="stats", bs=200, topk=20, alpha_list=(0.1, 0.1),
        beta_list=(0.05, 0.95), tppr_strategy="streaming",
    )
    data, _ = synthetic_stream(
        n_events=n_batches * cfg.bs + 1000, n_users=20_000, n_items=20_000,
        edge_dim=4, seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    tr = splits.train
    n_nodes = splits.n_nodes + 1
    rs = np.random.RandomState(0)
    params = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)
    state = init_tppr_state(cfg.n_tppr, n_nodes, cfg.topk)

    pending = np.zeros(n_nodes, bool)   # reference flag semantics
    prev_senders = np.zeros(0, np.int64)
    dens, prev_cov, uniq_frac = [], [], []
    for bi in range(min(n_batches, tr.n_interactions // cfg.bs)):
        lo, hi = bi * cfg.bs, (bi + 1) * cfg.bs
        src = tr.sources[lo:hi].astype(np.int32)
        dst = tr.destinations[lo:hi].astype(np.int32)
        t = tr.timestamps[lo:hi].astype(np.float32)
        eidx = tr.edge_idxs[lo:hi].astype(np.int32)
        neg = rs.randint(1, n_nodes, cfg.bs).astype(np.int32)
        state, q = streaming_scan(
            state, params, jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(neg), jnp.asarray(t), jnp.asarray(eidx),
            jnp.ones(cfg.bs, bool),
        )
        nbr = np.asarray(q.nbr).reshape(-1)
        w = np.asarray(q.w).reshape(-1)
        sel = nbr[w > 0]                      # valid selected positions
        if sel.size:
            flags = pending[sel]
            dens.append(flags.mean())
            in_prev = np.isin(sel, prev_senders)
            # positions whose pending flag the <=2b-sender window explains
            prev_cov.append(
                (flags & in_prev).sum() / max(flags.sum(), 1)
            )
            uniq_frac.append(np.unique(sel).size / sel.size)
        # reference batch end: commit positives (clear) then store senders
        # (set) - same node set, so the batch's nodes end pending
        senders = np.concatenate([src, dst])
        pending[senders] = True
        prev_senders = senders

    dens, prev_cov, uniq_frac = map(np.asarray, (dens, prev_cov, uniq_frac))
    n = len(dens)
    print(f"batches measured: {n} (bs={cfg.bs}, M={cfg.n_tppr}, k={cfg.topk})")
    for name, x in (
        ("pending density among valid selected slots", dens),
        ("fraction of pending covered by prev-batch senders", prev_cov),
        ("unique/total selected positions", uniq_frac),
    ):
        print(f"{name}: mean {x.mean():.4f}  p10 {np.percentile(x, 10):.4f}  "
              f"p90 {np.percentile(x, 90):.4f}  last {x[-1]:.4f}")
    print(
        "\nconclusion: the lazy GRU must run for ~all selected positions "
        "(pending density -> 1 as the stream ages); a prev-batch-sender "
        "window would cover only the prev_cov fraction and silently skip "
        "the rest - not an exact reformulation. The remaining exact lever "
        "is within-batch dedup (--lazy_unique_cap, measured in NOTES.md)."
    )


if __name__ == "__main__":
    main()
