"""Serving microbenchmark: LinkPredictor score() latency and observe()
ingest throughput on one chip.

Trains briefly on the bench-scale synthetic stream, snapshots the trainer
into a LinkPredictor, then measures:
- score(): median latency per call and scores/s at several batch sizes
  (read-only index extraction + eval-mode forward);
- observe(): events/s for streaming new interactions through the index +
  the eval-mode memory protocol.

On tunneled deployments each host dispatch costs ~30ms, which floors the
small-batch latency; direct-attached chips will see the batch-compute cost
instead (the printed large-batch throughput is the tunnel-insensitive
number)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    ens_n = 0
    for arg in sys.argv[1:]:
        if "=" not in arg:
            raise SystemExit(f"usage: serve_bench.py [ensemble=S]  (got {arg!r})")
        k, v = arg.split("=", 1)
        if k == "ensemble":
            ens_n = int(v)
        else:
            raise SystemExit(f"unknown option {k!r} (only ensemble=S)")

    from zebra_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache(jax)

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.serve import LinkPredictor
    from zebra_tpu.train.loop import Trainer

    data, edge_feats = synthetic_stream(
        n_events=120_000, n_users=20_000, n_items=20_000, edge_dim=172,
        seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="servebench", bs=200, node_dim=100, time_dim=100,
        memory_dim=100, topk=20, alpha_list=(0.1, 0.1),
        beta_list=(0.05, 0.95), tppr_strategy="streaming",
        checkpoint_dir="/tmp/zebra_serve_ckpt",
    )
    if ens_n > 1:
        # ensemble serving arm (`ensemble=S`): S seeds trained in one
        # seed-parallel pass, served as a deep ensemble — compare its
        # score/observe cost against the single-model numbers above
        from zebra_tpu.serve import EnsemblePredictor

        cfg = cfg.replace(parallel_runs=ens_n)
        trainer = Trainer(cfg, splits, edge_feats)
        cfg = trainer.cfg
        trainer.train_epoch()
        server = EnsemblePredictor.from_trainer(trainer)
        print(f"ensemble of {server.n_models} members", flush=True)
    else:
        trainer = Trainer(cfg, splits, edge_feats)
        cfg = trainer.cfg  # runtime-filled (n_nodes/n_edges/edge_dim)
        trainer.train_epoch()
        server = LinkPredictor.from_trainer(trainer)

    rng = np.random.default_rng(0)
    t_now = float(data.timestamps.max()) + 1.0
    for b in (1, 32, 256, 2048):
        src = rng.integers(1, cfg.n_nodes, b).astype(np.int32)
        dst = rng.integers(1, cfg.n_nodes, b).astype(np.int32)
        ts = np.full(b, t_now, np.float32)
        server.score(src, dst, ts)  # compile
        lat = []
        for _ in range(20):
            t0 = time.time()
            p = server.score(src, dst, ts)
            lat.append(time.time() - t0)
        med = float(np.median(lat))
        print(f"score  b={b:5d}: {med*1e3:7.2f} ms/call  "
              f"{b/med:10.0f} scores/s", flush=True)
        assert p.shape == (b,) and np.isfinite(p).all()

    for b in (256, 2048):
        src = rng.integers(1, cfg.n_nodes, b).astype(np.int32)
        dst = rng.integers(1, cfg.n_nodes, b).astype(np.int32)
        ts = np.full(b, t_now, np.float32)
        eidx = np.arange(1, b + 1, dtype=np.int32)
        def sync():
            # observe() dispatches asynchronously; force completion by
            # reading back one scalar of the updated state
            float(np.asarray(server.mem.last_update).ravel()[0])

        server.observe(src, dst, ts, eidx)  # compile
        sync()
        n_calls = 10
        t0 = time.time()
        for _ in range(n_calls):
            server.observe(src, dst, ts, eidx)
        sync()
        dt = (time.time() - t0) / n_calls
        print(f"observe b={b:5d}: {dt*1e3:7.2f} ms/call  "
              f"{b/dt:10.0f} events/s", flush=True)


if __name__ == "__main__":
    main()
