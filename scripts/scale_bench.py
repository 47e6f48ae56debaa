"""Wiki-Talk-scale throughput check: a 1.47M-event synthetic stream over
~1.14M nodes with no edge features (the reference's largest dataset shape,
BASELINE.md Table 3) — prints per-epoch train events/s and one validate()
time. The RESULTS.md "Wiki-Talk-scale" row comes from here.

    python scripts/scale_bench.py                 # full scale, ~5 min
    python scripts/scale_bench.py n_events=200000 # smaller smoke
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from zebra_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache(jax)

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer

    n_events, epochs, par = 1_470_000, 3, 1
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        if k == "n_events":
            n_events = int(v)
        elif k == "epochs":
            epochs = int(v)
        elif k == "parallel_runs":
            par = int(v)

    t0 = time.time()
    data, edge_feats = synthetic_stream(
        n_events=n_events, n_users=570_000, n_items=570_000, edge_dim=0,
        seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="wtscale", bs=200, node_dim=100, time_dim=100, memory_dim=100,
        topk=20, alpha_list=(0.1, 0.1), beta_list=(0.05, 0.95),
        tppr_strategy="streaming", checkpoint_dir="/tmp/zebra_scale_ckpt",
        parallel_runs=par,
    )
    print(f"stream ready ({time.time() - t0:.0f}s); constructing trainer "
          f"(n_nodes={splits.n_nodes}, train={splits.train.n_interactions})",
          flush=True)
    trainer = Trainer(cfg, splits, edge_feats)
    n_train = splits.train.n_interactions
    trainer.train_epoch()  # compile + warm
    for i in range(epochs):
        t1 = time.time()
        r = trainer.train_epoch()
        jax.block_until_ready(trainer.params)
        dt = time.time() - t1
        ap = float(np.asarray(r.ap).mean())
        agg = f"  aggregate {par * n_train / dt:.0f} ev/s" if par > 1 else ""
        print(f"epoch {dt:.2f}s  {n_train / dt:.0f} ev/s  ap={ap:.4f}{agg}",
              flush=True)
    t1 = time.time()
    trans, induct = trainer.validate()
    v_ap = float(np.asarray(trans.ap).mean())
    nn_ap = float(np.asarray(induct.ap).mean())
    print(f"validate {time.time() - t1:.2f}s  ap={v_ap:.4f}/{nn_ap:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
