"""Per-epoch training-throughput microbench on the bench-scale synthetic
stream — the A/B harness behind the RESULTS.md optimization trajectory.

Runs the same workload as bench.py but prints every epoch (so service-rate
drift is visible — the tunneled TPU's effective rate moves ±15% between
sessions; only back-to-back A/Bs are comparable) and takes config overrides
on the command line, e.g.::

    python scripts/train_microbench.py                       # defaults
    python scripts/train_microbench.py memory_dtype=float32
    python scripts/train_microbench.py lazy_unique_cap=12000 epochs=6
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    from zebra_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache(jax)

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer

    def convert(default, v: str):
        """Parse an override against the field's default: bools accept
        true/false/1/0 (bool('false') is True — the one-liner
        type(default)(v) silently inverted 'off' A/B arms), sequences split
        on commas, None-defaulted fields stay strings."""
        if isinstance(default, bool):
            if v.lower() in ("1", "true", "yes", "on"):
                return True
            if v.lower() in ("0", "false", "no", "off"):
                return False
            raise ValueError(f"boolean override needs true/false, got {v!r}")
        if isinstance(default, (tuple, list)):
            elem = type(default[0]) if len(default) else float
            return tuple(elem(x) for x in v.split(","))
        if default is None:
            return v
        return type(default)(v)

    overrides = {}
    n_epochs = 5
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        if k == "epochs":
            n_epochs = int(v)
            continue
        field = Config.__dataclass_fields__[k]
        overrides[k] = convert(field.default, v)

    data, edge_feats = synthetic_stream(
        n_events=120_000, n_users=20_000, n_items=20_000, edge_dim=172,
        seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    base = dict(
        data="bench", bs=200, node_dim=100, time_dim=100, memory_dim=100,
        topk=20, alpha_list=(0.1, 0.1), beta_list=(0.05, 0.95),
        tppr_strategy="streaming", checkpoint_dir="/tmp/zebra_mb_ckpt",
    )
    base.update(overrides)  # overrides may retarget the bench fields too
    cfg = Config(**base)
    trainer = Trainer(cfg, splits, edge_feats)
    trainer.train_epoch()  # compile
    n = splits.train.n_interactions
    n_seeds = max(1, cfg.parallel_runs)
    for _ in range(n_epochs):
        t0 = time.time()
        r = trainer.train_epoch()
        jax.block_until_ready(trainer.params)
        dt = time.time() - t0
        import numpy as np

        ap = float(np.asarray(r.ap).mean())
        agg = f"  aggregate {n_seeds * n / dt:.0f} ev/s" if n_seeds > 1 else ""
        print(f"epoch {dt:.3f}s  {n/dt:.0f} ev/s  ap={ap:.4f}  "
              f"(index_s {r.index_seconds:.3f}){agg}", flush=True)


if __name__ == "__main__":
    main()
