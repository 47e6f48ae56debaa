"""Eval-phase (validate) wall-time microbench — the A/B harness for the
fused eval store+commit. Same workload as bench.py; prints per-iteration
validate() seconds (transductive + inductive val over the 15%+15% splits).

    python scripts/eval_microbench.py            # 4 timed validates
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

    data, edge_feats = synthetic_stream(
        n_events=120_000, n_users=20_000, n_items=20_000, edge_dim=172,
        seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="bench", bs=200, node_dim=100, time_dim=100, memory_dim=100,
        topk=20, alpha_list=(0.1, 0.1), beta_list=(0.05, 0.95),
        tppr_strategy="streaming", checkpoint_dir="/tmp/zebra_bench_ckpt",
    )
    trainer = Trainer(cfg, splits, edge_feats)
    trainer.train_epoch()          # warm state + compiles
    # every iteration must start from the same train-end state: validate()
    # itself leaves (mem, index) at val-end, which would make iteration 1
    # time differently from later ones
    from zebra_tpu.train.loop import _copy

    mem0, idx0 = _copy(trainer.mem), _copy(trainer.index_state)
    trainer.validate()             # compile the eval phase
    n_val = splits.val.n_interactions + splits.new_node_val.n_interactions
    for _ in range(4):
        trainer.mem, trainer.index_state = _copy(mem0), _copy(idx0)
        jax.block_until_ready(trainer.mem)
        t0 = time.time()
        trans, induct = trainer.validate()
        dt = time.time() - t0
        print(f"validate: {dt:.3f}s  ({n_val / dt:.0f} ev/s)  "
              f"ap={trans.ap:.4f}/{induct.ap:.4f}", flush=True)


if __name__ == "__main__":
    main()
