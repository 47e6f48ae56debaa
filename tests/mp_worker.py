"""Worker + shared input builder for the multi-process equivalence test
(tests/test_multiprocess.py). Run as a subprocess:

    python tests/mp_worker.py <coordinator_port> <process_id> <num_processes> \
        <local_devices> <out.npz>

Every process builds identical host inputs (deterministic construction),
shards them over the GLOBAL mesh, runs one fused training phase, and writes
the metrics plus the allgathered final state. The test asserts all processes
agree with each other and with a single-process run over the same total
device count — SURVEY.md §7 stage 6's "N-host == 1-host" equivalence, on
CPU (Gloo collectives) without a pod."""

from __future__ import annotations

import os
import sys

import numpy as np


def _force_cpu(n_local_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_inputs():
    """Deterministic tiny train-phase inputs (identical in every process)."""
    import jax

    # Pin the PRNG impl: an earlier in-suite Trainer may have set the global
    # default to the config's rbg, while fresh worker processes see threefry.
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.index.streaming import init_tppr_state
    from zebra_tpu.models.memory import init_memory
    from zebra_tpu.models.tgn import init_tgn_params
    from zebra_tpu.train.step import make_optimizer

    cfg = Config(
        data="mp", bs=8, node_dim=8, time_dim=8, memory_dim=8, topk=3,
        alpha_list=(0.1, 0.2), beta_list=(0.9, 0.8),
        tppr_strategy="streaming", message_dtype="float32",
    )
    data, edge_feats = synthetic_stream(
        n_events=160, n_users=24, n_items=24, edge_dim=4, seed=0
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    n_nodes = -(-(splits.n_nodes + 1) // 128) * 128
    cfg = cfg.replace(n_nodes=n_nodes, n_edges=splits.n_edges + 1,
                      edge_dim=edge_feats.shape[1])

    tr = splits.train
    n = tr.n_interactions
    n_batches = -(-n // cfg.bs)
    pad = n_batches * cfg.bs - n
    rng = np.random.RandomState(7)
    negs = rng.randint(1, splits.n_nodes + 1, n)

    def p(a, dtype):
        a = np.asarray(a, dtype)
        return np.concatenate([a, np.zeros(pad, dtype)]) if pad else a

    stream_np = dict(
        src=p(tr.sources, np.int32), dst=p(tr.destinations, np.int32),
        neg=p(negs, np.int32), t=p(tr.timestamps, np.float32),
        eidx=p(tr.edge_idxs, np.int32),
        valid=np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
    )
    to_np = lambda t: jax.tree.map(np.asarray, t)
    params = to_np(init_tgn_params(jax.random.PRNGKey(0), cfg))
    opt_state = to_np(make_optimizer(cfg).init(params))
    mem = to_np(init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim,
                            np.float32))
    index = to_np(init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk))
    return cfg, n_batches, params, opt_state, mem, index, stream_np, \
        np.asarray(edge_feats, np.float32)


def run_phase_on_mesh(mesh, ckpt_path=None):
    """Shard the deterministic inputs over ``mesh``, run one fused training
    phase, and return (metrics, final memory table, final index table) as
    host numpy (allgathered when shards span processes). ``ckpt_path``
    additionally saves {mem, index} through the checkpoint layer — in a
    multi-process run that exercises its collective gather + process-0
    write."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zebra_tpu.models.memory import MemoryState
    from zebra_tpu.index.streaming import TpprState
    from zebra_tpu.train.phase import Stream, run_phase

    cfg, n_batches, params, opt_state, mem_np, index_np, stream_np, ef = (
        build_inputs()
    )
    rep = NamedSharding(mesh, P())
    row = lambda ndim: NamedSharding(
        mesh, P(*(("data",) + (None,) * (ndim - 1)))
    )
    put_rep = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    put_row = lambda t: jax.tree.map(
        lambda x: jax.device_put(x, row(np.ndim(x))), t
    )

    params = put_rep(params)
    opt_state = put_rep(opt_state)
    mem = MemoryState(**put_row(mem_np._asdict()))
    index = TpprState(**put_row(index_np._asdict()))
    stream = Stream(**put_rep(stream_np))
    edge_feats = jax.device_put(ef, rep)
    rng = jax.device_put(jax.random.PRNGKey(3), rep)

    params, opt_state, mem, index, metrics = run_phase(
        cfg, True, n_batches, params, opt_state, mem, index, rng,
        edge_feats, (), stream,
    )
    jax.block_until_ready(metrics)

    if ckpt_path is not None:
        from zebra_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(ckpt_path, {"mem": mem, "index": index})

    from jax.experimental import multihost_utils

    def host(x):
        if x.is_fully_addressable:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    ms = {k: host(v) for k, v in metrics._asdict().items()}
    return ms, host(mem.memory), host(index.data)


def main():
    port, pid, n_proc, n_local, out = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "phase"
    _force_cpu(int(n_local))
    import jax

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=int(n_proc), process_id=int(pid)
    )
    if mode == "trainer":
        run_trainer(out)
        return
    if mode == "seeds":
        run_seeds(out)
        return
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    ms, mem_tbl, idx_tbl = run_phase_on_mesh(mesh, ckpt_path=out + ".ckpt")
    np.savez(out, mem=mem_tbl, index=idx_tbl, **ms)
    print(f"worker {pid}: ok over {len(jax.devices())} global devices",
          flush=True)





def run_trainer(out):
    """FLAGSHIP-path worker: a full Trainer over the global mesh — wave
    pipeline (owner-aligned auto-ON under multi-process), superchunk
    dispatch, train epoch + the full validate protocol. Deterministic
    construction, so every process builds identical host inputs; Trainer's
    own _to_dev puts them up as global replicated arrays."""
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from jax.experimental import multihost_utils

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer, resolve_owner_aligned

    data, edge_feats = synthetic_stream(
        n_events=900, n_users=30, n_items=30, edge_dim=4, seed=0
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="mp_trainer", bs=25, node_dim=8, time_dim=8, memory_dim=8,
        topk=3, alpha_list=(0.1, 0.2), beta_list=(0.9, 0.8),
        tppr_strategy="streaming", index_chunk=100, seed=5,
        prng_impl="threefry2x32",
        checkpoint_dir="/tmp/zebra_mp_trainer_ckpt",
    )
    trainer = Trainer(cfg, splits, edge_feats)
    # the auto policy must have engaged under multi-process
    aligned = resolve_owner_aligned(cfg)
    assert aligned == (jax.process_count() > 1), aligned

    r1 = trainer.train_epoch()
    r2 = trainer.train_epoch()
    trans, induct = trainer.validate()

    def host(x):
        if x.is_fully_addressable:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    np.savez(
        out,
        # bf16 does not survive an npz round trip (loads as a void dtype)
        mem=host(trainer.mem.memory).astype(np.float32),
        index=host(trainer.index_state.data),
        scalars=np.asarray([r1.loss, r2.loss, r2.ap, trans.ap, induct.ap],
                           np.float64),
    )


def run_seeds(out):
    """Seed-SHARDED worker: a seed-parallel Trainer (whole seeds per device
    via shard_map, train/phase.py:_run_phase_seeds_sharded) over the GLOBAL
    mesh — with 2 processes the seed axis spans Gloo. Deterministic
    construction as in run_trainer; writes per-seed metrics plus the
    allgathered stacked memory and the (replicated) index table."""
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from jax.experimental import multihost_utils

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer

    data, edge_feats = synthetic_stream(
        n_events=900, n_users=30, n_items=30, edge_dim=4, seed=0
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="mp_seeds", bs=25, node_dim=8, time_dim=8, memory_dim=8,
        topk=3, alpha_list=(0.1, 0.2), beta_list=(0.9, 0.8),
        tppr_strategy="streaming", index_chunk=100, seed=5,
        prng_impl="threefry2x32", memory_dtype="float32",
        parallel_runs=4, n_devices=0,
        checkpoint_dir="/tmp/zebra_mp_seeds_ckpt",
    )
    trainer = Trainer(cfg, splits, edge_feats)
    r1 = trainer.train_epoch()
    trans, induct = trainer.validate()

    def host(x):
        if x.is_fully_addressable:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    np.savez(
        out,
        mem=host(trainer.mem.memory).astype(np.float32),
        index=host(trainer.index_state.data),
        ap=np.asarray(r1.ap, np.float64),
        loss=np.asarray(r1.loss, np.float64),
        val_ap=np.asarray(trans.ap, np.float64),
        nn_val_ap=np.asarray(induct.ap, np.float64),
    )


if __name__ == "__main__":
    main()
