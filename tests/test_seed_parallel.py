"""Seed-parallel phase: S independent runs vmapped over one shared stream +
index scan must reproduce, per seed, exactly what S separate single-seed
phase programs produce."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_loop import _make_trainer
from zebra_tpu.index.streaming import init_tppr_state
from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk
from zebra_tpu.models.memory import init_memory
from zebra_tpu.models.tgn import init_tgn_params
from zebra_tpu.train.phase import Stream, run_phase, run_phase_seeds
from zebra_tpu.train.step import make_optimizer


def _stacked_inits(cfg, n_seeds):
    """Per-seed (params, opt, mem, rng) exactly as Trainer builds them for
    cfg.seed = base + s (loop.py:280-289)."""
    params, opts, mems, rngs = [], [], [], []
    opt = make_optimizer(cfg)
    for s in range(n_seeds):
        rng, init_rng = jax.random.split(jax.random.PRNGKey(cfg.seed + s))
        p = init_tgn_params(init_rng, cfg)
        params.append(p)
        opts.append(opt.init(p))
        mems.append(init_memory(cfg.n_nodes, cfg.memory_dim,
                                cfg.msg_table_dim,
                                jnp.dtype(cfg.message_dtype),
                                jnp.dtype(cfg.memory_dtype)))
        rngs.append(rng)
    stack = lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
    return (params, opts, mems, rngs,
            stack(params), stack(opts), stack(mems), stack(rngs))


def _copy(t):
    return jax.tree.map(jnp.copy, t)


@pytest.mark.parametrize("strategy", ["streaming", "pruning"])
def test_run_phase_seeds_matches_per_seed_run_phase(strategy):
    """Exact per-seed equivalence under threefry2x32: its bit generation is
    vmap-invariant, so the vmapped lanes' dropout masks equal the sequential
    runs' (the default rbg impl draws different — equally valid — masks under
    vmap; see test_run_phase_seeds_rbg_statistical)."""
    n_seeds = 2
    trainer = _make_trainer(strategy, n_events=600,
                            prng_impl="threefry2x32")
    cfg = trainer.cfg
    ps = trainer._streams["train"]
    host = trainer._host_streams["train"]
    stream, n_batches = ps.stream, ps.n_batches
    e = stream.src.shape[0]

    rng = np.random.RandomState(3)
    negs = rng.randint(1, trainer.splits.n_nodes, (n_seeds, e)).astype(np.int32)
    negs[:, ~host["valid"]] = 0

    (params, opts, mems, rngs,
     s_params, s_opt, s_mem, s_rng) = _stacked_inits(cfg, n_seeds)

    if strategy == "streaming":
        flat, n_waves = wave_flat_index(
            host["src"][host["valid"]], host["dst"][host["valid"]],
            negs[:, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
        )
        flat_full = np.full(e, n_waves * cfg.wave_cap, np.int32)
        flat_full[host["valid"]] = flat
        _, rows_m = wave_scan_chunk(
            init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
            trainer._tppr_params,
            stream.src, stream.dst, jnp.asarray(negs.T),
            stream.t, stream.eidx, stream.valid,
            jnp.asarray(flat_full), n_waves, cfg.wave_cap,
        )
    else:
        rows_m = None

    mp, mo, mm, m_metrics = run_phase_seeds(
        cfg, True, n_batches, _copy(s_params), _copy(s_opt), _copy(s_mem),
        s_rng, trainer.edge_feats, trainer.train_nbr_index,
        stream._replace(neg=jnp.asarray(negs.T)), rows_m,
    )

    for s in range(n_seeds):
        if strategy == "streaming":
            flat_s, n_waves_s = wave_flat_index(
                host["src"][host["valid"]], host["dst"][host["valid"]],
                negs[s, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
            )
            ff = np.full(e, n_waves_s * cfg.wave_cap, np.int32)
            ff[host["valid"]] = flat_s
            _, rows_s = wave_scan_chunk(
                init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
                trainer._tppr_params,
                stream.src, stream.dst, jnp.asarray(negs[s]),
                stream.t, stream.eidx, stream.valid,
                jnp.asarray(ff), n_waves_s, cfg.wave_cap,
            )
            # the multi-neg schedule differs from the single-neg one, but the
            # extraction rows must not (both are exact pre-edge state)
            np.testing.assert_array_equal(
                np.asarray(rows_m[:, [0, 1, 2 + s]]), np.asarray(rows_s),
                err_msg=f"extraction rows differ (seed {s})",
            )
        else:
            rows_s = None
        sp, so, sm_, _, s_metrics = run_phase(
            cfg, True, n_batches, _copy(params[s]), _copy(opts[s]),
            _copy(mems[s]), (), rngs[s], trainer.edge_feats,
            trainer.train_nbr_index, stream._replace(neg=jnp.asarray(negs[s])),
            rows_s,
        )
        # losses match to float ulp every batch (asserted below): the
        # semantics are exact; params accumulate vmapped-vs-unbatched
        # reduction-order noise through Adam's rsqrt, and bf16 memory
        # storage quantizes that noise to whole bf16 ulps (~4e-3 here)
        for name, a, b_, atol in (
            ("params", mp, sp, 1e-3), ("mem", mm, sm_, 1e-2),
        ):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b_)):
                np.testing.assert_allclose(
                    np.asarray(la[s], np.float32), np.asarray(lb, np.float32),
                    rtol=0, atol=atol, err_msg=f"{name} seed {s}",
                )
        np.testing.assert_allclose(
            np.asarray(m_metrics.loss[:, s]), np.asarray(s_metrics.loss),
            rtol=1e-5, atol=1e-6,
        )
        # ulp-level logit noise can flip one rank in the sort-based AP;
        # one pair swap moves AP by O(1/b^2) at b=50
        np.testing.assert_allclose(
            np.asarray(m_metrics.ap[:, s]), np.asarray(s_metrics.ap),
            rtol=0, atol=2e-3,
        )


def test_run_phase_seeds_rbg_statistical():
    """Under the default rbg PRNG the vmapped dropout bits differ from the
    sequential runs' (rbg bit generation is not vmap-invariant), so the
    seed-parallel phase matches sequential runs in distribution: losses track
    within dropout noise and the deterministic eval-side state is exact."""
    n_seeds = 2
    trainer = _make_trainer("streaming", n_events=600)
    cfg = trainer.cfg
    assert cfg.prng_impl == "rbg"
    ps = trainer._streams["train"]
    host = trainer._host_streams["train"]
    stream, n_batches = ps.stream, ps.n_batches
    e = stream.src.shape[0]
    rng = np.random.RandomState(3)
    negs = rng.randint(1, trainer.splits.n_nodes, (n_seeds, e)).astype(np.int32)
    negs[:, ~host["valid"]] = 0
    (params, opts, mems, rngs,
     s_params, s_opt, s_mem, s_rng) = _stacked_inits(cfg, n_seeds)
    flat, n_waves = wave_flat_index(
        host["src"][host["valid"]], host["dst"][host["valid"]],
        negs[:, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
    )
    ff = np.full(e, n_waves * cfg.wave_cap, np.int32)
    ff[host["valid"]] = flat
    _, rows_m = wave_scan_chunk(
        init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
        trainer._tppr_params, stream.src, stream.dst, jnp.asarray(negs.T),
        stream.t, stream.eidx, stream.valid,
        jnp.asarray(ff), n_waves, cfg.wave_cap,
    )
    mp, mo, mm, m_metrics = run_phase_seeds(
        cfg, True, n_batches, _copy(s_params), _copy(s_opt), _copy(s_mem),
        s_rng, trainer.edge_feats, (),
        stream._replace(neg=jnp.asarray(negs.T)), rows_m,
    )
    for s in range(n_seeds):
        flat_s, n_waves_s = wave_flat_index(
            host["src"][host["valid"]], host["dst"][host["valid"]],
            negs[s, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
        )
        ffs = np.full(e, n_waves_s * cfg.wave_cap, np.int32)
        ffs[host["valid"]] = flat_s
        _, rows_s = wave_scan_chunk(
            init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
            trainer._tppr_params, stream.src, stream.dst, jnp.asarray(negs[s]),
            stream.t, stream.eidx, stream.valid,
            jnp.asarray(ffs), n_waves_s, cfg.wave_cap,
        )
        _, _, _, _, s_metrics = run_phase(
            cfg, True, n_batches, _copy(params[s]), _copy(opts[s]),
            _copy(mems[s]), (), rngs[s], trainer.edge_feats, (),
            stream._replace(neg=jnp.asarray(negs[s])), rows_s,
        )
        rb = ps.real_batches
        dl = np.abs(np.asarray(m_metrics.loss[:rb, s])
                    - np.asarray(s_metrics.loss[:rb]))
        assert dl.max() < 0.1, dl  # dropout-stream noise only
        dap = abs(float(m_metrics.ap[:rb, s].mean())
                  - float(s_metrics.ap[:rb].mean()))
        assert dap < 0.05, dap


def test_run_phase_seeds_eval_shared_negatives():
    """Eval: the seeded samplers draw identical negatives for every run, so
    the seed axis carries only (params, mem); queries and negatives are
    shared. Per-seed results must match single-seed eval phases."""
    n_seeds = 2
    trainer = _make_trainer("streaming", n_events=600)
    cfg = trainer.cfg
    ps = trainer._streams["val"]
    host = trainer._host_streams["val"]
    stream, n_batches = ps.stream, ps.n_batches
    e = stream.src.shape[0]

    (params, opts, mems, rngs,
     s_params, s_opt, s_mem, s_rng) = _stacked_inits(cfg, n_seeds)

    flat, n_waves = wave_flat_index(
        host["src"][host["valid"]], host["dst"][host["valid"]],
        host["neg"][host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
    )
    ff = np.full(e, n_waves * cfg.wave_cap, np.int32)
    ff[host["valid"]] = flat
    state0 = init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk)
    _, rows = wave_scan_chunk(
        jax.tree.map(jnp.copy, state0), trainer._tppr_params,
        stream.src, stream.dst, stream.neg,
        stream.t, stream.eidx, stream.valid,
        jnp.asarray(ff), n_waves, cfg.wave_cap,
    )

    mp, mo, mm, m_metrics = run_phase_seeds(
        cfg, False, n_batches, _copy(s_params), _copy(s_opt), _copy(s_mem),
        s_rng, trainer.edge_feats, (), stream, rows,
    )
    for s in range(n_seeds):
        sp, so, sm_, _, s_metrics = run_phase(
            cfg, False, n_batches, _copy(params[s]), _copy(opts[s]),
            _copy(mems[s]), (), rngs[s], trainer.edge_feats, (), stream, rows,
        )
        np.testing.assert_allclose(
            np.asarray(m_metrics.ap[:, s]), np.asarray(s_metrics.ap),
            rtol=1e-5, atol=1e-6,
        )
        for la, lb in zip(jax.tree.leaves(mm), jax.tree.leaves(sm_)):
            np.testing.assert_allclose(
                np.asarray(la[s], np.float32), np.asarray(lb, np.float32),
                rtol=2e-5, atol=1e-5,
            )


def _seed_trainer(tmpdir, **kw):
    from tests.test_train_loop import _make_trainer

    return _make_trainer(
        "streaming", n_events=600, checkpoint_dir=str(tmpdir), **kw
    )


def test_trainer_seed_parallel_fit_matches_sequential(tmp_path):
    """Trainer(parallel_runs=S).fit() reproduces, per seed, what S sequential
    single-seed Trainers (cfg.seed = seed + s — the CLI's --n_runs schedule,
    train.py:88-93) produce: same negative draws, same early-stop decisions,
    per-seed test metrics within vmap reduction-order noise (threefry dropout
    bits are vmap-invariant; f32 memory avoids bf16 quantization of the
    noise)."""
    kw = dict(
        n_epoch=2, patience=5, prng_impl="threefry2x32",
        memory_dtype="float32",
    )
    par = _seed_trainer(tmp_path / "par", parallel_runs=2, **kw)
    out = par.fit()

    seq = []
    for s in range(2):
        tr = _seed_trainer(tmp_path / f"seq{s}", seed=par.cfg.seed + s, **kw)
        seq.append(tr.fit())

    for s in range(2):
        for key in ("test_ap", "test_auc", "nn_test_ap", "nn_test_auc"):
            np.testing.assert_allclose(
                out["per_seed"][key][s], seq[s][key], rtol=0, atol=5e-3,
                err_msg=f"{key} seed {s}",
            )
        assert out["per_seed"]["stop_epoch"][s] == seq[s]["stop_epoch"]
    assert out["test_ap"] == pytest.approx(
        np.mean([r["test_ap"] for r in seq]), abs=5e-3
    )
    assert out["test_ap_std"] >= 0.0


def test_trainer_seed_parallel_resume_is_exact(tmp_path):
    """A seed-parallel fit interrupted at an epoch-boundary state checkpoint
    and resumed in a fresh Trainer finishes with bit-identical per-seed test
    metrics (same programs, same restored RNG/optimizer/stopper state)."""
    kw = dict(n_epoch=3, patience=5, state_every=2)

    full = _seed_trainer(tmp_path / "a", parallel_runs=2, **kw)
    ref = full.fit()

    # same config/dir: run once to produce the epoch-2 state file, then
    # resume it in a brand-new Trainer and run the remaining epoch
    half = _seed_trainer(tmp_path / "b", parallel_runs=2, **kw)
    half.fit(n_epoch=2)  # writes <run_name>.state.ckpt at epoch 2
    state_path = os.path.join(
        half.cfg.checkpoint_dir, half.cfg.run_name() + ".state.ckpt"
    )
    assert os.path.exists(state_path)

    resumed = _seed_trainer(tmp_path / "b", parallel_runs=2, **kw)
    out = resumed.fit(resume_from=state_path)

    for key in ("test_ap", "test_auc", "nn_test_ap", "nn_test_auc"):
        np.testing.assert_allclose(
            out["per_seed"][key], ref["per_seed"][key], rtol=0, atol=1e-6,
            err_msg=key,
        )


def test_trainer_parallel_lr_sweep_matches_sequential(tmp_path):
    """--parallel_lr turns the seed axis into a one-pass lr sweep: lane s
    must reproduce a single-seed Trainer running cfg.seed + s at lr_s
    (inject_hyperparams adam is numerically identical to optax.adam at a
    fixed lr; threefry dropout bits are vmap-invariant)."""
    lrs = (3e-3, 8e-4)
    kw = dict(
        n_epoch=2, patience=5, prng_impl="threefry2x32",
        memory_dtype="float32",
    )
    par = _seed_trainer(
        tmp_path / "par", parallel_runs=2, parallel_lr=lrs, **kw
    )
    out = par.fit()
    assert out["per_seed"]["lr"] == [pytest.approx(v) for v in lrs]

    for s, lr in enumerate(lrs):
        tr = _seed_trainer(
            tmp_path / f"seq{s}", seed=par.cfg.seed + s, lr=lr, **kw
        )
        ref = tr.fit()
        for key in ("test_ap", "test_auc", "nn_test_ap"):
            np.testing.assert_allclose(
                out["per_seed"][key][s], ref[key], rtol=0, atol=5e-3,
                err_msg=f"{key} lr {lr}",
            )


def test_parallel_lr_validation():
    with pytest.raises(ValueError, match="parallel_lr"):
        _seed_trainer("/tmp/zebra_plr_bad", parallel_runs=2,
                      parallel_lr=(1e-3,))
    with pytest.raises(ValueError, match="parallel_lr"):
        _seed_trainer("/tmp/zebra_plr_bad", parallel_lr=(1e-3,))


@pytest.mark.parametrize("variant", [
    {"aggregator": "mean"},
    {"use_source_embedding_in_message": True,
     "use_destination_embedding_in_message": True,
     "message_function": "mlp"},
])
def test_run_phase_seeds_flat_nondefault_protocols(variant):
    """The flat-table protocol helpers' non-default branches — mean
    aggregation (accumulate/divide), embedding-sourced message parts, and
    the MLP message function — must match per-seed run_phase exactly, like
    the default path (threefry: vmap-invariant dropout bits)."""
    n_seeds = 2
    trainer = _make_trainer("streaming", n_events=600,
                            prng_impl="threefry2x32", **variant)
    cfg = trainer.cfg
    ps = trainer._streams["train"]
    host = trainer._host_streams["train"]
    stream, n_batches = ps.stream, ps.n_batches
    e = stream.src.shape[0]
    rng = np.random.RandomState(5)
    negs = rng.randint(1, trainer.splits.n_nodes, (n_seeds, e)).astype(np.int32)
    negs[:, ~host["valid"]] = 0
    (params, opts, mems, rngs,
     s_params, s_opt, s_mem, s_rng) = _stacked_inits(cfg, n_seeds)

    flat, n_waves = wave_flat_index(
        host["src"][host["valid"]], host["dst"][host["valid"]],
        negs[:, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
    )
    ff = np.full(e, n_waves * cfg.wave_cap, np.int32)
    ff[host["valid"]] = flat
    _, rows_m = wave_scan_chunk(
        init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
        trainer._tppr_params, stream.src, stream.dst, jnp.asarray(negs.T),
        stream.t, stream.eidx, stream.valid,
        jnp.asarray(ff), n_waves, cfg.wave_cap,
    )
    mp, mo, mm, m_metrics = run_phase_seeds(
        cfg, True, n_batches, _copy(s_params), _copy(s_opt), _copy(s_mem),
        s_rng, trainer.edge_feats, (),
        stream._replace(neg=jnp.asarray(negs.T)), rows_m,
    )
    for s in range(n_seeds):
        flat_s, n_waves_s = wave_flat_index(
            host["src"][host["valid"]], host["dst"][host["valid"]],
            negs[s, host["valid"]], cfg.n_nodes, cap=cfg.wave_cap,
        )
        ffs = np.full(e, n_waves_s * cfg.wave_cap, np.int32)
        ffs[host["valid"]] = flat_s
        _, rows_s = wave_scan_chunk(
            init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk),
            trainer._tppr_params, stream.src, stream.dst,
            jnp.asarray(negs[s]), stream.t, stream.eidx, stream.valid,
            jnp.asarray(ffs), n_waves_s, cfg.wave_cap,
        )
        _, _, sm_, _, s_metrics = run_phase(
            cfg, True, n_batches, _copy(params[s]), _copy(opts[s]),
            _copy(mems[s]), (), rngs[s], trainer.edge_feats, (),
            stream._replace(neg=jnp.asarray(negs[s])), rows_s,
        )
        np.testing.assert_allclose(
            np.asarray(m_metrics.loss[:, s]), np.asarray(s_metrics.loss),
            rtol=1e-5, atol=1e-6, err_msg=f"loss seed {s} {variant}",
        )
        for la, lb in zip(jax.tree.leaves(mm), jax.tree.leaves(sm_)):
            np.testing.assert_allclose(
                np.asarray(la[s], np.float32), np.asarray(lb, np.float32),
                rtol=0, atol=1e-2, err_msg=f"mem seed {s} {variant}",
            )


@pytest.mark.parametrize(
    "module", ["graph_attention", "graph_sum", "time", "identity"]
)
def test_trainer_seed_parallel_towers(tmp_path, module):
    """Seed-parallel flat tables for the recursive/time/identity towers:
    their forwards resolve ADJACENCY by raw node id while the memory gathers
    ride per-lane offsets into the flat [S·N, ·] tables
    (models/embedding.py:_offset) — each lane must match the single-seed
    Trainer exactly (threefry: vmap-invariant dropout bits)."""
    kw = dict(
        n_epoch=1, patience=5, prng_impl="threefry2x32",
        memory_dtype="float32", embedding_module=module,
    )
    par = _seed_trainer(tmp_path / "par", parallel_runs=2, **kw)
    tr = par.train_epoch()
    trans, induct = par.validate()

    for s in range(2):
        single = _seed_trainer(tmp_path / f"s{s}", seed=par.cfg.seed + s, **kw)
        tr_s = single.train_epoch()
        trans_s, induct_s = single.validate()
        np.testing.assert_allclose(float(tr.ap[s]), tr_s.ap, rtol=0,
                                   atol=5e-3,
                                   err_msg=f"train ap seed {s} {module}")
        np.testing.assert_allclose(float(trans.ap[s]), trans_s.ap, rtol=0,
                                   atol=5e-3,
                                   err_msg=f"val ap seed {s} {module}")
        np.testing.assert_allclose(float(induct.ap[s]), induct_s.ap, rtol=0,
                                   atol=5e-3,
                                   err_msg=f"nn val ap seed {s} {module}")
        for la, lb in zip(jax.tree.leaves(par.params),
                          jax.tree.leaves(single.params)):
            np.testing.assert_allclose(
                np.asarray(la[s], np.float32), np.asarray(lb, np.float32),
                rtol=0, atol=1e-3, err_msg=f"params seed {s} {module}",
            )


def test_trainer_seed_parallel_pruning_strategy(tmp_path):
    """The Trainer's non-wave seed-parallel branch (pruning strategy:
    per-seed BFS queries inside the vmapped step, no index carry) matches
    per-seed single Trainers through a train epoch + validation."""
    kw = dict(
        n_epoch=1, patience=5, prng_impl="threefry2x32",
        memory_dtype="float32", tppr_strategy="pruning",
    )
    par = _seed_trainer(tmp_path / "par", parallel_runs=2, **kw)
    tr = par.train_epoch()
    trans, induct = par.validate()

    for s in range(2):
        single = _seed_trainer(tmp_path / f"s{s}", seed=par.cfg.seed + s, **kw)
        tr_s = single.train_epoch()
        trans_s, induct_s = single.validate()
        np.testing.assert_allclose(float(tr.ap[s]), tr_s.ap, rtol=0,
                                   atol=5e-3, err_msg=f"train ap seed {s}")
        np.testing.assert_allclose(float(trans.ap[s]), trans_s.ap, rtol=0,
                                   atol=5e-3, err_msg=f"val ap seed {s}")
        np.testing.assert_allclose(float(induct.ap[s]), induct_s.ap, rtol=0,
                                   atol=5e-3, err_msg=f"nn val ap seed {s}")
