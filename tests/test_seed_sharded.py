"""Seed-SHARDED execution (the seed axis over a device mesh), the
host-backup protocol, and the HBM budget guard — split from
test_seed_parallel.py so the per-module executable-cache clearing
(conftest) bounds each module's compiled-program count below the jaxlib
accumulation-segfault threshold (NOTES.md round 4 item 3)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_seed_parallel import _copy, _seed_trainer, _stacked_inits
from tests.test_train_loop import _make_trainer
from zebra_tpu.index.streaming import init_tppr_state
from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk
from zebra_tpu.train.phase import Stream, run_phase, run_phase_seeds


def test_trainer_seed_sharded_resume_is_exact(tmp_path):
    """Epoch-boundary state resume under the seed-SHARDED mesh: the restore
    path re-shards the stacked state on the seed axis and the resumed fit
    finishes bit-identical to the uninterrupted sharded fit. Also covers
    --parallel_lr × mesh (the injected-lr optimizer state rides the shard)."""
    kw = dict(n_epoch=3, patience=5, state_every=2, n_devices=2,
              parallel_lr=(3e-3, 8e-4))

    full = _seed_trainer(tmp_path / "a", parallel_runs=2, **kw)
    ref = full.fit()

    half = _seed_trainer(tmp_path / "b", parallel_runs=2, **kw)
    half.fit(n_epoch=2)
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


def test_run_phase_seeds_sharded_matches_unsharded():
    """run_phase_seeds(mesh=...) — the seed-SHARDED phase (whole seeds per
    device via shard_map over the flat tables) — must reproduce the
    single-device seed-parallel phase exactly: the per-lane math is
    identical, only placed on different devices (no cross-seed reductions
    exist to re-associate)."""
    from zebra_tpu.parallel import make_mesh

    n_seeds = 4
    trainer = _make_trainer("streaming", n_events=600,
                            prng_impl="threefry2x32")
    cfg = trainer.cfg
    ps = trainer._streams["train"]
    host = trainer._host_streams["train"]
    stream, n_batches = ps.stream, ps.n_batches
    e = stream.src.shape[0]
    rng = np.random.RandomState(7)
    negs = rng.randint(1, trainer.splits.n_nodes, (n_seeds, e)).astype(np.int32)
    negs[:, ~host["valid"]] = 0
    (_, _, _, _, s_params, s_opt, s_mem, s_rng) = _stacked_inits(cfg, n_seeds)

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
    args = (cfg, True, n_batches)
    tail = (trainer.edge_feats, (),
            stream._replace(neg=jnp.asarray(negs.T)), rows_m)
    up, uo, um, u_metrics = run_phase_seeds(
        *args, _copy(s_params), _copy(s_opt), _copy(s_mem), s_rng, *tail,
    )
    mesh = make_mesh(2)
    sp, so, sm, s_metrics = run_phase_seeds(
        *args, _copy(s_params), _copy(s_opt), _copy(s_mem), s_rng, *tail,
        mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(s_metrics.loss), np.asarray(u_metrics.loss),
        rtol=1e-6, atol=1e-7,
    )
    for la, lb in zip(jax.tree.leaves(sp), jax.tree.leaves(up)):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=1e-6, atol=1e-6, err_msg="params",
        )
    for la, lb in zip(jax.tree.leaves(sm), jax.tree.leaves(um)):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=1e-6, atol=1e-5, err_msg="mem",
        )


def test_trainer_seed_sharded_fit_matches_sequential(tmp_path):
    """The VERDICT-7 stage-6 criterion: Trainer(parallel_runs=4,
    n_devices=2).fit() — 4 seeds sharded 2 per device — reproduces, per
    seed, what 4 sequential single-seed Trainers produce (threefry dropout,
    f32 memory; same tolerance story as the single-device variant)."""
    kw = dict(
        n_epoch=2, patience=5, prng_impl="threefry2x32",
        memory_dtype="float32", save_best=True,
    )
    par = _seed_trainer(tmp_path / "par", parallel_runs=4, n_devices=2, **kw)
    assert par._mesh is not None and par._mesh.devices.size == 2
    out = par.fit()
    for s in range(4):
        single = _seed_trainer(tmp_path / f"s{s}", seed=par.cfg.seed + s,
                               **kw)
        out_s = single.fit()
        for k in ("test_ap", "nn_test_ap"):
            np.testing.assert_allclose(
                out["per_seed"][k][s], out_s[k], rtol=0, atol=5e-3,
                err_msg=f"{k} seed {s}",
            )
        assert out["per_seed"]["stop_epoch"][s] == out_s["stop_epoch"]


@pytest.mark.parametrize("kw", [
    {"tppr_strategy": "pruning"},        # per-lane BFS queries, q_rows=None
    {"embedding_module": "time"},        # q=None entirely (mem_off path)
])
def test_trainer_seed_sharded_nonwave_branch(tmp_path, kw):
    """The non-wave seed-parallel branch (queries=None: pruning BFS per lane
    / towers with in-forward memory offsets) under the seed-sharded mesh
    matches the single-device seed-parallel trainer."""
    base = dict(n_epoch=1, patience=5, prng_impl="threefry2x32",
                memory_dtype="float32", parallel_runs=2, **kw)
    mesh_tr = _seed_trainer(tmp_path / "mesh", n_devices=2, **base)
    single = _seed_trainer(tmp_path / "one", **base)
    r_m = mesh_tr.train_epoch()
    r_s = single.train_epoch()
    np.testing.assert_allclose(np.asarray(r_m.ap), np.asarray(r_s.ap),
                               rtol=0, atol=5e-3, err_msg=str(kw))
    tm, im = mesh_tr.validate()
    ts, is_ = single.validate()
    np.testing.assert_allclose(np.asarray(tm.ap), np.asarray(ts.ap),
                               rtol=0, atol=5e-3, err_msg=str(kw))
    np.testing.assert_allclose(np.asarray(im.ap), np.asarray(is_.ap),
                               rtol=0, atol=5e-3, err_msg=str(kw))


@pytest.mark.parametrize("kw", [
    {},                                     # single-seed
    {"parallel_runs": 2},                   # seed-parallel
    {"parallel_runs": 2, "n_devices": 2},   # seed-sharded mesh
])
def test_host_backup_matches_device_protocol(tmp_path, kw):
    """--host_backup (val/test backups in host RAM + donating flush) is
    bit-identical to the all-device protocol: the backup round trip is a
    D2H/H2D identity and the flush math is unchanged."""
    base = dict(n_epoch=2, patience=5, prng_impl="threefry2x32",
                memory_dtype="float32", save_best=True, **kw)
    dev = _seed_trainer(tmp_path / "dev", host_backup=False, **base)
    host = _seed_trainer(tmp_path / "host", host_backup=True, **base)
    assert host._host_backup and not dev._host_backup
    r_dev = dev.fit()
    r_host = host.fit()
    keys = ("test_ap", "test_auc", "nn_test_ap", "nn_test_auc")
    for k in keys:
        np.testing.assert_array_equal(
            np.asarray(r_host.get("per_seed", {}).get(k, r_host[k])),
            np.asarray(r_dev.get("per_seed", {}).get(k, r_dev[k])),
            err_msg=f"{k} {kw}",
        )


def test_hbm_budget_guard(monkeypatch):
    """The construction-time HBM guard (loop._check_hbm_budget): the ×3
    validate-protocol estimate against the 0.8·HBM usable line must
    reproduce the measured v5e boundary (S=6 × 1.14M nodes rejected, S=4
    accepted — RESULTS.md round 5), exercised on CPU by faking the device
    accounting; and the generation fallback table must not confuse v5e
    with v5p."""
    import zebra_tpu.train.loop as L

    class FakeDev:
        platform = "tpu"
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            raise RuntimeError("UNIMPLEMENTED")  # raising backends too

    monkeypatch.setattr(L.jax, "devices", lambda: [FakeDev()])

    class Guard:
        _mesh = None
        _n_seeds = 1
        _multiproc = False
        _check_hbm_budget = L.Trainer._check_hbm_budget

    from zebra_tpu.config import Config

    g = Guard()
    base = dict(node_dim=100, time_dim=100, memory_dim=100, topk=20,
                alpha_list=(0.1, 0.1), beta_list=(0.05, 0.95),
                tppr_strategy="streaming", n_nodes=1140096)
    # S=6: the 3-copy protocol busts the v5e budget (est 13.2 GiB > 0.8·16,
    # the measured OOM) — with --no_host_backup it must raise...
    g._n_seeds = 6
    g.cfg = Config(parallel_runs=6, host_backup=False, **base)
    with pytest.raises(ValueError, match="HBM budget exceeded"):
        g._check_hbm_budget()
    # ...and in auto mode it resolves to host-resident backups instead
    # (2 copies fit), raising the usable ceiling
    g.cfg = Config(parallel_runs=6, **base)
    g._check_hbm_budget()
    assert g._host_backup
    # past even the 2-copy budget the raise is back
    g._n_seeds = 10
    g.cfg = Config(parallel_runs=10, **base)
    with pytest.raises(ValueError, match="HBM budget exceeded"):
        g._check_hbm_budget()
    g._n_seeds = 4
    g.cfg = Config(parallel_runs=4, **base)
    g._check_hbm_budget()  # no raise, no host backup needed
    assert not g._host_backup

    # generation fallbacks: v5p is NOT the 16 GiB of v5e
    assert L._tpu_hbm_bytes("TPU v5 lite") == 16 * 2**30
    assert L._tpu_hbm_bytes("TPU v5p") == 95 * 2**30
    assert L._tpu_hbm_bytes("TPU v4") == 32 * 2**30
    assert L._tpu_hbm_bytes(None) == 16 * 2**30
    # on v5p the same S=6 config fits comfortably
    FakeDev.device_kind = "TPU v5p"
    g._n_seeds = 6
    g.cfg = Config(parallel_runs=6, **base)
    g._check_hbm_budget()  # no raise


def test_trainer_seed_sharded_mesh_validation():
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        _seed_trainer("/tmp/zebra_mesh_bad", parallel_runs=3, n_devices=2)
