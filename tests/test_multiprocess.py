"""Multi-process (multi-"host") equivalence: 2 processes × 4 virtual CPU
devices running the fused train phase over one global 8-device mesh must
produce the same results as a single process with 8 devices — the
"N-host == 1-host" criterion of SURVEY.md §7 stage 6, exercised with real
cross-process (Gloo) collectives and no pod."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "4", outs[pid]],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    w0 = np.load(outs[0])
    w1 = np.load(outs[1])

    # both processes observe identical global results
    for key in w0.files:
        np.testing.assert_array_equal(w0[key], w1[key], err_msg=key)

    # the checkpoint layer gathered the row-sharded tables collectively and
    # process 0 (only) wrote the full global state
    from zebra_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(outs[0] + ".ckpt")
    np.testing.assert_array_equal(ckpt["mem"].memory, w0["mem"])
    np.testing.assert_array_equal(ckpt["index"].data, w0["index"])
    assert not os.path.exists(outs[1] + ".ckpt")

    # single-process baseline over the same total device count (conftest
    # forces 8 virtual CPU devices here)
    import jax
    from jax.sharding import Mesh

    from tests.mp_worker import run_phase_on_mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    ms, mem_tbl, idx_tbl = run_phase_on_mesh(mesh)

    # the index scan is elementwise + small sorts: bit-exact across runtimes;
    # tower outputs may differ only by cross-process reduction ordering
    np.testing.assert_array_equal(w0["index"], idx_tbl)
    np.testing.assert_allclose(w0["mem"], mem_tbl, rtol=1e-5, atol=1e-6)
    for key in ("loss", "ap", "auc", "acc"):
        np.testing.assert_allclose(w0[key], ms[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)
    assert np.isfinite(w0["loss"]).all()


def test_initialize_distributed_env_fallbacks(monkeypatch):
    """The documented ZEBRA_* env fallbacks engage when the CLI leaves the
    single-process defaults, and a multi-process request without a
    coordinator fails loudly."""
    import pytest

    from zebra_tpu.parallel.distributed import initialize_distributed

    # single-process defaults, no env: no-op
    monkeypatch.delenv("ZEBRA_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("ZEBRA_COORDINATOR", raising=False)
    monkeypatch.delenv("ZEBRA_PROCESS_ID", raising=False)
    assert initialize_distributed(None, 1, 0) is False

    # env requests 2 processes but no coordinator anywhere: loud error
    monkeypatch.setenv("ZEBRA_NUM_PROCESSES", "2")
    with pytest.raises(ValueError, match="coordinator"):
        initialize_distributed(None, 1, 0)


def test_two_process_trainer_matches_single_process(tmp_path):
    """The FLAGSHIP path multi-process: full Trainer (wave pipeline,
    owner-aligned auto-on, superchunks, validate protocol) over 2 processes
    × 4 devices must match both processes against each other and a
    single-process 8-device Trainer run."""
    port = _free_port()
    outs = [str(tmp_path / f"t{i}.npz") for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "4",
             outs[pid], "trainer"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    w0, w1 = np.load(outs[0]), np.load(outs[1])
    for key in w0.files:
        np.testing.assert_array_equal(w0[key], w1[key], err_msg=key)
    assert np.isfinite(w0["scalars"]).all()

    # single-process baseline: same Trainer over the conftest 8-device mesh,
    # in a subprocess so the run is constructed identically (fresh process,
    # same prng impl pinning) — mode "trainer" with n_proc=1
    port2 = _free_port()
    out1 = str(tmp_path / "single.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, WORKER, str(port2), "0", "1", "8", out1, "trainer"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout
    s = np.load(out1)
    # index math is elementwise + small sorts — bit-exact; tower/memory and
    # metric scalars may differ by cross-process reduction ordering
    np.testing.assert_array_equal(w0["index"], s["index"])
    np.testing.assert_allclose(w0["mem"], s["mem"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w0["scalars"], s["scalars"], rtol=1e-4,
                               atol=1e-6)
    # training moves (2 epochs on a 900-event stream: AP off the 0.5 floor,
    # inductive val well above chance)
    assert w0["scalars"][2] > 0.52 and w0["scalars"][4] > 0.6, w0["scalars"]


def test_two_process_seed_sharded_matches_single_process(tmp_path):
    """Seed-SHARDED multi-process: a 4-seed Trainer over 2 processes × 2
    devices (seeds 2/process, the seed axis spanning Gloo) must agree
    across processes and with a single-process 4-device run of the same
    deterministic construction."""
    port = _free_port()
    outs = [str(tmp_path / f"s{i}.npz") for i in range(2)]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", "2",
             outs[pid], "seeds"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log

    w0, w1 = np.load(outs[0]), np.load(outs[1])
    for key in w0.files:
        np.testing.assert_array_equal(w0[key], w1[key], err_msg=key)
    assert w0["ap"].shape == (4,) and np.isfinite(w0["ap"]).all()

    port2 = _free_port()
    out1 = str(tmp_path / "single.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, WORKER, str(port2), "0", "1", "4", out1, "seeds"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout
    s = np.load(out1)
    # the per-lane math is identical and no cross-seed reduction exists;
    # index is shared/replicated either way — bit-exact expected on index,
    # float-tolerance on the trained tables/metrics (placement-dependent
    # fusion)
    np.testing.assert_array_equal(w0["index"], s["index"])
    np.testing.assert_allclose(w0["mem"], s["mem"], rtol=1e-5, atol=1e-6)
    for k in ("ap", "loss", "val_ap", "nn_val_ap"):
        np.testing.assert_allclose(w0[k], s[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)
