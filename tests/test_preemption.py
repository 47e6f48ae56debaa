"""Graceful preemption: request_stop / SIGTERM ends the run at a superchunk
boundary with a resumable full-state checkpoint, and the resumed run matches
an uninterrupted one exactly."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from tests.test_train_loop import _make_trainer


def test_request_stop_mid_epoch_cursor():
    """With the flag set, the train superchunk loop exits after one chunk."""
    trainer = _make_trainer("streaming", n_events=1200, index_chunk=200)
    n_chunks = trainer._streams["train"].n_chunks
    assert n_chunks > 1
    trainer.request_stop()
    trainer.train_epoch()
    assert trainer._chunk_cursor == 1


def test_request_stop_saves_resumable_state(tmp_path):
    """fit() under request_stop writes a state checkpoint that a fresh
    Trainer resumes to bit-identical final results."""
    kw = dict(n_epoch=3, patience=5, checkpoint_dir=str(tmp_path / "a"))
    full = _make_trainer("streaming", n_events=600, **kw)
    ref = full.fit()

    kw2 = dict(n_epoch=3, patience=5, checkpoint_dir=str(tmp_path / "b"))
    half = _make_trainer("streaming", n_events=600, **kw2)
    half.request_stop()  # stop immediately: epoch 0 saved mid-flight
    out = half.fit()
    assert out["interrupted"] is True
    state_path = out["state_path"]
    assert os.path.exists(state_path)

    resumed = _make_trainer("streaming", n_events=600, **kw2)
    out2 = resumed.fit(resume_from=state_path)
    for key in ("test_ap", "test_auc", "nn_test_ap", "nn_test_auc"):
        np.testing.assert_allclose(out2[key], ref[key], rtol=0, atol=1e-6,
                                   err_msg=key)


def test_request_stop_seed_parallel(tmp_path):
    """Seed-parallel fit stops and resumes the same way, per seed."""
    kw = dict(n_epoch=2, patience=5, parallel_runs=2)
    full = _make_trainer("streaming", n_events=600,
                         checkpoint_dir=str(tmp_path / "a"), **kw)
    ref = full.fit()

    half = _make_trainer("streaming", n_events=600,
                         checkpoint_dir=str(tmp_path / "b"), **kw)
    half.request_stop()
    out = half.fit()
    assert out["interrupted"] is True

    resumed = _make_trainer("streaming", n_events=600,
                            checkpoint_dir=str(tmp_path / "b"), **kw)
    out2 = resumed.fit(resume_from=out["state_path"])
    np.testing.assert_allclose(out2["per_seed"]["test_ap"],
                               ref["per_seed"]["test_ap"], rtol=0, atol=1e-6)


def test_cli_sigterm_end_to_end(tmp_path):
    """The real surface: SIGTERM to a running train.py writes the state file
    and logs the resume hint; a --resume_state restart completes."""
    rng = np.random.RandomState(0)
    n = 4000
    d = tmp_path / "toy"
    d.mkdir()
    with open(d / "toy.csv", "w") as f:
        f.write("u,i,ts,label,f0\n")
        for i in range(n):
            f.write(f"{rng.randint(0, 50)},{rng.randint(0, 50)},"
                    f"{float(i)},0,{rng.rand():.4f}\n")
    from zebra_tpu.data import preprocess

    preprocess.run("toy", str(tmp_path), bipartite=True, fmt="jodie")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    args = [
        sys.executable, "train.py", "-d", "toy",
        "--data_dir", str(tmp_path), "--bs", "50", "--n_epoch", "50",
        "--patience", "50", "--node_dim", "16", "--time_dim", "16",
        "--memory_dim", "16", "--topk", "4", "--alpha_list", "0.1",
        "--beta_list", "0.9", "--index_chunk", "400",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "log"),
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(args, cwd=repo, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # wait for training to be underway (first epoch line), then SIGTERM
    deadline = time.time() + 300
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if "epoch: 1" in line or time.time() > deadline:
            break
    proc.send_signal(signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    lines.append(out or "")
    text = "".join(lines)
    assert "stopping at the next superchunk boundary" in text, text[-2000:]
    assert "resume with --resume_state" in text, text[-2000:]
    states = [p for p in (tmp_path / "ckpt").iterdir()
              if p.name.endswith(".state.ckpt")]
    assert states, list((tmp_path / "ckpt").iterdir())

    out2 = subprocess.run(
        args + ["--n_epoch", "2", "--resume_state", str(states[0])],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]
    assert "Test statistics" in out2.stdout + out2.stderr


def test_request_stop_at_epoch_boundary_resumes_exactly(tmp_path):
    """A stop request that lands on a COMPLETED epoch (single-superchunk
    stream: the break coincides with epoch completion, train_epoch resets
    the cursor and advances the epoch id) must save (epoch+1, chunk 0) —
    resuming must NOT retrain the finished epoch. Regression: the old
    'cursor >= n_chunks' check read the already-reset cursor and re-ran the
    epoch with the next epoch's negatives."""
    kw = dict(n_epoch=3, patience=5, index_chunk=65536)  # one superchunk
    full = _make_trainer("streaming", n_events=600,
                         checkpoint_dir=str(tmp_path / "a"), **kw)
    assert full._streams["train"].n_chunks == 1
    ref = full.fit()

    half = _make_trainer("streaming", n_events=600,
                         checkpoint_dir=str(tmp_path / "b"), **kw)
    half.request_stop()
    out = half.fit()
    assert out["interrupted"] is True
    # the saved cursor must be an epoch boundary: epoch 1, chunk 0
    from zebra_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(out["state_path"])
    assert int(ckpt["epoch"]) == 1 and int(ckpt["chunk"]) == 0

    resumed = _make_trainer("streaming", n_events=600,
                            checkpoint_dir=str(tmp_path / "b"), **kw)
    out2 = resumed.fit(resume_from=out["state_path"])
    for key in ("test_ap", "test_auc", "nn_test_ap", "nn_test_auc"):
        np.testing.assert_allclose(out2[key], ref[key], rtol=0, atol=1e-6,
                                   err_msg=key)
