"""Cross-implementation accuracy parity, compact in-suite edition.

Runs the *reference* implementation (/root/reference, torch CPU, numba
replaced by the no-op shim) and zebra_tpu head-to-head on an identical
synthetic dataset via scripts/parity_run.py and asserts the test-AP
agreement. The full-size record (30k events, 6 epochs, A/B of the
bf16/rbg defaults) lives in PARITY.md.

Skips when the reference tree is absent (this repo is standalone; the
harness is for containers that carry the reference for judging)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "train.py")),
    reason="reference implementation not present",
)
def test_reference_parity_compact(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "parity_run.py"),
            "--workdir", str(tmp_path), "--n_events", "3000",
            "--n_epoch", "2", "--dim", "32", "--topk", "5",
            "--alpha", "0.1", "--beta", "0.9", "--lr", "1e-3",
            # inductive AP at this smoke scale (3k events, 2 epochs → a
            # new-node test split of ~100 barely-trained events) swings
            # ±0.1 per single run on BOTH sides; the bound here only
            # catches catastrophic breakage. The resolving measurement is
            # the 30k-event 3-seed record (PARITY.md: Δ mean 0.0002
            # transductive, 0.021 inductive).
            "--tol", "0.06", "--nn_tol", "0.30",
        ],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    out = json.load(open(tmp_path / "parity_results.json"))
    ref = out["results"]["reference"]
    zeb = out["results"]["zebra(default bf16/rbg)"]
    # both learn (way above the 0.5 chance level), and they agree — on the
    # inductive (new-node) split too, whose variance band is wider (~15% of
    # an already-small stream; the multi-seed σ study is in PARITY.md)
    assert ref["test_ap"] > 0.55 and zeb["test_ap"] > 0.55, out
    assert out["max_delta_test_ap"] <= 0.06, out
    assert out["max_delta_nn_test_ap"] <= 0.30, out
