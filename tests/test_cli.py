"""End-to-end CLI: preprocess a tiny JODIE csv, then run train.py's main on
it for two epochs."""

import os

import numpy as np
import pytest


def test_cli_end_to_end(tmp_path, monkeypatch):
    # build a tiny JODIE-format dataset
    rng = np.random.RandomState(0)
    n = 600
    d = tmp_path / "toy"
    d.mkdir()
    with open(d / "toy.csv", "w") as f:
        f.write("u,i,ts,label,f0,f1\n")
        for i in range(n):
            u = rng.randint(0, 40)
            v = rng.randint(0, 40)
            f.write(f"{u},{v},{float(i)},0,{rng.rand():.4f},{rng.rand():.4f}\n")

    from zebra_tpu.data import preprocess

    preprocess.run("toy", str(tmp_path), bipartite=True, fmt="jodie")

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    train_cli.main([
        "-d", "toy", "--data_dir", str(tmp_path),
        "--n_epoch", "2", "--bs", "32", "--patience", "1",
        "--node_dim", "16", "--time_dim", "16", "--memory_dim", "16",
        "--topk", "4", "--alpha_list", "0.1", "--beta_list", "0.9",
        "--tppr_strategy", "streaming", "--lr", "0.001",
    ])
    # log file written with the derived run name
    logs = list((tmp_path / "log" / "toy").iterdir())
    assert logs, "no log file produced"


def test_cli_parallel_runs(tmp_path, monkeypatch):
    """--parallel_runs 2 trains both seeds in one pass and logs the
    per-seed mean ± σ summary."""
    rng = np.random.RandomState(1)
    n = 400
    d = tmp_path / "toy2"
    d.mkdir()
    with open(d / "toy2.csv", "w") as f:
        f.write("u,i,ts,label,f0\n")
        for i in range(n):
            u = rng.randint(0, 30)
            v = rng.randint(0, 30)
            f.write(f"{u},{v},{float(i)},0,{rng.rand():.4f}\n")

    from zebra_tpu.data import preprocess

    preprocess.run("toy2", str(tmp_path), bipartite=True, fmt="jodie")

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    train_cli.main([
        "-d", "toy2", "--data_dir", str(tmp_path),
        "--n_epoch", "1", "--bs", "32", "--patience", "1",
        "--node_dim", "16", "--time_dim", "16", "--memory_dim", "16",
        "--topk", "4", "--alpha_list", "0.1", "--beta_list", "0.9",
        "--tppr_strategy", "streaming", "--lr", "0.001",
        "--parallel_runs", "2",
    ])
    logs = list((tmp_path / "log" / "toy2").iterdir())
    assert logs, "no log file produced"
    text = logs[0].read_text()
    assert "parallel runs finished" in text
    assert "2 seeds" in text


def test_cli_task_node(tmp_path, monkeypatch):
    """--task node runs the downstream decoder after link training and logs
    per-stream AUC."""
    from zebra_tpu.data.synthetic import synthetic_stream
    import pandas as pd

    data, _ = synthetic_stream(n_events=500, n_users=30, n_items=30,
                               edge_dim=2, seed=3, label_users_frac=0.3)
    d = tmp_path / "toy3"
    d.mkdir()
    pd.DataFrame({
        "u": data.sources - 1,
        "i": data.destinations - 1 - 30,
        "ts": data.timestamps,
        "label": data.labels,
        "f0": np.random.RandomState(0).rand(len(data.sources)),
    }).to_csv(d / "toy3.csv", index=False)

    from zebra_tpu.data import preprocess

    preprocess.run("toy3", str(tmp_path), bipartite=True, fmt="jodie")

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    train_cli.main([
        "-d", "toy3", "--data_dir", str(tmp_path),
        "--n_epoch", "1", "--bs", "32", "--patience", "1",
        "--node_dim", "16", "--time_dim", "16", "--memory_dim", "16",
        "--topk", "4", "--alpha_list", "0.1", "--beta_list", "0.9",
        "--task", "node", "--node_decoder_steps", "50",
    ])
    logs = list((tmp_path / "log" / "toy3").iterdir())
    assert logs, "no log file produced"
    text = logs[0].read_text()
    assert "node classification auc" in text
