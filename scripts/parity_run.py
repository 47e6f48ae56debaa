"""Cross-implementation accuracy parity: reference (torch+numba-shim, CPU)
vs zebra_tpu on an identical synthetic dataset and protocol.

The six published datasets are not reachable from this container (zero
egress; see scripts/download_data.sh for the moment they are), so the A/B
runs on a synthetic JODIE-format stream with learnable community structure
(zebra_tpu.data.synthetic). Both implementations see byte-identical
``ml_{d}.csv``/``ml_{d}.npy`` inputs, the same split protocol (quantile 70/15/15
+ seed-2020 inductive holdout — implemented identically on both sides), the
same seeded eval negative draws (seeds 0/2/3, reference draw order), and the
same hyperparameters. Training negatives and parameter init differ by
framework RNG, so agreement is statistical: val-AP trajectories and test AP
must agree within a band comparable to the paper's run-to-run variance
(BASELINE.md: ±0.1-0.3 AP points on real data; wider on small synthetic
streams).

Usage::

    python scripts/parity_run.py --n_events 30000 --n_epoch 6 \
        --workdir /tmp/zebra_parity [--ab] [--tol 0.02]

``--ab`` additionally sweeps zebra_tpu's numeric deviations
(--message_dtype float32, --prng_impl threefry2x32, --memory_dtype
float32 — each the conservative variant of a bfloat16/rbg default) to
validate the defaults against their exact-reference counterparts. Prints a comparison table and exits nonzero if
|Δ test AP| exceeds --tol.

Reference entry point: /root/reference/train.py:195-317 (run via PYTHONPATH
with scripts/_numba_shim so its numba JIT layer degrades to pure Python —
identical semantics, slower).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
SHIM = os.path.join(REPO, "scripts", "_numba_shim")

VAL_AP_RE = re.compile(r"val ap: ([0-9.eE+-]+), new node val ap: ([0-9.eE+-]+)")
SEED_VAL_RE = re.compile(r"(?<!node )val ap: ([0-9.eE+-]+)\u00b1")
PARALLEL_RE = re.compile(r"parallel runs finished in [0-9.]+s: (\{.*\})")
TEST_RE = re.compile(
    r"Test statistics: (Old|New) nodes -- auc: ([0-9.eE+-]+), ap: ([0-9.eE+-]+)"
)


def make_dataset(workdir: str, name: str, n_events: int, seed: int,
                 edge_dim: int = 32, write_feats: bool = True) -> str:
    sys.path.insert(0, REPO)
    import pandas as pd

    from zebra_tpu.data.synthetic import synthetic_stream

    data, ef = synthetic_stream(
        n_events=n_events, n_users=max(50, n_events // 40),
        n_items=max(50, n_events // 40), edge_dim=edge_dim, seed=seed,
    )
    ddir = os.path.join(workdir, "data", name)
    os.makedirs(ddir, exist_ok=True)
    pd.DataFrame({
        "u": data.sources, "i": data.destinations, "ts": data.timestamps,
        "label": data.labels, "idx": data.edge_idxs,
    }).to_csv(os.path.join(ddir, f"ml_{name}.csv"), index=False)
    if write_feats:
        np.save(os.path.join(ddir, f"ml_{name}.npy"), ef)
    return os.path.join(workdir, "data")


def parse_log(log_dir: str):
    """Parse the newest log file under log_dir for per-epoch val AP and the
    final transductive/inductive test AP (identical schema on both sides).
    With ``--n_runs N`` both sides append all runs to one file; the Test
    statistics lines come in (Old, New) pairs in run order, so they group
    back into per-run results."""
    files = sorted(glob.glob(os.path.join(log_dir, "*")), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no log file under {log_dir}")
    text = open(files[-1]).read()
    m = PARALLEL_RE.search(text)
    if m:
        # seed-parallel zebra run (--parallel): ONE results dict carries the
        # per-seed test APs; per-epoch val AP uses the mean of the +-sigma line
        import ast

        res = ast.literal_eval(m.group(1))
        per = res["per_seed"]
        val_means = [float(v) for v in SEED_VAL_RE.findall(text)]
        return {
            "val_ap": val_means,
            "nn_val_ap": [],
            "test_ap": float(np.mean(per["test_ap"])),
            "nn_test_ap": float(np.mean(per["nn_test_ap"])),
            "test_ap_runs": [float(v) for v in per["test_ap"]],
            "nn_test_ap_runs": [float(v) for v in per["nn_test_ap"]],
        }
    val_ap = [(float(a), float(b)) for a, b in VAL_AP_RE.findall(text)]
    test_runs, nn_test_runs = [], []
    for typ, _auc, ap in TEST_RE.findall(text):
        (test_runs if typ == "Old" else nn_test_runs).append(float(ap))
    return {
        "val_ap": [v for v, _ in val_ap],
        "nn_val_ap": [v for _, v in val_ap],
        "test_ap": float(np.mean(test_runs)) if test_runs else None,
        "nn_test_ap": float(np.mean(nn_test_runs)) if nn_test_runs else None,
        "test_ap_runs": test_runs,
        "nn_test_ap_runs": nn_test_runs,
    }


def run_reference(workdir: str, name: str, hp: dict,
                  extra: tuple = ()) -> dict:
    run_dir = os.path.join(workdir, "ref")
    os.makedirs(run_dir, exist_ok=True)
    # the reference reads ../data/{name} relative to its cwd
    data_link = os.path.join(workdir, "ref_parent_data")
    target = os.path.join(run_dir, "..", "data")
    if not os.path.exists(os.path.join(workdir, "data")):
        raise FileNotFoundError("dataset not generated")
    del data_link, target  # run_dir/.. == workdir, which holds data/
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{SHIM}{os.pathsep}{REFERENCE}"
    env.pop("JAX_PLATFORMS", None)
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "run_reference.py"),
        "-d", name, "--bs", str(hp["bs"]), "--n_epoch", str(hp["n_epoch"]),
        "--lr", str(hp["lr"]), "--patience", str(hp["patience"]),
        "--tppr_strategy", hp["strategy"], "--topk", str(hp["topk"]),
        "--n_degree", str(hp["n_degree"]), "--n_layer", str(hp["n_layer"]),
        "--alpha_list", *map(str, hp["alpha"]),
        "--beta_list", *map(str, hp["beta"]),
        "--node_dim", str(hp["dim"]), "--time_dim", str(hp["dim"]),
        "--memory_dim", str(hp["dim"]),
        *hp.get("flags", ()),
        *extra,
    ]
    print("[parity] reference:", " ".join(cmd), flush=True)
    _run_checked(cmd, run_dir, env)
    return parse_log(os.path.join(run_dir, "log", name))


def _run_checked(cmd, run_dir, env):
    r = subprocess.run(cmd, cwd=run_dir, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    if r.returncode != 0:
        print(r.stdout, file=sys.stderr)
        raise subprocess.CalledProcessError(r.returncode, cmd)


def run_zebra(workdir: str, name: str, hp: dict, tag: str = "base",
              extra: tuple = ()) -> dict:
    run_dir = os.path.join(workdir, f"zt_{tag}")
    os.makedirs(run_dir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # the A/B is CPU-vs-CPU by design (the reference side is torch CPU).
    # Force it: on tunneled deployments the inherited env carries
    # JAX_PLATFORMS=axon, and an accidental TPU run would contend with
    # whatever benchmark holds the single chip
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "-d", name, "--data_dir", os.path.join(workdir, "data"),
        "--bs", str(hp["bs"]), "--n_epoch", str(hp["n_epoch"]),
        "--lr", str(hp["lr"]), "--patience", str(hp["patience"]),
        "--tppr_strategy", hp["strategy"], "--topk", str(hp["topk"]),
        "--n_degree", str(hp["n_degree"]), "--n_layer", str(hp["n_layer"]),
        "--alpha_list", *map(str, hp["alpha"]),
        "--beta_list", *map(str, hp["beta"]),
        "--node_dim", str(hp["dim"]), "--time_dim", str(hp["dim"]),
        "--memory_dim", str(hp["dim"]),
        "--log_dir", os.path.join(run_dir, "log"),
        "--checkpoint_dir", os.path.join(run_dir, "ckpt"),
        *hp.get("flags", ()),
        *extra,
    ]
    print(f"[parity] zebra_tpu[{tag}]:", " ".join(cmd), flush=True)
    _run_checked(cmd, run_dir, env)
    return parse_log(os.path.join(run_dir, "log", name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/zebra_parity")
    ap.add_argument("--n_events", type=int, default=30000)
    ap.add_argument("--n_epoch", type=int, default=6)
    ap.add_argument("--bs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--alpha", type=float, nargs="+", default=[0.1, 0.1])
    ap.add_argument("--beta", type=float, nargs="+", default=[0.05, 0.95])
    ap.add_argument("--patience", type=int, default=50)
    ap.add_argument("--strategy", default="streaming",
                    choices=("streaming", "pruning"))
    ap.add_argument("--n_degree", type=int, default=10,
                    help="pruning query width per hop")
    ap.add_argument("--n_layer", type=int, default=2,
                    help="pruning query depth")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--parallel", action="store_true",
                    help="run the zebra side's repeats as ONE seed-parallel "
                         "pass (--parallel_runs) instead of sequential "
                         "--n_runs; the reference side stays sequential")
    ap.add_argument("--repeats", type=int, default=1,
                    help="runs per side (--n_runs on both); Δ is then "
                         "between per-side MEANS, reported with ±σ bands")
    ap.add_argument("--tol", type=float, default=0.02,
                    help="max |Δ test AP| vs reference before exit 1")
    ap.add_argument("--nn_tol", type=float, default=None,
                    help="max |Δ inductive test AP| (default 2×tol: the "
                         "new-node split is ~15%% of an already-small "
                         "synthetic stream, so its run variance is wider)")
    ap.add_argument("--ab", action="store_true",
                    help="also sweep message_dtype / prng_impl variants")
    ap.add_argument("--no_edge_feats", action="store_true",
                    help="write no ml_*.npy (SNAP-style dataset: both sides "
                         "fall back to zero edge features)")
    ap.add_argument("--flags", default="",
                    help="comma-separated extra flag names passed to BOTH "
                         "sides with '--' prepended (reference-compatible "
                         "names; name=value for valued flags, e.g. "
                         "--flags memory_updater=rnn)")
    args = ap.parse_args()

    hp = dict(bs=args.bs, n_epoch=args.n_epoch, lr=args.lr, dim=args.dim,
              topk=args.topk, alpha=args.alpha, beta=args.beta,
              patience=args.patience, strategy=args.strategy,
              n_degree=args.n_degree, n_layer=args.n_layer,
              flags=tuple(
                  t
                  for f in args.flags.split(",") if f
                  for t in ("--" + f.split("=", 1)[0],
                            *f.split("=", 1)[1:])
              ))
    multi = (("--parallel_runs" if args.parallel else "--n_runs",
              str(args.repeats)),) if args.repeats > 1 else ()
    ref_multi = (("--n_runs", str(args.repeats)),) if args.repeats > 1 else ()
    name = "parity"
    os.makedirs(args.workdir, exist_ok=True)
    make_dataset(args.workdir, name, args.n_events, args.seed,
                 write_feats=not args.no_edge_feats)

    flat = lambda pairs: tuple(t for p in pairs for t in p)
    results = {"reference": run_reference(args.workdir, name, hp,
                                          flat(ref_multi))}
    results["zebra(default bf16/rbg)"] = run_zebra(
        args.workdir, name, hp, extra=flat(multi))
    if args.ab:
        results["zebra(f32 msgs)"] = run_zebra(
            args.workdir, name, hp, "f32", ("--message_dtype", "float32"))
        results["zebra(threefry)"] = run_zebra(
            args.workdir, name, hp, "threefry", ("--prng_impl", "threefry2x32"))
        results["zebra(f32 memory)"] = run_zebra(
            args.workdir, name, hp, "f32mem", ("--memory_dtype", "float32"))

    ref = results["reference"]
    nn_tol = args.nn_tol if args.nn_tol is not None else 2 * args.tol
    print(f"\n== parity @ n_events={args.n_events}, n_epoch={args.n_epoch}, "
          f"dims={args.dim}, M={len(args.alpha)}, k={args.topk}, "
          f"strategy={args.strategy}, repeats={args.repeats} ==")
    hdr = (f"{'impl':26s} {'val AP by epoch':38s} "
           f"{'test AP':>16s} {'nn test AP':>16s}")
    print(hdr)

    def band(runs):
        if len(runs) <= 1:
            return f"{runs[0]:.4f}" if runs else "-"
        return f"{np.mean(runs):.4f}±{np.std(runs):.4f}"

    worst = worst_nn = 0.0
    for label, r in results.items():
        traj = " ".join(f"{v:.4f}" for v in r["val_ap"][: args.n_epoch])
        print(f"{label:26s} {traj:38s} {band(r['test_ap_runs']):>16s} "
              f"{band(r['nn_test_ap_runs']):>16s}")
        if label != "reference" and None not in (
            r["test_ap"], ref["test_ap"]
        ):
            worst = max(worst, abs(r["test_ap"] - ref["test_ap"]))
        if label != "reference" and None not in (
            r["nn_test_ap"], ref["nn_test_ap"]
        ):
            worst_nn = max(
                worst_nn, abs(r["nn_test_ap"] - ref["nn_test_ap"])
            )
    print(f"\nmax |Δ mean test AP| vs reference: {worst:.4f} (tol {args.tol}); "
          f"inductive: {worst_nn:.4f} (tol {nn_tol})")
    out = {"results": results, "max_delta_test_ap": worst,
           "max_delta_nn_test_ap": worst_nn, "tol": args.tol,
           "nn_tol": nn_tol, "repeats": args.repeats,
           "n_events": args.n_events, "n_epoch": args.n_epoch}
    with open(os.path.join(args.workdir, "parity_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    sys.exit(0 if worst <= args.tol and worst_nn <= nn_tol else 1)


if __name__ == "__main__":
    main()
