#!/usr/bin/env bash
# Exact-config runs for the reference's published benchmarks (BASELINE.md,
# Tables 4-5 of the technical report) — runnable the moment the datasets are
# fetched with scripts/download_data.sh (this container is zero-egress).
#
# The reference publishes one full command (its README.md:40, Wikipedia):
#   train.py --n_epoch 50 --bs 200 --data wikipedia --enable_random
#            --tppr_strategy streaming --topk 20
#            --alpha_list 0.1 0.1 --beta_list 0.5 0.95
# and states the shared protocol (report stream 9): ensemble of two top-20
# T-PPR metrics, bs=200, <=50 epochs, early-stop patience 5, 5 runs averaged.
# Per-dataset (alpha, beta) are not published beyond that; these runs use the
# published Wikipedia ensemble for every dataset, plus a pruning-strategy
# MOOC run (BASELINE.json config list) exercising the stateless query path.
#
# Usage: scripts/run_baselines.sh [data_root] [extra train.py flags...]
set -euo pipefail

ROOT="${1:-data}"; shift || true
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

COMMON=(--n_epoch 50 --bs 200 --enable_random --n_runs 5
        --topk 20 --alpha_list 0.1 0.1 --beta_list 0.5 0.95
        --data_dir "$ROOT" --checkpoint_dir "$ROOT/ckpt" --log_dir "$ROOT/log")

run() {
  echo "== $* =="
  python train.py "$@" "${COMMON[@]}" ${EXTRA[@]+"${EXTRA[@]}"}
}
EXTRA=("$@")

# JODIE bipartite streams (Table 4; expect trans AP 98.67 / 98.76 / 92.45)
run -d wikipedia --tppr_strategy streaming
run -d reddit    --tppr_strategy streaming
run -d mooc      --tppr_strategy streaming

# MOOC through the pruning-strategy query path (BASELINE.json config 3;
# width/depth from --n_degree/--n_layer, reference embedding_module.py:107)
run -d mooc --tppr_strategy pruning --n_degree 10 --n_layer 2

# SNAP custom streams (Table 5; expect trans AP 94.47 / 93.21 / 95.45);
# names match scripts/download_data.sh's preprocessing output dirs
run -d askubuntu --tppr_strategy streaming
run -d superuser --tppr_strategy streaming
run -d wikitalk  --tppr_strategy streaming
