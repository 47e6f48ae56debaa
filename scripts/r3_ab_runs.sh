#!/bin/bash
# Round-3 queue: back-to-back A/B measurements on the real TPU.
#
# Runs the per-epoch training microbench (scripts/train_microbench.py) for
# each parked candidate against a fresh baseline, sequentially (never two
# TPU processes at once — they contend on the single tunneled chip). The
# tunnel's service rate drifts ±15% between sessions, so ONLY the numbers
# from one invocation of this script are comparable with each other.
#
# Usage: bash scripts/r3_ab_runs.sh [epochs]   (default 4)
set -u
cd "$(dirname "$0")/.."
EPOCHS="${1:-4}"
OUT="${AB_OUT:-/tmp/ab_results.txt}"
: > "$OUT"

run() { # name, env pairs..., then -- is implicit: uses current tree
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  env "$@" timeout 1200 python scripts/train_microbench.py "epochs=$EPOCHS" \
    2>&1 | grep -v WARNING | tee -a "$OUT"
}

echo "A/B run started $(date)" | tee -a "$OUT"
git stash list | grep -q r3ab && { echo "stale r3ab stash; abort"; exit 1; }

run baseline

git apply docs/patches/2d-diffusion-tower.diff || exit 1
run 2d-diffusion-tower
git apply -R docs/patches/2d-diffusion-tower.diff || exit 1

git apply docs/patches/valid-int8-scan.diff || exit 1
run valid-int8-scan
git apply -R docs/patches/valid-int8-scan.diff || exit 1

run rank-topk ZEBRA_PALLAS_TOPK=rank

run baseline-recheck

echo "A/B run finished $(date)" | tee -a "$OUT"
