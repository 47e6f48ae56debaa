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
set -uo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-4}"
OUT="${AB_OUT:-/tmp/ab_results.txt}"
: > "$OUT"

# measurements patch the working tree; require it clean so 'baseline' is
# HEAD, and always revert the active patch on exit (the relay dying
# mid-candidate is a documented failure mode)
if ! git diff --quiet; then
  echo "working tree dirty; refusing to A/B (baseline would be undefined)"
  exit 1
fi
ACTIVE_PATCH=""
cleanup() {
  if [ -n "$ACTIVE_PATCH" ]; then
    git apply -R "$ACTIVE_PATCH" 2>/dev/null \
      && echo "cleanup: reverted $ACTIVE_PATCH" | tee -a "$OUT"
  fi
}
trap cleanup EXIT

run() { # name, then optional env pairs; uses the current tree
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT"
  if env "$@" timeout 1200 python scripts/train_microbench.py \
      "epochs=$EPOCHS" 2>&1 | grep -v WARNING | tee -a "$OUT"; then
    :
  else
    echo "!!! $name FAILED (rc=$?) — numbers above are incomplete" \
      | tee -a "$OUT"
  fi
}

with_patch() { # patch-file, name
  local patch="$1" name="$2"
  git apply "$patch" || { echo "apply $patch failed" | tee -a "$OUT"; return 1; }
  ACTIVE_PATCH="$patch"
  run "$name"
  git apply -R "$patch" || { echo "REVERT OF $patch FAILED — tree dirty" | tee -a "$OUT"; exit 1; }
  ACTIVE_PATCH=""
}

echo "A/B run started $(date)" | tee -a "$OUT"
run baseline
with_patch docs/patches/2d-diffusion-tower.diff 2d-diffusion-tower
with_patch docs/patches/valid-int8-scan.diff valid-int8-scan
run rank-topk ZEBRA_PALLAS_TOPK=rank
run baseline-recheck
echo "A/B run finished $(date)" | tee -a "$OUT"
