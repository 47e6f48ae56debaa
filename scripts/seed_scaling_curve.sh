#!/bin/bash
# Seed-parallel scaling curve on the real chip (round-5 VERDICT item 1):
# back-to-back arms in ONE window (the tunnel's service rate drifts ±15%
# between sessions — only back-to-back numbers are comparable).
#
#   bash scripts/seed_scaling_curve.sh          # bench scale, k ∈ {20, 5}
#   bash scripts/seed_scaling_curve.sh wt       # Wiki-Talk scale (~1.14M nodes)
#
# Results tables live in RESULTS.md (round 5).
set -u
cd "$(dirname "$0")/.."

if [ "${1:-bench}" = "wt" ]; then
  for S in 1 2 4 8; do
    echo "== Wiki-Talk scale parallel_runs=$S =="
    timeout 1200 python scripts/scale_bench.py parallel_runs=$S epochs=2 \
      || echo "ARM FAILED (S=$S rc=$?)"
  done
else
  for K in 20 5; do
    for S in 1 2 4 8 16; do
      echo "== bench topk=$K parallel_runs=$S =="
      timeout 900 python scripts/train_microbench.py topk=$K \
        parallel_runs=$S epochs=3 || echo "ARM FAILED (k=$K S=$S rc=$?)"
    done
  done
fi
