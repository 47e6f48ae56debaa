#!/usr/bin/env bash
# Fetch + preprocess the six reference datasets (BASELINE.md, reference
# README.md). Run on a machine with network access; this container is
# zero-egress, so real-data parity runs (scripts/parity_run.py --help)
# become possible the moment the data is reachable.
#
# Usage: scripts/download_data.sh [data_root]   (default ./data)
set -euo pipefail

ROOT="${1:-data}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT"

jodie() { # JODIE csv datasets: wikipedia, reddit, mooc
  local d="$1"
  mkdir -p "$ROOT/$d"
  [ -f "$ROOT/$d/$d.csv" ] ||
    curl -L "http://snap.stanford.edu/jodie/$d.csv" -o "$ROOT/$d/$d.csv"
  python -m zebra_tpu.data.preprocess --data "$d" --data_dir "$ROOT" \
    --format jodie --bipartite
}

snap() { # SNAP whitespace streams: askubuntu, superuser, wikitalk
  local d="$1" url="$2"
  mkdir -p "$ROOT/$d"
  if [ ! -f "$ROOT/$d/$d.txt" ]; then
    curl -L "$url" -o "$ROOT/$d/$d.txt.gz"
    gunzip -f "$ROOT/$d/$d.txt.gz"
  fi
  python -m zebra_tpu.data.preprocess --data "$d" --data_dir "$ROOT" \
    --format snap
}

cd "$REPO"
jodie wikipedia
jodie reddit
jodie mooc
snap askubuntu "https://snap.stanford.edu/data/sx-askubuntu.txt.gz"
snap superuser "https://snap.stanford.edu/data/sx-superuser.txt.gz"
snap wikitalk "https://snap.stanford.edu/data/wiki-talk-temporal.txt.gz"

echo "All six datasets preprocessed under $ROOT/."
echo "Reproduce BASELINE.md (reference Table 4/5 config) with e.g.:"
echo "  python train.py -d wikipedia --data_dir $ROOT --n_epoch 50 --bs 200 \\"
echo "    --tppr_strategy streaming --topk 20 --alpha_list 0.1 0.1 \\"
echo "    --beta_list 0.5 0.95 --enable_random"
