"""Offline preprocessors producing ``ml_{name}.csv`` (+ ``ml_{name}.npy``).

Two input formats, matching the reference's offline CLIs:

- JODIE CSV (``u,i,ts,label,feat...`` with a header line): reference
  utils/preprocess_data.py. Output ids are reindexed 1-based; for bipartite
  graphs item ids are offset by the user count so both sides share one id
  space; edge features get a zero row prepended at index 0.
- SNAP space-separated ``u i ts`` (AskUbuntu / SuperUser / Wiki-Talk):
  reference utils/preprocess_custom_data.py. Events are sorted by time,
  timestamps shifted to start at 0, non-contiguous node ids compacted, label 0,
  no features.

Implementation is vectorized numpy/pandas rather than per-line Python loops.

CLI:
  python -m zebra_tpu.data.preprocess --data wikipedia --bipartite
  python -m zebra_tpu.data.preprocess --data superuser --format snap
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def reindex(df: pd.DataFrame, bipartite: bool = True) -> pd.DataFrame:
    """Shift ids to 1-based; for bipartite graphs offset item ids by the user
    count first (reference preprocess_data.py:37-61)."""
    new_df = df.copy()
    if bipartite:
        assert df.u.max() - df.u.min() + 1 == len(df.u.unique())
        assert df.i.max() - df.i.min() + 1 == len(df.i.unique())
        upper_u = df.u.max() + 1
        new_df.i = df.i + upper_u
    new_df.u += 1
    new_df.i += 1
    new_df.idx += 1
    return new_df


def preprocess_jodie(path: str):
    """Parse a JODIE-format CSV (header line then ``u,i,ts,label,feat...``)
    via the native C++ ingest (pandas fallback)."""
    from zebra_tpu.native.ingest import load_events

    ev = load_events(path, "jodie")
    feat = ev.feat if ev.feat is not None else np.zeros((len(ev.u), 0))
    df = pd.DataFrame(
        {"u": ev.u, "i": ev.i, "ts": ev.ts, "label": ev.label,
         "idx": np.arange(len(ev.u))}
    )
    return df, feat


def preprocess_snap(path: str) -> pd.DataFrame:
    """Parse space-separated ``u i ts``; sort by time, shift ts to 0, compact
    node ids to a contiguous 0-based range preserving numeric order
    (reference preprocess_custom_data.py:8-77). Uses the native C++ ingest
    (pandas fallback)."""
    from zebra_tpu.native.ingest import load_events

    ev = load_events(path, "snap", sort_by_time=True, compact_ids=True)
    ts = ev.ts - ev.ts.min() if len(ev.ts) else ev.ts
    return pd.DataFrame(
        {
            "u": ev.u,
            "i": ev.i,
            "ts": ts,
            "label": np.zeros(len(ev.u)),
            "idx": np.arange(len(ev.u)),
        }
    )


def run(data_name: str, data_dir: str = "data", bipartite: bool = False,
        fmt: str = "jodie") -> str:
    """Preprocess ``{data_dir}/{name}/{name}[.csv]`` into ``ml_{name}.csv``
    (+ ``ml_{name}.npy`` with zero row 0, JODIE format only)."""
    out_dir = Path(data_dir) / data_name
    out_dir.mkdir(parents=True, exist_ok=True)
    out_csv = out_dir / f"ml_{data_name}.csv"

    if fmt == "jodie":
        src = out_dir / f"{data_name}.csv"
        df, feat = preprocess_jodie(str(src))
        new_df = reindex(df, bipartite)
        new_df.to_csv(out_csv)
        if feat.shape[1] > 0:
            feat = np.vstack([np.zeros((1, feat.shape[1])), feat])
            np.save(out_dir / f"ml_{data_name}.npy", feat)
    elif fmt == "snap":
        src = out_dir / data_name
        df = preprocess_snap(str(src))
        new_df = reindex(df, bipartite)
        new_df.to_csv(out_csv)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return str(out_csv)


def main(argv=None):
    p = argparse.ArgumentParser("zebra_tpu offline preprocessing")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--bipartite", action="store_true")
    p.add_argument("--format", dest="fmt", choices=["jodie", "snap"], default="jodie")
    args = p.parse_args(argv)
    out = run(args.data, args.data_dir, args.bipartite, args.fmt)
    print(out)


if __name__ == "__main__":
    main()
