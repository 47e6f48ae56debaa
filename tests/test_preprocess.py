"""Offline preprocessors: JODIE and SNAP paths produce the reference output
schema (1-based ids, bipartite offset, zero feature row)."""

import numpy as np
import pandas as pd

from zebra_tpu.data import preprocess


def test_jodie_roundtrip(tmp_path):
    d = tmp_path / "toy"
    d.mkdir()
    (d / "toy.csv").write_text(
        "user_id,item_id,timestamp,state_label,f0,f1\n"
        "0,0,0.5,0,1.0,2.0\n"
        "1,2,1.0,0,3.0,4.0\n"
        "2,1,2.5,1,5.0,6.0\n"
    )
    out = preprocess.run("toy", str(tmp_path), bipartite=True, fmt="jodie")
    df = pd.read_csv(out)
    # bipartite: items offset by #users (3), then everything 1-based
    assert df.u.tolist() == [1, 2, 3]
    assert df.i.tolist() == [4, 6, 5]
    assert df.idx.tolist() == [1, 2, 3]
    feat = np.load(str(tmp_path / "toy" / "ml_toy.npy"))
    assert feat.shape == (4, 2)
    np.testing.assert_array_equal(feat[0], [0.0, 0.0])  # zero padding row
    np.testing.assert_array_equal(feat[1], [1.0, 2.0])


def test_snap_roundtrip(tmp_path):
    d = tmp_path / "chat"
    d.mkdir()
    # unsorted times, sparse ids, no features
    (d / "chat").write_text("50 9 300\n9 7 100\n7 50 200\n")
    out = preprocess.run("chat", str(tmp_path), bipartite=False, fmt="snap")
    df = pd.read_csv(out)
    assert df.ts.tolist() == [0.0, 100.0, 200.0]  # sorted, shifted to 0
    # ids compacted (7,9,50 → 0,1,2) then 1-based
    assert df.u.tolist() == [2, 1, 3]
    assert df.i.tolist() == [1, 3, 2]
    assert df.idx.tolist() == [1, 2, 3]
