"""Native C++ event ingest: builds, parses both formats, matches the
pure-Python path exactly."""

import os

import numpy as np
import pytest

from zebra_tpu.native.ingest import (
    _load_events_python,
    load_events,
    native_available,
)


@pytest.fixture
def jodie_file(tmp_path):
    p = tmp_path / "toy.csv"
    p.write_text(
        "user_id,item_id,timestamp,state_label,f0,f1\n"
        "3,7,0.5,0,1.5,-2.0\n"
        "4,7,1.25,1,0.0,3.5\n"
        "3,9,2.0,0,2.25,0.125\n"
    )
    return str(p)


@pytest.fixture
def snap_file(tmp_path):
    p = tmp_path / "toy.txt"
    # deliberately unsorted timestamps and sparse ids
    p.write_text("100 205 30\n7 100 10\n205 7 20\n")
    return str(p)


def test_native_builds():
    assert native_available(), "g++ build of ingest.cc failed"


def test_jodie_parse_matches_python(jodie_file):
    got = load_events(jodie_file, "jodie")
    want = _load_events_python(jodie_file, "jodie", False, False)
    np.testing.assert_array_equal(got.u, want.u)
    np.testing.assert_array_equal(got.i, want.i)
    np.testing.assert_array_equal(got.ts, want.ts)
    np.testing.assert_array_equal(got.label, want.label)
    np.testing.assert_array_equal(got.feat, want.feat)
    assert got.feat.shape == (3, 2)


def test_snap_parse_sort_compact(snap_file):
    got = load_events(snap_file, "snap", sort_by_time=True, compact_ids=True)
    want = _load_events_python(snap_file, "snap", True, True)
    np.testing.assert_array_equal(got.u, want.u)
    np.testing.assert_array_equal(got.i, want.i)
    np.testing.assert_array_equal(got.ts, want.ts)
    # ids compacted to 0..3 (nodes 7,100,205), time-sorted
    assert got.ts.tolist() == [10.0, 20.0, 30.0]
    assert set(np.concatenate([got.u, got.i]).tolist()) == {0, 1, 2}


def test_large_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 20000
    u = rng.randint(0, 500, n)
    i = rng.randint(500, 1000, n)
    ts = np.sort(rng.rand(n) * 1e6)
    label = rng.randint(0, 2, n).astype(float)
    feat = rng.randn(n, 4).round(6)
    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        f.write("u,i,ts,label,f0,f1,f2,f3\n")
        for row in range(n):
            f.write(
                f"{u[row]},{i[row]},{float(ts[row])!r},{float(label[row])!r},"
                + ",".join(repr(float(x)) for x in feat[row])
                + "\n"
            )
    got = load_events(str(path), "jodie")
    np.testing.assert_array_equal(got.u, u)
    np.testing.assert_array_equal(got.i, i)
    np.testing.assert_allclose(got.ts, ts, rtol=0, atol=0)
    np.testing.assert_allclose(got.feat, feat, rtol=0, atol=0)
