"""ctypes bindings for the native event-stream ingest library.

Builds ``libzt_ingest.so`` from ``ingest.cc`` on first use (cached next to
the source). ``load_events`` returns numpy column views copied out of the
native buffers; format/semantics match the offline preprocessors in
``zebra_tpu.data.preprocess`` (JODIE csv and SNAP whitespace streams)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ingest.cc")
_LIB = os.path.join(_HERE, "libzt_ingest.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _ZtEvents(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("feat_dim", ctypes.c_int64),
        ("u", ctypes.POINTER(ctypes.c_int64)),
        ("i", ctypes.POINTER(ctypes.c_int64)),
        ("ts", ctypes.POINTER(ctypes.c_double)),
        ("label", ctypes.POINTER(ctypes.c_double)),
        ("feat", ctypes.POINTER(ctypes.c_double)),
        ("impl", ctypes.c_void_p),
    ]


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_LIB)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return ctypes.CDLL(_LIB)
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.zt_parse_events.restype = ctypes.POINTER(_ZtEvents)
                lib.zt_parse_events.argtypes = [
                    ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ]
                lib.zt_free.argtypes = [ctypes.POINTER(_ZtEvents)]
                _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


class EventColumns(NamedTuple):
    u: np.ndarray        # int64 [n]
    i: np.ndarray        # int64 [n]
    ts: np.ndarray       # float64 [n]
    label: np.ndarray    # float64 [n]
    feat: Optional[np.ndarray]  # float64 [n, d] or None


def load_events(
    path: str, fmt: str = "jodie", sort_by_time: bool = False,
    compact_ids: bool = False,
) -> EventColumns:
    """Parse an event file with the native library (falling back to pandas).

    fmt 'jodie': header + ``u,i,ts,label,feat...``; fmt 'snap': ``u i ts``.
    """
    lib = _get_lib()
    if lib is None:
        return _load_events_python(path, fmt, sort_by_time, compact_ids)

    flags = (1 if sort_by_time else 0) | (2 if compact_ids else 0)
    handle = lib.zt_parse_events(
        path.encode(), 0 if fmt == "jodie" else 1, flags
    )
    if not handle:
        raise ValueError(f"native ingest failed to parse {path!r}")
    try:
        h = handle.contents
        n, d = h.n, h.feat_dim
        u = np.ctypeslib.as_array(h.u, (n,)).copy()
        i = np.ctypeslib.as_array(h.i, (n,)).copy()
        ts = np.ctypeslib.as_array(h.ts, (n,)).copy()
        label = np.ctypeslib.as_array(h.label, (n,)).copy()
        feat = (
            np.ctypeslib.as_array(h.feat, (n, d)).copy() if d > 0 and n > 0 else None
        )
        return EventColumns(u, i, ts, label, feat)
    finally:
        lib.zt_free(handle)


def _load_events_python(path, fmt, sort_by_time, compact_ids) -> EventColumns:
    import pandas as pd

    if fmt == "jodie":
        raw = pd.read_csv(path)
        cols = list(raw.columns)
        u = raw[cols[0]].to_numpy(np.int64)
        i = raw[cols[1]].to_numpy(np.int64)
        ts = raw[cols[2]].to_numpy(np.float64)
        label = raw[cols[3]].to_numpy(np.float64)
        feat = raw[cols[4:]].to_numpy(np.float64) if len(cols) > 4 else None
    else:
        raw = pd.read_csv(path, sep=r"\s+", header=None, usecols=[0, 1, 2],
                          names=["u", "i", "ts"])
        u = raw.u.to_numpy(np.int64)
        i = raw.i.to_numpy(np.int64)
        ts = raw.ts.to_numpy(np.float64)
        label = np.zeros(len(u))
        feat = None

    if sort_by_time:
        order = np.argsort(ts, kind="stable")
        u, i, ts, label = u[order], i[order], ts[order], label[order]
        if feat is not None:
            feat = feat[order]
    if compact_ids:
        all_ids = np.unique(np.concatenate([u, i]))
        u = np.searchsorted(all_ids, u)
        i = np.searchsorted(all_ids, i)
    return EventColumns(u, i, ts, label, feat)


def wave_schedule(src, dst, neg, n_nodes: int, cap: int, n_shards: int = 1):
    """Greedy dependency-respecting wave assignment for the parallel SANTA
    scan (see ingest.cc zt_wave_schedule): returns (wave[i], slot[i],
    n_waves) with wave sizes ≤ cap; edges within a wave are pairwise
    node-disjoint and every cross-wave data dependency is respected, so the
    wave-parallel scan is bit-exact with the sequential one.

    ``neg`` is [E] (one negative stream) or [S, E] (S streams — the
    seed-parallel trainer runs ONE shared scan whose extraction serves every
    seed's negatives, so all S reads constrain the schedule). [1, E] produces
    the identical schedule to [E].

    ``n_shards > 1`` selects the owner-aligned scheduler (ingest.cc
    schedule_impl): lanes partition into n_shards blocks and every
    edge lands in the block of its src row's owner shard (contiguous row
    sharding), so per-shard wave executors read their block's src rows
    locally. Requires cap % n_shards == 0."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    negs = np.ascontiguousarray(np.atleast_2d(np.asarray(neg, np.int32)))
    n_neg = negs.shape[0]
    n = len(src)
    if negs.shape[1] != n:
        raise ValueError(f"neg shape {negs.shape} does not match {n} edges")
    wave = np.empty(n, np.int32)
    slot = np.empty(n, np.int32)
    if n_shards > 1 and cap % n_shards != 0:
        raise ValueError(f"wave_cap {cap} must be a multiple of n_shards {n_shards}")

    lib = _get_lib()
    if lib is not None:
        if not hasattr(lib, "_wave_ready"):
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.zt_wave_schedule_multi.restype = ctypes.c_int64
            lib.zt_wave_schedule_multi.argtypes = [
                i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
            ]
            lib._wave_ready = True
        ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        n_waves = lib.zt_wave_schedule_multi(
            ptr(src), ptr(dst), ptr(negs), n_neg, n, n_nodes, cap,
            max(1, n_shards), ptr(wave), ptr(slot),
        )
        if n_waves < 0:
            raise ValueError(
                f"wave_schedule: node id out of range [0, {n_nodes})"
            )
        return wave, slot, int(n_waves)

    # pure-python fallback (slow; tests only)
    block = cap // n_shards if n_shards > 1 else cap
    rows_per_shard = -(-n_nodes // n_shards) if n_shards > 1 else n_nodes
    last_write = np.full(n_nodes, -1, np.int64)
    last_read = np.zeros(n_nodes, np.int64)
    counts: list = []  # per wave: per-shard occupancy list
    n_waves = 0
    for i in range(n):
        owner = int(src[i]) // rows_per_shard if n_shards > 1 else 0
        w = int(max(last_write[src[i]], last_write[dst[i]],
                    max(last_write[negs[:, i]]))) + 1
        w = max(w, int(last_read[src[i]]), int(last_read[dst[i]]))
        while w < len(counts) and counts[w][owner] >= block:
            w += 1
        while w >= len(counts):
            counts.append([0] * max(1, n_shards))
        wave[i] = w
        slot[i] = owner * block + counts[w][owner]
        counts[w][owner] += 1
        last_write[src[i]] = w
        last_write[dst[i]] = w
        for v in (src[i], dst[i], *negs[:, i]):
            if w > last_read[v]:
                last_read[v] = w
        n_waves = max(n_waves, w + 1)
    return wave, slot, n_waves
