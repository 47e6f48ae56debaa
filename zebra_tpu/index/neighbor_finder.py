"""Padded-CSR temporal adjacency index.

TPU-native replacement for the reference's per-node list-of-arrays
``NeighborFinder`` jitclass (reference utils/util.py:144-173): one flat
time-sorted arena per field plus an offsets vector, so temporal queries become
vmapped bounded binary searches and gathers — no ragged structures on device.

The adjacency is undirected (both directions inserted, reference
util.py:94-96) and per-node entries are sorted by timestamp (stable, so
same-timestamp entries keep stream order like the reference's ``sorted``)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NeighborIndex(NamedTuple):
    nbr: jnp.ndarray      # i32 [T]  neighbor node ids, grouped by node, ts-sorted
    eidx: jnp.ndarray     # i32 [T]  edge ids
    ts: jnp.ndarray       # f32 [T]  edge timestamps
    offsets: jnp.ndarray  # i32 [N+1] node v owns slots [offsets[v], offsets[v+1])

    @property
    def n_nodes(self) -> int:
        return self.offsets.shape[0] - 1


def build_neighbor_index(
    sources, destinations, timestamps, edge_idxs, n_nodes: int,
    capacity: int = 0,
) -> NeighborIndex:
    """Host-side construction (runs once per split, reference
    get_neighbor_finder util.py:90-107).

    ``capacity`` > the natural arena length pads the [T] arrays with zero
    slots that no offset range ever references — all queries bound their
    reads by ``offsets``. Serving's incremental folds use a bucketed
    capacity so repeated rebuilds keep one static shape (each new shape
    would recompile every jitted consumer — serve.flush_index)."""
    sources = np.asarray(sources, np.int64)
    destinations = np.asarray(destinations, np.int64)
    timestamps = np.asarray(timestamps, np.float64)
    edge_idxs = np.asarray(edge_idxs, np.int64)

    owner = np.concatenate([sources, destinations])
    nbr = np.concatenate([destinations, sources])
    ts = np.concatenate([timestamps, timestamps])
    eidx = np.concatenate([edge_idxs, edge_idxs])

    # group by owner, then by time within owner (stable two-key sort)
    order = np.lexsort((ts, owner))
    owner, nbr, ts, eidx = owner[order], nbr[order], ts[order], eidx[order]

    counts = np.bincount(owner, minlength=n_nodes)
    offsets = np.zeros(n_nodes + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])

    if capacity > len(owner):
        pad = capacity - len(owner)
        nbr = np.concatenate([nbr, np.zeros(pad, nbr.dtype)])
        eidx = np.concatenate([eidx, np.zeros(pad, eidx.dtype)])
        ts = np.concatenate([ts, np.zeros(pad, ts.dtype)])

    return NeighborIndex(
        nbr=jnp.asarray(nbr, jnp.int32),
        eidx=jnp.asarray(eidx, jnp.int32),
        ts=jnp.asarray(ts, jnp.float32),
        offsets=jnp.asarray(offsets, jnp.int32),
    )


def pad_arena(index: NeighborIndex, capacity: int) -> NeighborIndex:
    """Zero-pad the [T] arena arrays to ``capacity`` — equivalent to having
    built with ``build_neighbor_index(..., capacity=capacity)`` (no offset
    range ever references the tail). Serving pads a naturally-sized index to
    the bucketed capacity its incremental folds use, so the very first fold
    does not change the arena shape and recompile every jitted consumer."""
    t = int(index.ts.shape[0])
    if capacity <= t:
        return index
    pad = capacity - t
    z = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
    return NeighborIndex(nbr=z(index.nbr), eidx=z(index.eidx),
                         ts=z(index.ts), offsets=index.offsets)


def count_before(index: NeighborIndex, nodes: jnp.ndarray, cuts: jnp.ndarray
                 ) -> jnp.ndarray:
    """For each (node, cut) pair, the index one past the last entry with
    ts < cut inside the node's slice — i.e. ``offsets[v] + |{ts < cut}|``
    (reference find_before, util.py:152-154). Fixed-depth branchless binary
    search, vmapped over queries."""
    lo0 = index.offsets[nodes]
    hi0 = index.offsets[nodes + 1]

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) // 2
        below = active & (index.ts[mid] < cuts)
        return jnp.where(below, mid + 1, lo), jnp.where(active & ~below, mid, hi)

    # A slice of length n needs ⌊log2 n⌋+1 halvings in the worst case (each
    # step shrinks the interval to ≤⌊n/2⌋); bounding by the static arena
    # length T still saves the dead iterations of a fixed 32-step loop (each
    # costs a [Q] gather on every lane). ⌈log2 T⌉ is one short for a length-T
    # slice when T is an exact power of two — only reachable via all-self-loop
    # streams, whose paired timestamps happen to converge anyway (fuzzed), but
    # one extra cheap iteration makes the bound unconditional.
    steps = int(np.floor(np.log2(max(1, index.ts.shape[0])))) + 1
    lo, hi = jax.lax.fori_loop(0, steps, body, (lo0, hi0))
    return lo


def most_recent_neighbors(
    index: NeighborIndex, nodes: jnp.ndarray, cuts: jnp.ndarray, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The ``n`` most recent interactions of each node strictly before its cut
    time (reference get_temporal_neighbor, util.py:156-173), newest first.

    Returns (nbr, eidx, ts, valid, n_before) with leading query axis; invalid
    slots are zero-filled. ``n_before`` is the total (unclipped) count of
    earlier interactions, needed by the pruning weight norm."""
    end = count_before(index, nodes, cuts)               # [Q]
    start = index.offsets[nodes]
    n_before = end - start                               # [Q]

    z = jnp.arange(n, dtype=jnp.int32)                   # newest-first offsets
    pos = end[:, None] - 1 - z[None, :]                  # [Q, n]
    valid = pos >= start[:, None]
    safe = jnp.where(valid, pos, 0)
    return (
        jnp.where(valid, index.nbr[safe], 0),
        jnp.where(valid, index.eidx[safe], 0),
        jnp.where(valid, index.ts[safe], 0.0),
        valid,
        n_before,
    )
