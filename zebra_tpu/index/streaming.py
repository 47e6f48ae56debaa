"""Streaming top-k temporal personalized PageRank (T-PPR) index — dense, on-device.

TPU-native re-design of the reference's per-node Numba dict index
(reference utils/util.py:377-576, jitclass ``tppr_finder``). Instead of one
hash map per node we keep fixed-k dense state resident in device HBM, packed
so each node's entire record — top-k entries of every ensemble member plus
the norms — is one contiguous row:

    data : f32 [N, F]   one flat row per node, F = M·(4k+1):
                        the first M·4k lanes hold, per ensemble member, the
                        four k-vectors [weight | neighbor id | edge id |
                        entry timestamp] (reshaped to [M, 4, k] in-register),
                        and the last M lanes hold the per-member running
                        norm  n ← n·β + β.

The single trailing axis is deliberate: TPU arrays tile their last two dims
to (8, 128), so a [N, M, 4, k] layout with k ≈ 20 pads 12.8× in HBM and
drags that padding through every row access; a flat [N, F] row pads only to
the next 128 lanes, and the per-edge state traffic becomes exactly one
contiguous row gather for (src, dst, neg) and one row scatter for
(src, dst) — fields and norms together. The scan is HBM-bound, so this
layout sets throughput.

Ids are stored as f32 *values*, not bitcast int32: ids below 2^23 bitcast to
denormal floats, which partitioned XLA programs may flush to zero; value
conversion round-trips exactly for ids < 2^24 (16.7M — above the largest
reference dataset's 7.8M edges; larger graphs need a split-row layout).

Precision vs the reference's f64 host dicts (util.py:377-387) — measured at
full Wiki-Talk length (7.8M events, ts span 2.3e8 s; scripts/drift_study.py,
RESULTS.md round 3): f32 norm/weight drift stays flat along the stream
(norm relative error ≤ ~7e-7 even on nodes touched 50k+ times — the
norm recurrence norm·β+β is contractive, so error does not compound), and
the extracted top-k sets match the f64 oracle with Jaccard p50 = 1.0.
Entry *timestamps* are also f32: at t ≈ 2.3e8 s the ulp is 16 s, so a
stored entry's ts (and hence the extraction's Δt = t_query − ts) quantizes
by up to ±16 s. The reference's own extraction emits f32 Δt and its time
encoder runs f32 cos at the same magnitudes, so downstream parity holds;
only the stored-key precision differs. Merge dedup is unaffected (keys
match on the unique edge index, not ts).

where M = ensemble size (one (α, β) metric per member) and k = top-k
capacity.

The per-interaction SANTA recurrence (reference util.py:509-574) for an edge
(s, t, τ, e) updates both endpoints symmetrically from the *pre-edge* state:

    new_norm  = norm_s·β + β
    scale_s   = norm_s/new_norm·β          # decay s's own entries
    scale_t   = β/new_norm·(1-α)           # merge t's entries into s
    insert (e, t, τ) with weight scale_t·α   (scale_t when α == 0)
    truncate to top-k by weight;   norm_s ← norm_s·β + β   (t symmetric)

A key observation making this branchless on TPU: at norm_s == 0 the reference
takes a "fresh dict" branch with scale_t = 1-α (util.py:514-519) — but the
general formulas already degenerate to exactly scale_s = 0 (row is empty
anyway) and scale_t = β/β·(1-α) = 1-α, so no control flow is needed.

Entry identity for the dedup-merge is the (eidx, nbr) pair — the reference key
(eidx, nbr, ts) adds the edge timestamp, but ts is a function of eidx so the
pair is a complete key. The merge of two rows is a k×k key-match, a weight
accumulation, and a lexicographic sort over the 2k+1 candidates with the
canonical tie-break (weight desc, eidx asc, nbr asc — the reference's tie
order is arbitrary dict-iteration order, util.py:553-555; a deterministic
rule keeps scan, kernels, and the test oracle bit-identical).

Updates are strictly sequential over edges (state read-before-update per edge,
both endpoints mutated — the ordering is semantically load-bearing), expressed
as a ``lax.scan`` whose carry is the donated state pytree. Extraction (the
model-facing top-k query for src/dst/neg, reference util.py:447-469 and
:503-506) happens *before* the same edge's update, reuses the same gathered
rows, and is emitted as scan outputs.

Because the index evolution depends only on the edge stream — never on model
parameters — whole phases of queries are produced inside the fused training
program (zebra_tpu.train.phase) with no host round trips; the reference
instead interleaves index and model work per batch on the host CPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# field indices in the packed row
_W, _NBR, _EIDX, _TS = 0, 1, 2, 3


class TpprParams(NamedTuple):
    """Static ensemble hyperparameters (one row per member). Held as plain
    tuples so the whole object is hashable and can be a jit static arg —
    (α, β, k) select the compiled index program."""

    alpha: Tuple[float, ...]
    beta: Tuple[float, ...]
    k: int

    @classmethod
    def create(cls, alpha_list, beta_list, k: int) -> "TpprParams":
        return cls(
            alpha=tuple(float(a) for a in alpha_list),
            beta=tuple(float(b) for b in beta_list),
            k=int(k),
        )

    @property
    def alpha_arr(self) -> jnp.ndarray:
        return jnp.asarray(self.alpha, jnp.float32)

    @property
    def beta_arr(self) -> jnp.ndarray:
        return jnp.asarray(self.beta, jnp.float32)


class TpprState(NamedTuple):
    data: jnp.ndarray  # f32 [N, F] flat rows, F = M*(4k+1) (see module docstring)


def row_width(n_tppr: int, k: int) -> int:
    return n_tppr * (4 * k + 1)


def init_tppr_state(n_tppr: int, n_nodes: int, k: int) -> TpprState:
    return TpprState(
        data=jnp.zeros((n_nodes, row_width(n_tppr, k)), jnp.float32)
    )


def _split_rows(rows: jnp.ndarray, m: int, k: int):
    """rows [..., F] → (fields [..., M, 4, k], norm [..., M])."""
    fields = rows[..., : 4 * m * k].reshape(rows.shape[:-1] + (m, 4, k))
    norm = rows[..., 4 * m * k :]
    return fields, norm


def unpack_state(state: TpprState, n_tppr: int, k: int):
    """Test/interop view: (nbr i32 [M,N,k], eidx i32, ts f32, w f32,
    norm f32 [M,N])."""
    d = np.asarray(state.data)
    n = d.shape[0]
    fields = d[:, : 4 * n_tppr * k].reshape(n, n_tppr, 4, k)
    norm = d[:, 4 * n_tppr * k :]
    w = fields[:, :, _W].transpose(1, 0, 2)
    nbr = fields[:, :, _NBR].transpose(1, 0, 2).astype(np.int32)
    eidx = fields[:, :, _EIDX].transpose(1, 0, 2).astype(np.int32)
    ts = fields[:, :, _TS].transpose(1, 0, 2)
    return nbr, eidx, ts, w, norm.transpose(1, 0)


class TpprQueries(NamedTuple):
    """Extraction results, model-facing (reference streaming_topk outputs).

    Leading axes vary by producer: per-edge scans emit [E, M, 3, k]; batch
    reshaping yields [M, 3b, k] in the reference's src‖dst‖neg row layout.
    Empty slots hold nbr 0 / eidx 0 / weight 0 and dt equal to the query
    timestamp (the reference subtracts a zero-filled entry timestamp,
    util.py:465)."""

    nbr: jnp.ndarray   # i32
    eidx: jnp.ndarray  # i32
    dt: jnp.ndarray    # f32
    w: jnp.ndarray     # f32


def _i32(x):
    """f32-held id → int32 (exact for ids < 2^24)."""
    return x.astype(jnp.int32)


def _merge_both(fields3, norm_sd, src, dst, e_idx, e_ts, params: TpprParams):
    """Both SANTA update directions fused into one [2M, ·]-batched merge:
    lane 0 produces src's new row from (src ← dst), lane 1 dst's from
    (dst ← src). Mirrors reference util.py:509-564 with the branchless scale
    formulas (see module docstring); one sort call covers both lanes.

    fields3 [3, M, 4, k] (src, dst, neg gathered rows), norm_sd [2, M].
    Returns (new fields [2, M, 4, k], new norms [2, M])."""
    alpha, beta, k = params.alpha_arr, params.beta_arr, params.k
    m = alpha.shape[0]
    alpha2 = jnp.tile(alpha, 2)                            # [2M]
    beta2 = jnp.tile(beta, 2)

    def lanes(field):
        # s1 rows for both directions: (src, dst); s2 rows: (dst, src)
        s1 = fields3[:2, :, field].reshape(2 * m, -1)      # [2M, k]
        s2 = fields3[jnp.asarray([1, 0]), :, field].reshape(2 * m, -1)
        return s1, s2

    w1r, w2r = lanes(_W)
    n1, n2 = lanes(_NBR)
    e1, e2 = lanes(_EIDX)
    t1, t2 = lanes(_TS)
    norm1 = norm_sd.reshape(2 * m)

    new_norm = norm1 * beta2 + beta2                       # [2M]
    scale_s1 = norm1 / new_norm * beta2                    # → 0 when norm1 == 0
    scale_s2 = beta2 / new_norm * (1.0 - alpha2)           # → 1-α when norm1 == 0

    w1 = w1r * scale_s1[:, None]
    w2 = w2r * scale_s2[:, None]
    valid1 = w1r > 0
    valid2 = w2r > 0

    # dedup: an s2 entry matching an s1 entry on (eidx, nbr) folds its weight
    # into the s1 entry (reference util.py:534-538). Keys are unique within a
    # row, so each entry has at most one match.
    match = (
        (e1[:, :, None] == e2[:, None, :])
        & (n1[:, :, None] == n2[:, None, :])
        & valid1[:, :, None]
        & valid2[:, None, :]
    )                                                      # [2M, k, k]
    w1 = w1 + jnp.sum(jnp.where(match, w2[:, None, :], 0.0), axis=2)
    dup2 = jnp.any(match, axis=1)
    w2 = jnp.where(valid2 & ~dup2, w2, 0.0)

    # fresh entry (e_idx, s2_node, e_ts) — e_idx is new to the stream, so it
    # cannot collide with any existing key (reference util.py:531, 540-541).
    new_w = jnp.where(alpha2 != 0.0, scale_s2 * alpha2, scale_s2)[:, None]
    new_node = jnp.repeat(
        jnp.stack([dst, src]).astype(jnp.float32), m
    )[:, None]                                             # [2M, 1]

    e_idx_f = e_idx.astype(jnp.float32)
    cand_w = jnp.concatenate([w1, w2, new_w], axis=1)      # [2M, 2k+1]
    cand_nbr = jnp.concatenate([n1, n2, new_node], axis=1)
    cand_eidx = jnp.concatenate(
        [e1, e2, jnp.full((2 * m, 1), e_idx_f)], axis=1
    )
    cand_ts = jnp.concatenate(
        [t1, t2, jnp.full((2 * m, 1), jnp.float32(0) + e_ts)], axis=1
    )

    # canonical top-k (weight desc, eidx asc, nbr asc); id fields are exact
    # f32 values so float key comparison orders like the integers
    neg_w, s_eidx, s_nbr, s_ts = jax.lax.sort(
        (-cand_w, cand_eidx, cand_nbr, cand_ts), num_keys=3
    )
    top_w = -neg_w[:, :k]
    live = top_w > 0
    z = jnp.float32(0)
    new_fields = jnp.stack(
        [
            jnp.where(live, top_w, z),
            jnp.where(live, s_nbr[:, :k], z),
            jnp.where(live, s_eidx[:, :k], z),
            jnp.where(live, s_ts[:, :k], z),
        ],
        axis=1,
    )                                                      # [2M, 4, k]
    return new_fields.reshape(2, m, 4, k), new_norm.reshape(2, m)


def edge_step(
    state: TpprState, src, dst, neg, e_ts, e_idx, valid, params: TpprParams
) -> Tuple[TpprState, jnp.ndarray]:
    """Extraction for (src, dst, neg) at the edge time from the pre-edge
    state, then the SANTA update of both endpoints — one contiguous row
    gather and one row scatter, fields and norms together.

    The extraction output is the raw flat rows [3, F]; callers unpack to
    TpprQueries *outside* the sequential scan (``unpack_queries``) so the
    loop body stays minimal.

    Both update directions read the pre-edge state (the reference computes
    new_s1/new_s2 from old dicts and writes both afterwards, util.py:509-574).
    For a self-loop (src == dst) the two computed rows coincide, so the
    duplicate scatter is idempotent and the norm writes produce the same
    value — matching the reference's single-pair branch (util.py:501,
    572-574). Padding edges (valid == False) leave the state untouched."""
    m, k = len(params.alpha), params.k
    sdn = jnp.stack([src, dst, neg])
    rows3 = state.data[sdn]                        # [3, F]
    fields3, norm3 = _split_rows(rows3, m, k)

    new_fields, new_norm = _merge_both(
        fields3, norm3[:2], src, dst, e_idx, e_ts, params
    )
    new_rows = jnp.concatenate(
        [new_fields.reshape(2, 4 * m * k), new_norm], axis=1
    )                                              # [2, F]
    new_rows = jnp.where(valid, new_rows, rows3[:2])

    state = TpprState(data=state.data.at[sdn[:2]].set(new_rows))
    return state, rows3


def unpack_queries(
    rows3: jnp.ndarray, e_ts: jnp.ndarray, n_tppr: int, k: int
) -> TpprQueries:
    """Vectorized post-scan unpack: raw flat rows [E, 3, F] + edge times [E]
    → TpprQueries fields [E, M, 3, k]."""
    fields, _ = _split_rows(rows3, n_tppr, k)      # [E, 3, M, 4, k]
    perm = (0, 2, 1, 3)
    return TpprQueries(
        nbr=_i32(fields[:, :, :, _NBR]).transpose(perm),
        eidx=_i32(fields[:, :, :, _EIDX]).transpose(perm),
        dt=(e_ts[:, None, None, None] - fields[:, :, :, _TS]).transpose(perm),
        w=fields[:, :, :, _W].transpose(perm),
    )


@functools.partial(jax.jit, static_argnames=("params",), donate_argnames=("state",))
def streaming_scan(
    state: TpprState,
    params: TpprParams,
    src: jnp.ndarray,    # i32 [E]
    dst: jnp.ndarray,    # i32 [E]
    neg: jnp.ndarray,    # i32 [E]
    e_ts: jnp.ndarray,   # f32 [E]
    e_idx: jnp.ndarray,  # i32 [E]
    valid: jnp.ndarray,  # bool [E]
) -> Tuple[TpprState, TpprQueries]:
    """Scan a chunk of the edge stream (reference streaming_topk,
    util.py:473-576). Returns the post-chunk state and queries with fields
    [E, M, 3, k]."""

    def step(carry: TpprState, edge):
        s, d, n, t, e, v = edge
        return edge_step(carry, s, d, n, t, e, v, params)

    state, rows = jax.lax.scan(step, state, (src, dst, neg, e_ts, e_idx, valid))
    return state, unpack_queries(rows, e_ts, len(params.alpha), params.k)


@functools.partial(jax.jit, static_argnames=("n_tppr", "k"))
def read_topk(
    state: TpprState,
    nodes3: jnp.ndarray,  # i32 [B, 3] query nodes (src, dst, neg columns)
    t_q: jnp.ndarray,     # f32 [B] query times
    n_tppr: int,
    k: int,
) -> TpprQueries:
    """Read-only extraction: the *current* top-k of each query node at the
    query time (reference extract_streaming_tppr, util.py:447-469), with no
    state mutation and no scan — one O(B) row gather. This is the serving
    fast path (scoring candidates must not advance the index)."""
    rows = state.data[nodes3]  # [B, 3, F]
    return unpack_queries(rows, t_q, n_tppr, k)


@functools.partial(jax.jit, static_argnames=("params",), donate_argnames=("state",))
def fill_scan(
    state: TpprState,
    params: TpprParams,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    e_ts: jnp.ndarray,
    e_idx: jnp.ndarray,
    valid: jnp.ndarray,
) -> TpprState:
    """Replay a stream into the state without extraction (reference
    compute_val_tppr, util.py:787-873)."""

    def step(carry: TpprState, edge):
        s, d, t, e, v = edge
        carry, _ = edge_step(carry, s, d, s, t, e, v, params)
        return carry, None

    state, _ = jax.lax.scan(step, state, (src, dst, e_ts, e_idx, valid))
    return state


def run_stream(
    state: TpprState,
    params: TpprParams,
    src,
    dst,
    neg,
    e_ts,
    e_idx,
    chunk: int = 4096,
) -> Tuple[TpprState, TpprQueries]:
    """Host-side convenience: run ``streaming_scan`` over a whole stream in
    fixed-size chunks (one compile), concatenating query outputs on host.

    Intended for tests and small runs; training drives the index inside the
    fused phase program instead."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    neg = np.asarray(neg, np.int32)
    e_ts = np.asarray(e_ts, np.float32)
    e_idx = np.asarray(e_idx, np.int32)
    n = len(src)
    outs = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pad = chunk - (hi - lo)
        sl = lambda a, fill=0: np.concatenate([a[lo:hi], np.full(pad, fill, a.dtype)])
        valid = np.concatenate([np.ones(hi - lo, bool), np.zeros(pad, bool)])
        state, q = streaming_scan(
            state, params, sl(src), sl(dst), sl(neg), sl(e_ts), sl(e_idx), valid
        )
        outs.append(jax.tree.map(lambda x: np.asarray(x[: hi - lo]), q))
    queries = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)
    return state, queries
