"""Wave-parallel streaming T-PPR scan.

The SANTA recurrence is sequential per *node*, not per edge: an edge only
depends on earlier edges touching its src/dst (state writes) or its neg
(extraction read). The host-side scheduler (``zebra_tpu.native.ingest
.wave_schedule``, C++) partitions a stream into dependency-respecting waves
of pairwise node-disjoint edges; the device then scans over *waves*, each
step processing up to ``cap`` edges as one batched gather → merge → scatter.
Within a wave all reads precede all writes, and every read-after-write /
write-after-write pair crosses a wave boundary, so the result is bit-exact
with the sequential edge scan (tested) — while the per-step VPU work is
``cap``-way batched, amortizing the small-op overhead that dominates the
sequential scan (~6× on one chip).

On streams with realistic activity skew (hottest node ~1% of events) wave
occupancy is near capacity; the wave count is bounded below by the hottest
node's degree (its updates can never parallelize).

Host↔device traffic is one int32 slot index per edge: the schedule is
communicated as ``flat[i] = wave·cap + lane``, and the device program
scatters the (already resident) stream into wave layout, scans, and gathers
the emitted rows back to stream order — all inside a single jit, because on
tunneled TPU deployments each host dispatch costs tens of milliseconds."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.index.streaming import (
    TpprParams,
    TpprState,
    _merge_both,
    _split_rows,
)
from zebra_tpu.utils.xla_options import resolve_compiler_options


def wave_flat_index(
    src, dst, neg, n_nodes: int, cap: int = 64, wave_bucket: int = 256,
    n_shards: int = 1,
) -> Tuple[np.ndarray, int]:
    """Host scheduling: returns (flat slot per edge [E] i32, n_waves).
    ``n_waves`` rounds up to a multiple of ``wave_bucket`` so only a few
    distinct shapes ever compile. ``neg`` is [E] or [S, E] (seed-parallel:
    one shared schedule honoring every seed's extraction reads).
    ``n_shards > 1`` selects owner-aligned lane blocks (see
    zebra_tpu.native.ingest.wave_schedule)."""
    from zebra_tpu.native.ingest import wave_schedule

    wave, slot, n_waves = wave_schedule(src, dst, neg, n_nodes, cap, n_shards)
    n_waves = max(wave_bucket, -(-n_waves // wave_bucket) * wave_bucket)
    flat = wave.astype(np.int32) * cap + slot
    return flat, int(n_waves)


def _wave_step(state: TpprState, src, dst, neg, t, eidx, valid,
               params: TpprParams,
               use_pallas: bool = False,
               pallas_block: int = 0) -> Tuple[TpprState, jnp.ndarray]:
    """One wave: batched extraction + SANTA update for up to W disjoint
    edges. Returns raw packed rows [W, 2+S, 3 for S=1] (pre-update,
    = extraction); ``neg`` is [W] (one negative per edge) or [W, S]
    (seed-parallel: S per-seed negatives, extraction-only — the SANTA update
    touches src/dst alone, so the S extra blocks are pure row gathers).

    ``use_pallas`` swaps the merge math for the fused Pallas kernel
    (zebra_tpu.index.pallas_merge); results agree to float rounding. The
    kernel reads only the src/dst blocks, so the extra neg blocks pass
    through it untouched."""
    m, k = len(params.alpha), params.k
    w = src.shape[0]
    n = state.data.shape[0]

    negs = neg if neg.ndim == 2 else neg[:, None]       # [W, S]
    sdn = jnp.concatenate(
        [jnp.stack([src, dst], axis=1), negs], axis=1
    )                                                   # [W, 2+S]
    rows = state.data[sdn]                              # [W, 2+S, F]
    fields3, norm3 = _split_rows(rows, m, k)            # [W,2+S,M,4,k], [W,2+S,M]

    if use_pallas:
        from zebra_tpu.index.pallas_merge import merge_both_pallas

        interp = jax.default_backend() != "tpu"
        new_fields, new_norm = merge_both_pallas(
            fields3, norm3[:, :2], src, dst, eidx, t, params, interp,
            block_b=pallas_block,
        )
    else:
        merge = jax.vmap(
            lambda f3, nsd, s, d, e, tt: _merge_both(f3, nsd, s, d, e, tt, params)
        )
        new_fields, new_norm = merge(
            fields3, norm3[:, :2], src, dst, eidx, t
        )                                               # [W,2,M,4,k], [W,2,M]
    new_rows = jnp.concatenate(
        [new_fields.reshape(w, 2, 4 * m * k), new_norm], axis=2
    )                                                   # [W, 2, F]
    new_rows = jnp.where(valid[:, None, None], new_rows, rows[:, :2])

    idx = jnp.where(valid[:, None], sdn[:, :2], n)      # padding → dropped
    state = TpprState(
        data=state.data.at[idx.reshape(-1)].set(
            new_rows.reshape(2 * w, -1), mode="drop"
        )
    )
    return state, rows


def _wave_scan_chunk(
    state: TpprState,
    params: TpprParams,
    src: jnp.ndarray,    # i32 [E] stream chunk (device-resident)
    dst: jnp.ndarray,
    neg: jnp.ndarray,
    t: jnp.ndarray,      # f32 [E]
    eidx: jnp.ndarray,   # i32 [E]
    valid: jnp.ndarray,  # bool [E]
    flat: jnp.ndarray,   # i32 [E] wave·cap + lane per edge (sentinel ≥ total
                         #          for edges excluded from scheduling)
    n_waves: int,
    cap: int,
    use_pallas: bool = False,
    pallas_block: int = 0,   # lane-block grid for the Pallas merge (0 =
                             # whole batch; resolve_pallas_block)
) -> Tuple[TpprState, jnp.ndarray]:
    """Scatter the chunk into wave layout, scan the waves, and gather the
    emitted extraction rows back to stream order. One XLA program.

    Returns (state, packed query rows [E, 2+S, F] — 3 blocks for the plain
    single-negative stream); rows of unscheduled (invalid) edges are zero.
    ``neg`` is [E] or [E, S] (seed-parallel; the schedule must then have been
    built from all S columns, wave_flat_index)."""
    total = n_waves * cap

    def to_waves(x, fill=0):
        return (
            jnp.full((total,), fill, x.dtype)
            .at[flat]
            .set(jnp.where(valid, x, fill), mode="drop")
            .reshape(n_waves, cap)
        )

    w_src = to_waves(src)
    w_dst = to_waves(dst)
    w_neg = (
        jnp.stack([to_waves(neg[:, s]) for s in range(neg.shape[1])], axis=-1)
        if neg.ndim == 2 else to_waves(neg)
    )
    w_t = to_waves(t)
    w_eidx = to_waves(eidx)
    w_valid = (
        jnp.zeros((total,), bool)
        .at[jnp.where(valid, flat, total)]
        .set(True, mode="drop")
        .reshape(n_waves, cap)
    )

    def step(carry, wv):
        s, d, n, tt, e, v = wv
        return _wave_step(carry, s, d, n, tt, e, v, params, use_pallas,
                          pallas_block)

    state, rows = jax.lax.scan(
        step, state, (w_src, w_dst, w_neg, w_t, w_eidx, w_valid), unroll=2
    )

    flat_rows = rows.reshape(total, rows.shape[2], rows.shape[3])
    flat_rows = jnp.concatenate(
        [flat_rows, jnp.zeros((1,) + flat_rows.shape[1:], flat_rows.dtype)]
    )
    take = jnp.where(valid, jnp.minimum(flat, total), total)
    return state, flat_rows[take]


_wave_scan_chunk_jit = None


def wave_scan_chunk(*args, **kwargs):
    """Jitted :func:`_wave_scan_chunk`; compiler options resolved at first
    call (utils/xla_options — backend probing must not happen at import)."""
    global _wave_scan_chunk_jit
    if _wave_scan_chunk_jit is None:
        _wave_scan_chunk_jit = functools.partial(
            jax.jit,
            static_argnames=("params", "n_waves", "cap", "use_pallas",
                             "pallas_block"),
            donate_argnames=("state",),
            compiler_options=resolve_compiler_options(),
        )(_wave_scan_chunk)
    return _wave_scan_chunk_jit(*args, **kwargs)
