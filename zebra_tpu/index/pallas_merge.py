"""Pallas TPU kernel for the wave-parallel SANTA merge.

The wave step's cost is dominated not by HBM traffic (the batched row
gather/scatter floor is ~15µs/wave) but by the ~170µs of small VPU ops the
XLA merge graph issues per wave — scales, the k×k dedup match, and the
canonical top-k. This kernel fuses the whole merge for all B = 2·M·W
directions of a wave into one Pallas program.

Top-k with the canonical order (weight desc, eidx asc, nbr asc) is computed
by k rounds of vectorized lexicographic argmax over the 2k+1 candidates —
each round is a handful of [B, 2k+1] VPU ops and emits one output column;
selected candidates are retired with a -1 weight. Ties can only occur among
retired/padding candidates whose field sums are zero, so the one-hot
extraction stays exact. The arithmetic replicates the XLA merge op-for-op,
so results are bit-identical (tested) and the kernel can be toggled freely.

The kernel consumes pre-sliced per-field arrays (s1/s2 weight, eidx, nbr,
ts as [B, k]) rather than packed rows: slicing/packing stays in XLA where
layout changes are free, and the kernel keeps a clean [B, lanes] shape."""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zebra_tpu.index.streaming import TpprParams

_BIG = 3.0e38

# top-k selection variant: "argmax" (k sequential lexicographic-argmax
# rounds) or "rank" (one parallel comparison matrix). Results agree to an
# ulp (tested); the env var exists for on-hardware A/Bs.
_DEFAULT_TOPK_IMPL = os.environ.get("ZEBRA_PALLAS_TOPK", "argmax")


def _merge_kernel(k, topk_impl,
                  s1w_ref, s1e_ref, s1n_ref, s1t_ref,
                  s2w_ref, s2e_ref, s2n_ref, s2t_ref,
                  norm1_ref, newnode_ref, eidxf_ref, ts_ref,
                  alpha2_ref, beta2_ref,
                  ow_ref, oe_ref, on_ref, ot_ref, onorm_ref):
    s1w, s1e, s1n, s1t = s1w_ref[:], s1e_ref[:], s1n_ref[:], s1t_ref[:]
    s2w, s2e, s2n, s2t = s2w_ref[:], s2e_ref[:], s2n_ref[:], s2t_ref[:]
    norm1 = norm1_ref[:]          # [B, 1]
    new_node = newnode_ref[:]     # [B, 1]
    eidx_f = eidxf_ref[:]         # [B, 1]
    e_ts = ts_ref[:]              # [B, 1]
    alpha2 = alpha2_ref[:]        # [B, 1]
    beta2 = beta2_ref[:]          # [B, 1]

    new_norm = norm1 * beta2 + beta2
    scale1 = norm1 / new_norm * beta2
    scale2 = beta2 / new_norm * (1.0 - alpha2)

    w1 = s1w * scale1
    w2 = s2w * scale2
    valid2 = s2w > 0

    # dedup on (eidx, nbr): fold each matching s2 entry into its s1 twin.
    # All dim-inserts happen on f32 operands (Mosaic cannot relayout 1-bit
    # vectors into new minor dims); comparisons run on the broadcast values.
    match = (
        (s1e[:, :, None] == s2e[:, None, :])
        & (s1n[:, :, None] == s2n[:, None, :])
        & (s1w[:, :, None] > 0)
        & (s2w[:, None, :] > 0)
    )                                                   # [B, k, k]
    w1 = w1 + jnp.sum(jnp.where(match, w2[:, None, :], 0.0), axis=2)
    dup2 = jnp.any(match, axis=1)
    w2 = jnp.where(valid2 & ~dup2, w2, 0.0)

    new_w = jnp.where(alpha2 != 0.0, scale2 * alpha2, scale2)  # [B, 1]

    cw = jnp.concatenate([w1, w2, new_w], axis=1)       # [B, 2k+1]
    ce = jnp.concatenate([s1e, s2e, eidx_f], axis=1)
    cn = jnp.concatenate([s1n, s2n, new_node], axis=1)
    ct = jnp.concatenate([s1t, s2t, e_ts], axis=1)

    if topk_impl == "rank":
        # canonical top-k by direct rank counting: one parallel [B, C, C]
        # lexicographic comparison instead of k sequential argmax rounds
        # (shorter VPU dependency chain; more raw lanes). Exact ties share a
        # rank and collide into one output column — only all-zero padding
        # candidates can tie (positive candidates have unique (eidx, nbr)
        # after the dedup fold), and those columns zero out under the live
        # mask either way, so the result is bit-identical to the argmax
        # rounds (tested).
        wj, wi = cw[:, :, None], cw[:, None, :]
        ej, ei = ce[:, :, None], ce[:, None, :]
        nj, ni = cn[:, :, None], cn[:, None, :]
        beats = (wj > wi) | (
            (wj == wi) & ((ej < ei) | ((ej == ei) & (nj < ni)))
        )                                               # [B, C, C]
        rank = jnp.sum(beats.astype(jnp.float32), axis=1)  # [B, C]
        # iota must be generated integral: Mosaic rejects 'tpu.iota' with a
        # float result type (verified on a v5e backend); convert after.
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2).astype(
            jnp.float32
        )
        sel = (rank[:, :, None] == cols).astype(jnp.float32)  # [B, C, k]
        pick = lambda x: jnp.sum(x[:, :, None] * sel, axis=1)
        ow, oe, on, ot = pick(cw), pick(ce), pick(cn), pick(ct)
    else:
        # canonical top-k by k rounds of lexicographic argmax
        ow_cols, oe_cols, on_cols, ot_cols = [], [], [], []
        for _ in range(k):
            max_w = jnp.max(cw, axis=1, keepdims=True)
            m1 = cw == max_w
            min_e = jnp.min(jnp.where(m1, ce, _BIG), axis=1, keepdims=True)
            m2 = m1 & (ce == min_e)
            min_n = jnp.min(jnp.where(m2, cn, _BIG), axis=1, keepdims=True)
            win = m2 & (cn == min_n)
            pick = lambda x: jnp.sum(
                jnp.where(win, x, 0.0), axis=1, keepdims=True
            )
            ow_cols.append(pick(cw))
            oe_cols.append(pick(ce))
            on_cols.append(pick(cn))
            ot_cols.append(pick(ct))
            cw = jnp.where(win, -1.0, cw)

        ow = jnp.concatenate(ow_cols, axis=1)           # [B, k]
        oe = jnp.concatenate(oe_cols, axis=1)
        on = jnp.concatenate(on_cols, axis=1)
        ot = jnp.concatenate(ot_cols, axis=1)
    live = ow > 0
    z = jnp.float32(0)
    ow_ref[:] = jnp.where(live, ow, z)
    oe_ref[:] = jnp.where(live, oe, z)
    on_ref[:] = jnp.where(live, on, z)
    ot_ref[:] = jnp.where(live, ot, z)
    onorm_ref[:] = new_norm


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "topk_impl", "block_b")
)
def merge_both_pallas(
    fields3: jnp.ndarray,   # f32 [W, 3, M, 4, k] gathered rows (src,dst,neg)
    norm_sd: jnp.ndarray,   # f32 [W, 2, M]
    src: jnp.ndarray,       # i32 [W]
    dst: jnp.ndarray,       # i32 [W]
    e_idx: jnp.ndarray,     # i32 [W]
    e_ts: jnp.ndarray,      # f32 [W]
    params: TpprParams,
    interpret: bool = False,
    topk_impl: str = None,  # "argmax" | "rank"; None → module default
    block_b: int = 0,       # 0 = whole batch in one block; >0 = grid the
                            # lane axis into blocks of ≤block_b rows (rounded
                            # down to a divisor of B). Large k at full wave
                            # cap crashes the v5e compiler in one block
                            # (B=256, k=40 measured); ≤128-row blocks
                            # compile — block choice is probed per config
                            # (resolve_pallas_block); blocks touch disjoint
                            # rows, so results agree to float rounding
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in batched replacement for vmap(_merge_both): returns
    (new fields [W, 2, M, 4, k], new norms [W, 2, M])."""
    from zebra_tpu.index.streaming import _W, _NBR, _EIDX, _TS

    if topk_impl is None:
        topk_impl = _DEFAULT_TOPK_IMPL
    if topk_impl not in ("argmax", "rank"):
        raise ValueError(
            f"topk_impl must be 'argmax' or 'rank', got {topk_impl!r} "
            "(check ZEBRA_PALLAS_TOPK)"
        )
    m, k = len(params.alpha), params.k
    w = fields3.shape[0]
    b = 2 * m * w

    # lane layout: lane = w·2M + dir·M + member. Note: index the field axis
    # FIRST — mixing the [1,0] array index with the scalar field index in one
    # subscript would trigger numpy's advanced-indexing front-promotion and
    # scramble the lane order.
    def lanes(field):
        f = fields3[:, :, :, field]                      # [W, 3, M, k]
        s1 = f[:, :2].reshape(b, k)
        s2 = f[:, jnp.asarray([1, 0])].reshape(b, k)
        return s1, s2

    s1w, s2w = lanes(_W)
    s1n, s2n = lanes(_NBR)
    s1e, s2e = lanes(_EIDX)
    s1t, s2t = lanes(_TS)
    norm1 = norm_sd.reshape(b, 1)

    alpha2 = jnp.tile(jnp.asarray(params.alpha, jnp.float32), 2 * w)[:, None]
    beta2 = jnp.tile(jnp.asarray(params.beta, jnp.float32), 2 * w)[:, None]
    new_node = jnp.repeat(
        jnp.stack([dst, src], axis=1).astype(jnp.float32).reshape(-1), m
    )[:, None]
    eidx_f = jnp.repeat(e_idx.astype(jnp.float32), 2 * m)[:, None]
    ts2 = jnp.repeat(e_ts, 2 * m)[:, None]

    out_shape = [jax.ShapeDtypeStruct((b, k), jnp.float32)] * 4 + [
        jax.ShapeDtypeStruct((b, 1), jnp.float32)
    ]
    kernel = functools.partial(_merge_kernel, k, topk_impl)
    if block_b and block_b < b:
        bb = block_b
        while b % bb:     # largest divisor of B not above the request
            bb -= 1
        spec = lambda cols: pl.BlockSpec((bb, cols), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)
        grid_kw = dict(
            grid=(b // bb,),
            in_specs=[spec(k)] * 8 + [spec(1)] * 6,
            out_specs=[spec(k)] * 4 + [spec(1)],
        )
    else:
        grid_kw = dict(
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        )
    ow, oe, on, ot, onorm = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        interpret=interpret,
        **grid_kw,
    )(s1w, s1e, s1n, s1t, s2w, s2e, s2n, s2t, norm1, new_node, eidx_f, ts2,
      alpha2, beta2)

    new_fields = jnp.stack([ow, on, oe, ot], axis=1)    # [B, 4, k] (w,nbr,eidx,ts)
    new_fields = new_fields.reshape(w, 2, m, 4, k)
    new_norm = onorm.reshape(w, 2, m)
    return new_fields, new_norm


@functools.lru_cache(maxsize=None)
def resolve_pallas_block(params: TpprParams, w: int):
    """The lane-block size the backend compiler accepts for (α, β, k) at
    wave width ``w``: 0 (whole batch, the fast default), a bounded block
    (128/64 — grids the kernel over disjoint row blocks, bit-invariant), or
    None when nothing compiles (the caller falls back to the bit-identical
    XLA merge).

    The kernel is correct at any size in interpret mode (tested), but real
    backends can reject large single-block configurations — measured on a
    v5e: M=2, k=40 at the default cap 64 (B=256 lanes) crashes the TPU
    compiler subprocess, while the same k at B≤128 compiles — so the probe
    runs at the production wave width and walks down block sizes. A few
    seconds once per config, persistent-cache hits afterwards."""
    m, k = len(params.alpha), params.k
    f3 = jnp.zeros((w, 3, m, 4, k), jnp.float32)
    nsd = jnp.zeros((w, 2, m), jnp.float32)
    one = jnp.ones((w,), jnp.int32)
    ts = jnp.ones((w,), jnp.float32)
    for block in (0, 128, 64):
        if block and block >= 2 * m * w:
            continue  # same program as an already-failed larger block
        try:
            out = merge_both_pallas(
                f3, nsd, one, one * 2, one, ts, params, block_b=block
            )
            jax.block_until_ready(out)
            return block
        except (ValueError, TypeError):
            # trace-time configuration errors (e.g. a bad ZEBRA_PALLAS_TOPK)
            # must stay loud — only backend compile/runtime failures mean
            # "this block size doesn't work here"
            raise
        except Exception:
            continue
    return None
