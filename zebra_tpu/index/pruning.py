"""Pruning-strategy T-PPR query: bounded temporal BFS, stateless.

TPU-native re-design of the reference's ``get_pruned_topk`` (reference
utils/util.py:185-276): per query node, walk ``depth`` levels of the
``width`` most-recent temporal neighbors, with walk weight

    w_child = w_parent · (1-α) · β / norm · β^z,
    norm    = β/(1-β) · (1-β^{n_ngh})          (n_ngh = all earlier interactions)

where z indexes siblings newest-first, with an extra ·α at depth 0 when α ≠ 0
(reference util.py:208-209, 232); candidates reached by several walks
accumulate; final answer is the top-k by weight.

The device formulation exploits that the traversal *structure* (which
entries are visited) is independent of (α, β) — only weights differ — so the
BFS is walked once with static [width^d] frontiers and weights are carried
with a leading ensemble axis M. Dedup is an O(C²) key-match matrix over the
C = Σ width^d candidates per root (C is ~10²; a match matrix beats
sort-based dedup at this size on the VPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zebra_tpu.index.neighbor_finder import NeighborIndex, most_recent_neighbors
from zebra_tpu.index.streaming import TpprQueries

# candidate-count threshold where dedup switches from the O(C²) key-match
# matrix to the O(C log C) sort + segment-sum (see pruned_topk_impl)
_MATCH_MATRIX_MAX_C = 256


def _dedup_sorted(eidx, nbr, ts, w, valid):
    """Sort-based duplicate folding: candidates sharing (eidx, nbr) collapse
    into the run's first element, whose weight becomes the run total.

    eidx/nbr/ts/valid: [Q, C]; w: [M, Q, C]. Returns the *key-sorted*
    (eidx, nbr, ts, dedup_w) with invalid entries keyed to a sentinel and
    zero weight (they never survive the live mask downstream)."""
    q, c = eidx.shape
    big = jnp.int32(2**30)
    e_key = jnp.where(valid, eidx, big)
    n_key = jnp.where(valid, nbr, big)
    order = jnp.lexsort((n_key, e_key), axis=-1)            # [Q, C]

    take = jnp.take_along_axis
    e_s = take(e_key, order, 1)
    n_s = take(n_key, order, 1)
    ts_s = take(ts, order, 1)
    w_s = take(jnp.where(valid[None], w, 0.0), order[None], 2)  # [M, Q, C]

    newrun = jnp.concatenate(
        [
            jnp.ones((q, 1), bool),
            (e_s[:, 1:] != e_s[:, :-1]) | (n_s[:, 1:] != n_s[:, :-1]),
        ],
        axis=1,
    )
    seg = jnp.cumsum(newrun, axis=1) - 1                    # [Q, C] run ids

    def fold(w_mc, seg_c, first_c):
        tot = jax.ops.segment_sum(w_mc.T, seg_c, num_segments=c)  # [C, M]
        return jnp.where(first_c[:, None], tot[seg_c], 0.0).T     # [M, C]

    dedup_w = jax.vmap(fold, in_axes=(1, 0, 0), out_axes=1)(w_s, seg, newrun)
    return e_s, n_s, ts_s, dedup_w


def pruned_topk_impl(
    index: NeighborIndex,
    alpha: jnp.ndarray,    # f32 [M]
    beta: jnp.ndarray,     # f32 [M]
    nodes: jnp.ndarray,    # i32 [Q] query nodes
    t_q: jnp.ndarray,      # f32 [Q] query times
    width: int,
    depth: int,
    k: int,
) -> TpprQueries:
    """Top-k T-PPR estimates for each (node, t) query. Fields [M, Q, k].
    Trace-level core, composable inside larger jitted programs."""
    m = alpha.shape[0]
    q = nodes.shape[0]
    one_m_alpha = (1.0 - alpha)[:, None]                   # [M, 1]

    # frontier: shared structure [Q, F], per-member weights [M, Q, F]
    f_node = nodes[:, None]                                # [Q, 1]
    f_ts = t_q[:, None]
    f_valid = jnp.ones((q, 1), bool)
    f_w = jnp.ones((m, q, 1), jnp.float32)

    cand_nbr, cand_eidx, cand_ts, cand_w, cand_valid = [], [], [], [], []

    for dep in range(depth):
        f = f_node.shape[1]
        flat_node = f_node.reshape(-1)
        flat_ts = f_ts.reshape(-1)
        nb, ei, nts, nvalid, n_before = most_recent_neighbors(
            index, flat_node, flat_ts, width
        )                                                   # [Q*F, width], n_before [Q*F]

        n_before = n_before.reshape(q, f).astype(jnp.float32)
        # norm of the geometric sibling weights over ALL earlier neighbors
        # (not clipped to width) — reference util.py:208
        beta_b = beta[:, None, None]                        # [M,1,1]
        norm = beta_b / (1.0 - beta_b) * (1.0 - jnp.power(beta_b, n_before[None]))
        base = f_w * one_m_alpha[:, :, None] * beta[:, None, None] / jnp.where(
            norm > 0, norm, 1.0
        )                                                   # [M, Q, F]
        if dep == 0:
            # extra ·α at the first hop when α ≠ 0 (reference util.py:209)
            base = jnp.where(alpha[:, None, None] != 0, base * alpha[:, None, None], base)

        sib = jnp.power(beta[:, None, None, None],
                        jnp.arange(width, dtype=jnp.float32)[None, None, None, :])
        child_w = base[..., None] * sib                     # [M, Q, F, width]

        nb = nb.reshape(q, f * width)
        ei = ei.reshape(q, f * width)
        nts = nts.reshape(q, f * width)
        nvalid = nvalid.reshape(q, f * width) & jnp.repeat(f_valid, width, axis=1)
        child_w = child_w.reshape(m, q, f * width)

        cand_nbr.append(nb)
        cand_eidx.append(ei)
        cand_ts.append(nts)
        cand_w.append(child_w)
        cand_valid.append(nvalid)

        f_node, f_ts, f_valid, f_w = nb, nts, nvalid, child_w

    nbr = jnp.concatenate(cand_nbr, axis=1)                 # [Q, C]
    eidx = jnp.concatenate(cand_eidx, axis=1)
    ts = jnp.concatenate(cand_ts, axis=1)
    w = jnp.concatenate(cand_w, axis=2)                     # [M, Q, C]
    valid = jnp.concatenate(cand_valid, axis=1)             # [Q, C]

    # dedup on (eidx, nbr): fold weights into one representative entry.
    # Two formulations with identical results: an O(C²) key-match matrix
    # (wins on the VPU at the reference-default C ≈ 110) and an O(C log C)
    # sort + segment-sum (necessary at depth ≥ 3 where C = Σ width^d makes
    # the [Q, C, C] matrix blow past HBM — e.g. ~2 GB of bool at
    # width 10 / depth 3 over a 3·bs query block).
    c = nbr.shape[1]
    if c <= _MATCH_MATRIX_MAX_C:
        eq = (
            (eidx[:, :, None] == eidx[:, None, :])
            & (nbr[:, :, None] == nbr[:, None, :])
            & valid[:, :, None]
            & valid[:, None, :]
        )                                                   # [Q, C, C]
        tri = jnp.tril(jnp.ones((c, c), bool), k=-1)        # j < i
        first = valid & ~jnp.any(eq & tri[None], axis=2)    # [Q, C]
        total_w = jnp.einsum("qic,mqc->mqi", eq.astype(w.dtype), w)
        dedup_w = jnp.where(first[None], total_w, 0.0)      # [M, Q, C]
    else:
        eidx, nbr, ts, dedup_w = _dedup_sorted(eidx, nbr, ts, w, valid)

    # top-k with the same canonical tie-break as the streaming index
    # (weight desc, eidx asc, nbr asc)
    def bcast(x):
        return jnp.broadcast_to(x[None], (m,) + x.shape)

    neg_w, s_eidx, s_nbr, s_ts = jax.lax.sort(
        (-dedup_w, bcast(eidx), bcast(nbr), bcast(ts)), num_keys=3
    )
    top_w = -neg_w[..., :k]
    live = top_w > 0

    return TpprQueries(
        nbr=jnp.where(live, s_nbr[..., :k], 0),
        eidx=jnp.where(live, s_eidx[..., :k], 0),
        dt=t_q[None, :, None] - jnp.where(live, s_ts[..., :k], 0.0),
        w=jnp.where(live, top_w, 0.0),
    )


pruned_topk = jax.jit(
    pruned_topk_impl, static_argnames=("width", "depth", "k")
)
