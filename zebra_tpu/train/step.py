"""Per-batch building blocks of the training/evaluation step.

These compose into the whole-phase fused program in
``zebra_tpu.train.phase`` (one jitted ``lax.scan`` over all of a stream's
batches — see that module for the dispatch-latency rationale).

Semantics replicated from the reference per-batch protocol
(reference model/tgn_model.py:124-174, SURVEY.md §3.1/§3.3):

TRAIN batch (one-batch message staleness — avoids label leakage):
  1. differentiable forward with *lazy* memory: neighbor/query rows with a
     pending message are passed through the updater cell on the fly, without
     committing (reference memory_updater.py:61-90). Query (src/dst/neg) rows
     are lazily updated only when the node also appears in the selected
     neighbor set — the reference's ``index`` argument
     (embedding_module.py:228-230).
  2. BCE(pos,1)+BCE(neg,0) on the MergeLayer logits; Adam step.
  3. no-grad: commit pending messages of this batch's positives
     (update_memory, memory_updater.py:29-43), clear their flags, then store
     this batch's raw messages — both directions, last-per-sender wins —
     composed from the *post-commit* memory (tgn_model.py:156-168).

EVAL batch (no staleness): no lazy update, raw memory everywhere; store this
batch's messages first (from *pre-commit* memory), then immediately commit
(tgn_model.py:159-172). A one-time flush of all pending messages runs at the
train→eval transition (``flush_pending_messages``; memory_updater.py:46-57).

The lazy update is evaluated per query position instead of per unique node —
the cell is deterministic in (message, memory), so duplicated nodes compute
identical rows and no host-side ``unique`` is needed; it becomes one
MXU-friendly batched cell application over [M·3b·k] rows.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zebra_tpu.config import Config
from zebra_tpu.index.streaming import TpprQueries
from zebra_tpu.models.memory import MemoryState
from zebra_tpu.models.tgn import (
    TgnParams,
    affinity_score,
    cell_apply,
    diffusion_embed,
    diffusion_static_input,
    message_cell_input,
    message_input,
)
from zebra_tpu.models.time_encoding import time_basis, time_encode


class Batch(NamedTuple):
    """One chunk of the stream, batched: leading axes [n_b, b]."""

    src: jnp.ndarray    # i32
    dst: jnp.ndarray    # i32
    neg: jnp.ndarray    # i32
    t: jnp.ndarray      # f32
    eidx: jnp.ndarray   # i32
    valid: jnp.ndarray  # bool


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    ap: jnp.ndarray
    auc: jnp.ndarray
    acc: jnp.ndarray
    # 1.0 where the batch's unique selected-node count overflowed the lazy
    # compaction cap (train diffusion only — the Trainer reruns the epoch
    # per-position; see make_lazy_plan)
    overflow: jnp.ndarray


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.parallel_lr is not None:
        # per-seed lr sweeps (--parallel_lr): the learning rate rides the
        # optimizer STATE (inject_hyperparams), so each vmapped seed lane of
        # the seed-parallel phase reads its own value; numerically identical
        # to optax.adam(lr) for any fixed lr
        return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    return optax.adam(cfg.lr)


def _masked_mean(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


# ------------------------------------------------------------------ forward

def _lazy_rows(cfg: Config, params: TgnParams, mem: MemoryState, ids, enable):
    """Gather memory rows for ``ids`` with the lazy differentiable cell update
    applied where a message is pending (and ``enable`` holds)."""
    rows = mem.memory[ids]
    if enable is None:
        return rows
    msg, flag = message_input(cfg, params, mem, ids, rows)
    upd = cell_apply(cfg, params, msg, rows)
    return jnp.where((flag & enable)[..., None], upd, rows)


class LazyPlan(NamedTuple):
    """Id bookkeeping for the train-forward lazy memory updates, built by
    :func:`make_lazy_plan` OUTSIDE the differentiated step (integer-only, so
    keeping it out of the grad stops the remat pass re-sorting the selected
    ids in the backward). ``uniq`` is None in per-position mode."""

    in_sel: jnp.ndarray             # bool [3b]: query node ∈ selected set
                                    # (gates its lazy update — the
                                    # reference's ``index`` argument,
                                    # embedding_module.py:228-230)
    overflow: jnp.ndarray           # f32 []: 1.0 when the batch's unique
                                    # count exceeded the static cap (rows
                                    # are then WRONG — the Trainer reruns
                                    # the epoch per-position, loop.py)
    uniq: Any = None                # i32 [cap] sorted unique ids, sentinel-
                                    # padded (INT32_MAX past the count)
    gather_ids: Any = None          # i32 [cap] uniq with pad → node 0
    jn: Any = None                  # i32 [M, 3b, k] position → unique slot
    j3: Any = None                  # i32 [3b] query → unique slot
    perm: Any = None                # i32 [S] id-sorted position order
    start_pos: Any = None           # i32 [cap] segment starts in perm order
    end_pos: Any = None             # i32 [cap] segment ends (exclusive)


def lazy_position_count(cfg: Config) -> int:
    """Selected-neighbor positions in one train batch's lazy update — the
    flattened ``q.nbr`` layout [M, 3b, k] consumed by :func:`make_lazy_plan`.
    The Trainer's snapshot gate (loop.py:_lazy_compaction_active) derives its
    overflow-possible decision from the same count; ``make_lazy_plan``
    asserts agreement so a layout change cannot silently desync the two."""
    return cfg.n_tppr * 3 * cfg.bs * cfg.topk


def resolve_lazy_cap(cfg: Config, n_positions: int) -> int:
    """The static unique-row budget: cfg.lazy_unique_cap, with -1 = auto
    (2/5 of the position count — measured p90 unique ≈ 0.32·S on realistic
    skewed streams, and overflow is handled exactly by the Trainer's
    per-position rerun). 0 when dedup wouldn't shrink anything."""
    cap = cfg.lazy_unique_cap
    if cap < 0:
        cap = max(256, (2 * n_positions) // 5)
    if cap >= n_positions:
        return 0
    return cap


def make_lazy_plan(cfg: Config, q, nodes3) -> LazyPlan:
    """Sort + compact the selected-neighbor ids for :func:`_train_lazy_rows`.

    Membership (``in_sel``) is tested by sort + searchsorted over the
    3b·M·k selected ids: a [N] bool scatter + gather costs ~0.4ms/batch
    inside the fused scan (bitpacked pred scatters serialize); the sort
    touches no node-sized table.

    The unique compaction is scatter- and binary-search-free (TPU scatters
    serialize per update, and jnp.searchsorted's scan method measured
    ~2ms/batch at these sizes): ranks come from a cumsum over the sorted
    ids' new-segment mask; the position→slot map is the rank list sorted
    back to position order (an inverse-permutation sort); and segment
    boundaries come from one merged sort (searchsorted method='sort')."""
    ids = q.nbr.reshape(-1)
    s_total = ids.shape[0]
    if s_total != lazy_position_count(cfg):
        # ValueError, not assert: the Trainer's overflow-snapshot gate keys
        # off this count, so the guard must survive `python -O`
        raise ValueError(
            "query layout desynced from lazy_position_count "
            f"({s_total} positions vs {lazy_position_count(cfg)}) — the "
            "Trainer's overflow-snapshot gate keys off that count"
        )
    cap = resolve_lazy_cap(cfg, s_total)
    if not cap:
        # per-position mode needs only membership: key-only sort + binary
        # search (a merged-sort searchsorted here measured ~15% slower
        # end-to-end — the [S+3b] merge sort dwarfs the 3b-query scan)
        flat = jnp.sort(ids)
        j = jnp.searchsorted(flat, nodes3)
        in_sel = flat[jnp.minimum(j, s_total - 1)] == nodes3
        return LazyPlan(in_sel=in_sel, overflow=jnp.zeros(()))

    flat, perm = jax.lax.sort_key_val(
        ids, jnp.arange(s_total, dtype=jnp.int32)
    )

    big = jnp.iinfo(jnp.int32).max
    is_new = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1     # [S], sorted
    n_unique = rank[-1] + 1
    # position → unique slot: undo the id sort on the rank list
    _, jn_flat = jax.lax.sort_key_val(perm, rank)
    jn = jnp.minimum(jn_flat, cap - 1).reshape(q.nbr.shape)
    r = jnp.arange(cap, dtype=jnp.int32)
    end_pos = jnp.searchsorted(rank, r, side="right", method="sort")
    start_pos = jnp.concatenate(
        [jnp.zeros((1,), end_pos.dtype), end_pos[:-1]]
    )                                                   # contiguous segments
    live = r < n_unique
    uniq = jnp.where(
        live, flat[jnp.minimum(start_pos, s_total - 1)], big
    )
    gather_ids = jnp.where(live, uniq, 0)
    j3 = jnp.minimum(
        jnp.searchsorted(uniq, nodes3, method="sort"), cap - 1
    )
    in_sel = uniq[j3] == nodes3
    return LazyPlan(
        in_sel=in_sel,
        overflow=(n_unique > cap).astype(jnp.float32),
        uniq=uniq,
        gather_ids=gather_ids,
        jn=jn,
        j3=j3,
        perm=perm,
        start_pos=start_pos,
        end_pos=end_pos,
    )


@jax.custom_vjp
def _dedup_gather(rows_u, jn, perm, start_pos, end_pos):
    """``rows_u[jn]`` whose backward is a sorted-segment sum (prefix-sum +
    boundary differences over the id-sorted cotangents) instead of the
    default 24k-row scatter-add, which serializes on TPU."""
    return rows_u[jn]


def _dedup_gather_fwd(rows_u, jn, perm, start_pos, end_pos):
    return rows_u[jn], (jn, perm, start_pos, end_pos)


def _dedup_gather_bwd(res, g):
    jn, perm, start_pos, end_pos = res
    d = g.shape[-1]
    g_sorted = g.reshape(-1, d)[perm]                   # [S, d] id-sorted
    c = jnp.cumsum(g_sorted, axis=0)
    cpad = jnp.concatenate([jnp.zeros((1, d), c.dtype), c], axis=0)
    d_rows = cpad[end_pos] - cpad[start_pos]            # [cap, d]
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_rows, f0(jn), f0(perm), f0(start_pos), f0(end_pos)


_dedup_gather.defvjp(_dedup_gather_fwd, _dedup_gather_bwd)


def _train_lazy_rows(cfg: Config, params: TgnParams, mem: MemoryState,
                     nodes3, q, plan: LazyPlan):
    """Lazily-updated memory rows for the train forward: the 3b query rows
    (updated only when the node is in the selected-neighbor set) and the
    [M, 3b, k] selected-neighbor rows (always updated).

    With a compaction plan the updater cell runs once per unique selected
    node instead of once per position (measured ~3x id duplication at the
    defaults: popular nodes recur across the 3b queries and the M ensemble
    members); positions then gather their node's row. The cell is
    deterministic in (message, memory), so compaction is exact up to matmul
    tiling. Overflowed batches (plan.overflow) produce wrong rows here and
    are rerun per-position by the Trainer."""
    if plan.uniq is None:
        src_rows = _lazy_rows(cfg, params, mem, nodes3, plan.in_sel)
        nbr_rows = _lazy_rows(cfg, params, mem, q.nbr,
                              jnp.ones_like(q.w, bool))
        return src_rows, nbr_rows

    cap = plan.uniq.shape[0]
    rows_u = _lazy_rows(cfg, params, mem, plan.gather_ids,
                        jnp.ones((cap,), bool))
    nbr_rows = _dedup_gather(rows_u, plan.jn, plan.perm,
                             plan.start_pos, plan.end_pos)
    src_rows = jnp.where(
        plan.in_sel[:, None], rows_u[plan.j3], mem.memory[nodes3]
    )
    return src_rows, nbr_rows


def _forward(
    cfg: Config,
    params: TgnParams,
    mem: MemoryState,
    edge_feats: jnp.ndarray,     # f32 [E+1, De]
    nodes3: jnp.ndarray,         # i32 [3b] src‖dst‖neg
    times3: jnp.ndarray,         # f32 [3b] query times
    q,                           # TpprQueries [M, 3b, k] (diffusion) or None
    nbr_index,                   # NeighborIndex (recursive towers) or ()
    dropout_rng,
    train: bool,
    plan: LazyPlan = None,       # precomputed make_lazy_plan (train phase
                                 # passes it from outside the grad)
    mem_off=None,                # seed-parallel flat tables (non-diffusion
                                 # towers): lane row offset added at memory
                                 # gathers; adjacency keeps raw ids. The
                                 # diffusion caller pre-offsets nodes3/q.nbr
                                 # instead (there is no raw-id consumer)
) -> jnp.ndarray:
    """Embeddings for the 3b query rows → [3b, H]; dispatches on
    cfg.embedding_module (see zebra_tpu.models.embedding)."""
    em = cfg.embedding_module
    if em == "diffusion":
        if train:
            if plan is None:
                plan = make_lazy_plan(cfg, q, nodes3)
            src_rows, nbr_rows = _train_lazy_rows(
                cfg, params, mem, nodes3, q, plan
            )
        else:
            src_rows = mem.memory[nodes3]
            nbr_rows = mem.memory[q.nbr]
        # the static [edge_feat; time_enc] part stays inside the grad: its
        # backward remat was measured faster than saving it as a primal
        # (the gather + cosine recompute under the matmuls)
        nbr_static = diffusion_static_input(cfg, edge_feats, q.eidx, q.dt)
        return diffusion_embed(
            cfg, params, src_rows, nbr_rows, nbr_static, q.w,
            dropout_rng, train,
        )

    from zebra_tpu.models.embedding import (
        identity_embed,
        recursive_embed,
        time_embed,
    )

    if em in ("graph_attention", "graph_sum"):
        return recursive_embed(
            cfg, params, mem, edge_feats, nbr_index, nodes3, times3, train,
            mem_off=mem_off,
        )
    if em == "time":
        return time_embed(cfg, params, mem, nodes3, times3, train,
                          mem_off=mem_off)
    if em == "identity":
        return identity_embed(cfg, params, mem, nodes3, train,
                              mem_off=mem_off)
    raise ValueError(f"unknown embedding module {em!r}")


def _scores(cfg, params, emb, b):
    """Link logits: score(src‖src vs dst‖neg) → (pos_logit, neg_logit) [b]
    (reference tgn_model.py:185-188)."""
    e_src, e_dst, e_neg = emb[:b], emb[b : 2 * b], emb[2 * b :]
    logits = affinity_score(
        params,
        jnp.concatenate([e_src, e_src], axis=0),
        jnp.concatenate([e_dst, e_neg], axis=0),
        cfg.mxu_dtype,
    )
    return logits[:b], logits[b:]


# ------------------------------------------------------------------ memory protocol

def _commit_pending(cfg, params, mem: MemoryState, positives, valid2):
    """update_memory + clear_messages for the batch's positives (no-grad;
    reference memory_updater.py:29-43, memory.py:59). Duplicate positives
    scatter identical values, so ordering is immaterial."""
    n = mem.memory.shape[0]
    rows = mem.memory[positives]
    msg, flag = message_input(cfg, params, mem, positives, rows)
    flags = flag & valid2
    upd = cell_apply(cfg, params, msg, rows)
    upd = upd.astype(mem.memory.dtype)  # table may store bf16
    idx = jnp.where(valid2, positives, n)  # out-of-bounds → dropped
    # clearing the flag zeroes the whole message row: content is dead while
    # the flag is 0 (every consumer gates on it), and the next store
    # overwrites the row (last) / restarts the accumulator (mean)
    return mem._replace(
        memory=mem.memory.at[idx].set(
            jnp.where(flags[:, None], upd, rows), mode="drop"
        ),
        last_update=mem.last_update.at[idx].set(
            jnp.where(flags, mem.msg_ts[positives], mem.last_update[positives]),
            mode="drop",
        ),
        messages=mem.messages.at[idx].set(0.0, mode="drop"),
        msg_count=mem.msg_count.at[idx].set(0.0, mode="drop"),
    )


def _build_messages(cfg, mem: MemoryState, edge_feats, src, dst, t, eidx,
                    valid, src_emb, dst_emb):
    """This batch's raw-message content in the STORED layout (no flag
    column), both directions, plus the sender/time vectors and the
    last-per-sender winner mask. Shared by :func:`_store_messages` and the
    fused :func:`eval_store_commit`."""
    n = mem.memory.shape[0]
    snd = jnp.concatenate([src, dst])
    rcv = jnp.concatenate([dst, src])
    t2 = jnp.concatenate([t, t])
    e2 = jnp.concatenate([eidx, eidx])
    valid2 = jnp.concatenate([valid, valid])
    pos = jnp.arange(snd.shape[0], dtype=jnp.int32)

    # last-wins: the largest batch position per sender is the winner
    winner = (
        jnp.full((n,), -1, jnp.int32)
        .at[jnp.where(valid2, snd, n)]
        .max(pos, mode="drop")
    )
    keep = valid2 & (winner[snd] == pos)

    if cfg.compact_messages:
        # the sender-memory part is not stored (message_input re-attaches it
        # from the consumer's own hidden-state gather — Config.compact_messages)
        parts = []
    elif cfg.use_source_embedding_in_message:
        parts = [jnp.concatenate([src_emb, dst_emb], axis=0)]
    else:
        parts = [mem.memory[snd]]
    if cfg.use_destination_embedding_in_message:
        rcv_part = jnp.concatenate([dst_emb, src_emb], axis=0)
    else:
        rcv_part = mem.memory[rcv]

    basis = time_basis(cfg.time_dim)
    # out-of-table edge ids (serving ingest of fresh events) read the zero
    # row, not XLA's clamp-to-last (models/tgn.py:diffusion_static_input)
    e_safe = jnp.where(e2 < edge_feats.shape[0], e2, 0)
    msg = jnp.concatenate(
        parts
        + [
            rcv_part,
            edge_feats[e_safe],
            time_encode(t2 - mem.last_update[snd], basis),
        ],
        axis=-1,
    )
    return snd, t2, valid2, keep, msg


def _store_messages(cfg, params, mem: MemoryState, edge_feats, src, dst, t, eidx, valid,
                    src_emb=None, dst_emb=None):
    """Collect this batch's raw messages, both directions, keeping only the
    chronologically last message per sender (reference tgn_model.py:204-226
    with the flip/unique dedup at :206-211), and overwrite the pending slots.

    With cfg.use_source/destination_embedding_in_message the corresponding
    message part is the batch's node *embedding* instead of the memory row
    (reference tgn_model.py:217-218 with the concat layout of :160-164):
    ``src_emb``/``dst_emb`` are the [b, H] embeddings of this batch's
    src/dst query rows, positionally aligned with the events."""
    n = mem.memory.shape[0]
    snd, t2, valid2, keep, msg = _build_messages(
        cfg, mem, edge_feats, src, dst, t, eidx, valid, src_emb, dst_emb
    )
    # append the pending-flag column (models/memory.py layout): 1.0 per
    # stored/accumulated message
    one = jnp.ones((msg.shape[0], 1), msg.dtype)
    msg = jnp.concatenate([msg, one], axis=-1).astype(mem.messages.dtype)
    if cfg.aggregator == "mean":
        # accumulate every message (duplicates sum via scatter-add); msg_ts
        # tracks the newest pending timestamp; the flag column accumulates
        # 1.0 per message and stays nonzero until the row is cleared
        idx_all = jnp.where(valid2, snd, n)
        return mem._replace(
            messages=mem.messages.at[idx_all].add(
                jnp.where(valid2[:, None], msg, jnp.zeros((), msg.dtype)),
                mode="drop",
            ),
            msg_count=mem.msg_count.at[idx_all].add(
                valid2.astype(jnp.float32), mode="drop"
            ),
            msg_ts=mem.msg_ts.at[idx_all].max(t2, mode="drop"),
        )
    idx = jnp.where(keep, snd, n)
    return mem._replace(
        messages=mem.messages.at[idx].set(msg, mode="drop"),
        msg_ts=mem.msg_ts.at[idx].set(t2, mode="drop"),
        msg_count=mem.msg_count.at[idx].set(1.0, mode="drop"),
    )


def eval_store_commit(cfg, params, mem: MemoryState, edge_feats, src, dst,
                      t, eidx, valid, src_emb=None, dst_emb=None):
    """Fused eval-batch store+commit for the ``last`` aggregator: the batch's
    messages are committed straight into memory without the [N, msg]-table
    round trip.

    The reference eval protocol stores this batch's messages and immediately
    consumes them (tgn_model.py:159-172), and with last-wins semantics every
    committed positive IS a sender of this same batch — so the committed cell
    input is exactly this batch's winner message. The two-step path writes
    the [2b, msg] block into the table, gathers it back, then zeroes it;
    here only the zeroing scatter remains (pre-existing pending rows of this
    batch's senders are destroyed either way: store overwrites them).
    Bit-identical to ``_store_messages`` + ``_commit_pending``: the message
    still round-trips through ``messages.dtype`` (bf16 by default) before
    feeding the cell, and losers of a duplicated sender simply don't scatter
    (the two-step path writes them the winner's value redundantly).

    ``mean`` aggregation accumulates across pre-existing pending rows, so it
    keeps the two-step path (train/phase.py)."""
    assert cfg.aggregator == "last"
    n = mem.memory.shape[0]
    snd, t2, valid2, keep, msg = _build_messages(
        cfg, mem, edge_feats, src, dst, t, eidx, valid, src_emb, dst_emb
    )
    rows = mem.memory[snd]
    # simulate the table round trip's quantization, then the commit-side
    # cell-input assembly (models/tgn.py:message_input tail)
    raw = msg.astype(mem.messages.dtype)
    cell_in = message_cell_input(cfg, params, raw, rows)
    upd = cell_apply(cfg, params, cell_in, rows).astype(mem.memory.dtype)
    idx_w = jnp.where(keep, snd, n)     # winners write memory/last_update
    idx_v = jnp.where(valid2, snd, n)   # all valid senders' rows are cleared
    return mem._replace(
        memory=mem.memory.at[idx_w].set(upd, mode="drop"),
        last_update=mem.last_update.at[idx_w].set(t2, mode="drop"),
        messages=mem.messages.at[idx_v].set(0.0, mode="drop"),
        msg_count=mem.msg_count.at[idx_v].set(0.0, mode="drop"),
        msg_ts=mem.msg_ts.at[idx_w].set(t2, mode="drop"),
    )


def flush_pending_impl(cfg: Config, params: TgnParams, mem: MemoryState) -> MemoryState:
    """One-time train→eval flush of ALL pending messages (reference
    update_memory_in_test, memory_updater.py:46-57). Dense over N rows —
    runs a handful of times per epoch. Unjitted body: the seed-parallel
    Trainer wraps it per seed inside its own jitted programs
    (loop._flush_one_seed / _flush_mem_seeds_sharded) — ONE seed at a
    time, never vmapped over seeds: the dense bf16→f32 upcast scratch
    materializes per mapped instance (~11 GiB at S=8 × 1.14M nodes, an
    observed v5e OOM under vmap)."""
    msg, f = message_input(cfg, params, mem, None)  # dense, no gather
    upd = cell_apply(cfg, params, msg, mem.memory)
    return mem._replace(
        memory=jnp.where(f[:, None], upd.astype(mem.memory.dtype), mem.memory),
        last_update=jnp.where(f, mem.msg_ts, mem.last_update),
        messages=jnp.zeros_like(mem.messages),
        msg_count=jnp.zeros_like(mem.msg_count),
    )


flush_pending_messages = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("mem",)
)(flush_pending_impl)


# ------------------------------------------------- seed-parallel flat tables
#
# The seed-parallel phase (train/phase.py:_run_phase_seeds) carries the node
# tables FLAT — [S·N, ...] with seed s owning rows [s·N, (s+1)·N) — instead
# of stacked [S, N, ...]: vmapped scatters and gathers on a stacked table
# disagree about its layout ({2,0,1} vs {2,1,0}) and XLA relayouts the WHOLE
# table every batch (3.3ms/batch at Wiki-Talk scale — NOTES.md round 4). On
# the flat rank-2 tables there is one canonical layout; the vmapped forward
# gathers with per-lane offset ids from the (unbatched) table, and the
# memory-protocol scatters below run ONCE over the concatenated lanes. Each
# helper is the flat re-statement of its namesake above — bit-identical per
# lane (the last-per-sender winner mask is seed-independent and computed on
# raw ids once).

def _build_messages_flat(cfg, memf: MemoryState, edge_feats, src, dst, t,
                         eidx, valid, offs, src_embs=None, dst_embs=None):
    """:func:`_build_messages` over S lanes on the flat tables. Returns
    (snd_flat [S·2b], t2 [2b], valid2 [2b], keep [2b], msg [S·2b, W-1]);
    ``keep``/``valid2`` are shared across lanes (shared events)."""
    S = offs.shape[0]
    n = memf.memory.shape[0] // S
    snd = jnp.concatenate([src, dst])
    rcv = jnp.concatenate([dst, src])
    t2 = jnp.concatenate([t, t])
    e2 = jnp.concatenate([eidx, eidx])
    valid2 = jnp.concatenate([valid, valid])
    pos = jnp.arange(snd.shape[0], dtype=jnp.int32)
    winner = (
        jnp.full((n,), -1, jnp.int32)
        .at[jnp.where(valid2, snd, n)]
        .max(pos, mode="drop")
    )
    keep = valid2 & (winner[snd] == pos)

    snd_flat = (snd[None, :] + offs[:, None]).reshape(-1)
    rcv_flat = (rcv[None, :] + offs[:, None]).reshape(-1)
    b2 = snd.shape[0]
    if cfg.compact_messages:
        parts = []
    elif cfg.use_source_embedding_in_message:
        parts = [jnp.concatenate([src_embs, dst_embs], axis=1)
                 .reshape(S * b2, -1)]
    else:
        parts = [memf.memory[snd_flat]]
    if cfg.use_destination_embedding_in_message:
        rcv_part = (jnp.concatenate([dst_embs, src_embs], axis=1)
                    .reshape(S * b2, -1))
    else:
        rcv_part = memf.memory[rcv_flat]
    from zebra_tpu.models.time_encoding import time_basis, time_encode

    basis = time_basis(cfg.time_dim)
    e_safe = jnp.where(e2 < edge_feats.shape[0], e2, 0)
    t2_tile = jnp.tile(t2, S)
    msg = jnp.concatenate(
        parts
        + [
            rcv_part,
            jnp.tile(edge_feats[e_safe], (S, 1)),
            time_encode(t2_tile - memf.last_update[snd_flat], basis),
        ],
        axis=-1,
    )
    return snd_flat, t2, valid2, keep, msg


def commit_pending_flat(cfg, params, memf: MemoryState, positives, valid2,
                        offs):
    """:func:`_commit_pending` over S lanes on the flat tables; the
    parameter-dependent cell math runs vmapped over the seed axis."""
    S = offs.shape[0]
    b2 = positives.shape[0]
    nflat = memf.memory.shape[0]
    pos_flat = (positives[None, :] + offs[:, None]).reshape(-1)
    rows = memf.memory[pos_flat]
    msg_rows = memf.messages[pos_flat]
    flag = msg_rows[..., -1] != 0
    raw = msg_rows[..., :-1]
    if cfg.aggregator == "mean":
        cnt = memf.msg_count[pos_flat]
        raw = raw.astype(jnp.float32) / jnp.maximum(cnt, 1.0)[..., None]

    def lane(p, raw_l, rows_l):
        ci = message_cell_input(cfg, p, raw_l, rows_l)
        return cell_apply(cfg, p, ci, rows_l)

    upd = jax.vmap(lane)(
        params, raw.reshape(S, b2, -1), rows.reshape(S, b2, -1)
    ).reshape(S * b2, -1).astype(memf.memory.dtype)

    valid_flat = jnp.tile(valid2, S)
    flags = flag & valid_flat
    idx = jnp.where(valid_flat, pos_flat, nflat)
    return memf._replace(
        memory=memf.memory.at[idx].set(
            jnp.where(flags[:, None], upd, rows), mode="drop"
        ),
        last_update=memf.last_update.at[idx].set(
            jnp.where(flags, memf.msg_ts[pos_flat],
                      memf.last_update[pos_flat]),
            mode="drop",
        ),
        messages=memf.messages.at[idx].set(0.0, mode="drop"),
        msg_count=memf.msg_count.at[idx].set(0.0, mode="drop"),
    )


def store_messages_flat(cfg, memf: MemoryState, edge_feats, src, dst, t,
                        eidx, valid, offs, src_embs=None, dst_embs=None):
    """:func:`_store_messages` over S lanes on the flat tables (the store is
    parameter-free)."""
    S = offs.shape[0]
    nflat = memf.memory.shape[0]
    snd_flat, t2, valid2, keep, msg = _build_messages_flat(
        cfg, memf, edge_feats, src, dst, t, eidx, valid, offs,
        src_embs, dst_embs,
    )
    one = jnp.ones((msg.shape[0], 1), msg.dtype)
    msg = jnp.concatenate([msg, one], axis=-1).astype(memf.messages.dtype)
    t2_tile = jnp.tile(t2, S)
    if cfg.aggregator == "mean":
        valid_flat = jnp.tile(valid2, S)
        idx_all = jnp.where(valid_flat, snd_flat, nflat)
        return memf._replace(
            messages=memf.messages.at[idx_all].add(
                jnp.where(valid_flat[:, None], msg,
                          jnp.zeros((), msg.dtype)),
                mode="drop",
            ),
            msg_count=memf.msg_count.at[idx_all].add(
                valid_flat.astype(jnp.float32), mode="drop"
            ),
            msg_ts=memf.msg_ts.at[idx_all].max(t2_tile, mode="drop"),
        )
    keep_flat = jnp.tile(keep, S)
    idx = jnp.where(keep_flat, snd_flat, nflat)
    return memf._replace(
        messages=memf.messages.at[idx].set(msg, mode="drop"),
        msg_ts=memf.msg_ts.at[idx].set(t2_tile, mode="drop"),
        msg_count=memf.msg_count.at[idx].set(1.0, mode="drop"),
    )


def eval_store_commit_flat(cfg, params, memf: MemoryState, edge_feats, src,
                           dst, t, eidx, valid, offs, src_embs=None,
                           dst_embs=None):
    """:func:`eval_store_commit` over S lanes on the flat tables."""
    assert cfg.aggregator == "last"
    S = offs.shape[0]
    nflat = memf.memory.shape[0]
    snd_flat, t2, valid2, keep, msg = _build_messages_flat(
        cfg, memf, edge_feats, src, dst, t, eidx, valid, offs,
        src_embs, dst_embs,
    )
    b2 = valid2.shape[0]
    rows = memf.memory[snd_flat]
    raw = msg.astype(memf.messages.dtype)

    def lane(p, raw_l, rows_l):
        ci = message_cell_input(cfg, p, raw_l, rows_l)
        return cell_apply(cfg, p, ci, rows_l)

    upd = jax.vmap(lane)(
        params, raw.reshape(S, b2, -1), rows.reshape(S, b2, -1)
    ).reshape(S * b2, -1).astype(memf.memory.dtype)
    t2_tile = jnp.tile(t2, S)
    idx_w = jnp.where(jnp.tile(keep, S), snd_flat, nflat)
    idx_v = jnp.where(jnp.tile(valid2, S), snd_flat, nflat)
    return memf._replace(
        memory=memf.memory.at[idx_w].set(upd, mode="drop"),
        last_update=memf.last_update.at[idx_w].set(t2_tile, mode="drop"),
        messages=memf.messages.at[idx_v].set(0.0, mode="drop"),
        msg_count=memf.msg_count.at[idx_v].set(0.0, mode="drop"),
        msg_ts=memf.msg_ts.at[idx_w].set(t2_tile, mode="drop"),
    )
