"""Whole-phase fused execution: one jitted call per training/eval pass.

The host loop in the reference dispatches per batch (index query → H2D →
forward/backward → D2H metrics, reference train.py:195-227); on TPU every
dispatch costs a host round trip, so here an entire phase — negative
sampling, the sequential T-PPR index scan, the dense towers, the optimizer,
the memory protocol, and the metrics — runs as a single ``lax.scan`` over
batches inside one XLA program. The stream (with host-sampled negatives) is
uploaded once and only the per-batch metric vectors come back to host.

Supports both index strategies as static config: ``streaming`` runs the
SANTA inner scan per batch (extraction-before-update per edge preserved);
``pruning`` issues the stateless bounded-BFS query against the phase's
neighbor index."""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from zebra_tpu.config import Config
from zebra_tpu.index.neighbor_finder import NeighborIndex
from zebra_tpu.index.pruning import pruned_topk_impl
from zebra_tpu.index.streaming import (
    TpprParams,
    TpprQueries,
    edge_step,
    unpack_queries,
)
from zebra_tpu.models.memory import MemoryState
from zebra_tpu.utils.xla_options import resolve_compiler_options
from zebra_tpu.train.step import (
    StepMetrics,
    _commit_pending,
    _forward,
    _masked_mean,
    _scores,
    _store_messages,
    commit_pending_flat,
    eval_store_commit,
    eval_store_commit_flat,
    make_lazy_plan,
    make_optimizer,
    store_messages_flat,
)


class Stream(NamedTuple):
    """A phase's event stream, padded to n_batches·bs (leading axis flat).
    Negatives are sampled on host per phase (train: fresh each epoch from the
    train destinations; eval: fixed seeded draws — reference train.py:140-144,
    evaluation.py:9-10) so the host-side wave scheduler can account for their
    extraction reads."""

    src: jnp.ndarray    # i32 [E]
    dst: jnp.ndarray    # i32 [E]
    neg: jnp.ndarray    # i32 [E] negative-sample node per event
    t: jnp.ndarray      # f32 [E]
    eidx: jnp.ndarray   # i32 [E]
    valid: jnp.ndarray  # bool [E]


def _index_queries(cfg: Config, tppr_params: TpprParams, index_state,
                   nbr_index, src, dst, neg, t, eidx, valid):
    """Per-batch top-k queries [M, 3b, k] + updated index state."""
    b = src.shape[0]
    if cfg.tppr_strategy == "streaming":
        def estep(carry, e):
            s, d, n, tt, ei, v = e
            return edge_step(carry, s, d, n, tt, ei, v, tppr_params)

        index_state, rows = jax.lax.scan(
            estep, index_state, (src, dst, neg, t, eidx, valid)
        )
        q = unpack_queries(rows, t, cfg.n_tppr, cfg.topk)
        # [b, M, 3, k] → [M, 3b, k] in src‖dst‖neg row order
        q = TpprQueries(
            *(
                x.transpose(1, 2, 0, 3).reshape(x.shape[1], 3 * b, x.shape[3])
                for x in q
            )
        )
        return index_state, q

    nodes3 = jnp.concatenate([src, dst, neg])
    times3 = jnp.concatenate([t, t, t])
    q = pruned_topk_impl(
        nbr_index,
        jnp.asarray(cfg.alpha_list, jnp.float32),
        jnp.asarray(cfg.beta_list, jnp.float32),
        nodes3,
        times3,
        cfg.n_degree,
        cfg.n_layer,
        cfg.topk,
    )
    return index_state, q


def _run_phase(
    cfg: Config,
    train: bool,
    n_batches: int,
    params,
    opt_state,
    mem: MemoryState,
    index_state,            # TpprState (streaming) or () (pruning)
    rng: jnp.ndarray,
    edge_feats: jnp.ndarray,
    nbr_index,              # NeighborIndex (pruning) or () (streaming)
    stream: Stream,         # arrays [n_batches*bs]
    queries=None,           # packed query rows f32 [n_batches*bs, 3, F] from
                            # the wave-parallel index scan, or None to run
                            # the index inside this program
) -> Tuple[Any, Any, MemoryState, Any, StepMetrics]:
    """One full pass over a stream. Returns per-batch metrics [n_batches]."""
    b = stream.src.shape[0] // n_batches
    tppr_params = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)
    opt = make_optimizer(cfg)
    xs = jax.tree.map(lambda x: x.reshape(n_batches, b), stream)
    if queries is not None:
        xs = (xs, queries.reshape((n_batches, b) + queries.shape[1:]))
    else:
        xs = (xs, None)

    # the message-source flags consume this batch's embeddings in the raw
    # messages (reference tgn_model.py:160-164, 217-218)
    need_emb = (
        cfg.use_source_embedding_in_message
        or cfg.use_destination_embedding_in_message
    )

    def loss_fn(p, mem, s, q, drop_rng, nodes3, times3, valid, plan):
        emb = _forward(cfg, p, mem, edge_feats, nodes3, times3, q, nbr_index,
                       drop_rng, train=True, plan=plan)
        pos_logit, neg_logit = _scores(cfg, p, emb, b)
        bce_pos = optax.sigmoid_binary_cross_entropy(
            pos_logit, jnp.ones_like(pos_logit)
        )
        bce_neg = optax.sigmoid_binary_cross_entropy(
            neg_logit, jnp.zeros_like(neg_logit)
        )
        loss = _masked_mean(bce_pos, valid) + _masked_mean(bce_neg, valid)
        aux = (jax.nn.sigmoid(pos_logit), jax.nn.sigmoid(neg_logit),
               emb[: 2 * b] if need_emb else None)
        return loss, aux

    def batch_body(carry, xs_item):
        s, q_rows = xs_item
        params, opt_state, mem, index_state, rng = carry
        rng, k_drop = jax.random.split(rng)
        neg = s.neg

        if cfg.embedding_module != "diffusion":
            q = None  # recursive/identity/time towers query the graph directly
        elif q_rows is not None:
            # precomputed by the wave-parallel scan: unpack + lay out as
            # [M, 3b, k] in src‖dst‖neg row order
            q = unpack_queries(q_rows, s.t, cfg.n_tppr, cfg.topk)
            q = TpprQueries(
                *(
                    x.transpose(1, 2, 0, 3).reshape(x.shape[1], 3 * b, x.shape[3])
                    for x in q
                )
            )
        else:
            index_state, q = _index_queries(
                cfg, tppr_params, index_state, nbr_index,
                s.src, s.dst, neg, s.t, s.eidx, s.valid,
            )
        nodes3 = jnp.concatenate([s.src, s.dst, neg])
        times3 = jnp.concatenate([s.t, s.t, s.t])
        positives = jnp.concatenate([s.src, s.dst])
        valid2 = jnp.concatenate([s.valid, s.valid])

        overflow = jnp.zeros(())
        if train:
            # the id sort/compaction plan is integer-only: building it
            # outside the grad keeps the remat pass from re-sorting the
            # selected ids in the backward (train/step.py:make_lazy_plan)
            plan = (
                make_lazy_plan(cfg, q, nodes3)
                if cfg.embedding_module == "diffusion" else None
            )
            if plan is not None:
                overflow = plan.overflow
            (loss, (pos_p, neg_p, emb2b)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, mem, s, q, k_drop, nodes3, times3, s.valid, plan)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            src_emb = dst_emb = None
            if need_emb:  # message collection is no-grad (tgn_model.py:159)
                emb2b = jax.lax.stop_gradient(emb2b)
                src_emb, dst_emb = emb2b[:b], emb2b[b:]
            # commit previous batches' messages, then store this batch's
            # (one-batch staleness; reference tgn_model.py:155-168)
            mem = _commit_pending(cfg, params, mem, positives, valid2)
            mem = _store_messages(
                cfg, params, mem, edge_feats, s.src, s.dst, s.t, s.eidx,
                s.valid, src_emb, dst_emb,
            )
        else:
            loss = jnp.zeros(())
            emb = _forward(cfg, params, mem, edge_feats, nodes3, times3, q,
                           nbr_index, None, train=False)
            pos_logit, neg_logit = _scores(cfg, params, emb, b)
            pos_p, neg_p = jax.nn.sigmoid(pos_logit), jax.nn.sigmoid(neg_logit)
            src_emb, dst_emb = (
                (emb[:b], emb[b : 2 * b]) if need_emb else (None, None)
            )
            # eval: store first, commit immediately (tgn_model.py:159-172);
            # fused for the last-aggregator (skips the message-table round
            # trip — bit-identical, see step.py:eval_store_commit)
            if cfg.aggregator == "last":
                mem = eval_store_commit(
                    cfg, params, mem, edge_feats, s.src, s.dst, s.t,
                    s.eidx, s.valid, src_emb, dst_emb,
                )
            else:
                mem = _store_messages(
                    cfg, params, mem, edge_feats, s.src, s.dst, s.t, s.eidx,
                    s.valid, src_emb, dst_emb,
                )
                mem = _commit_pending(cfg, params, mem, positives, valid2)

        from zebra_tpu.ops.metrics import masked_ap, masked_auc, masked_rank_acc

        # metrics stay INSIDE the scan: hoisting them out (stacked ys + one
        # vmapped sort after the loop) measured 7% slower — the in-loop
        # sorts hide under the body's async copies, the post-loop pass
        # doesn't overlap with anything
        metrics = StepMetrics(
            loss=loss,
            ap=masked_ap(pos_p, neg_p, s.valid),
            auc=masked_auc(pos_p, neg_p, s.valid),
            acc=masked_rank_acc(pos_p, neg_p, s.valid),
            overflow=overflow,
        )
        return (params, opt_state, mem, index_state, rng), metrics

    # unroll=2: halves the scan's per-iteration fixed cost (+6% measured);
    # deeper unrolling regresses (code size)
    (params, opt_state, mem, index_state, _), metrics = jax.lax.scan(
        batch_body, (params, opt_state, mem, index_state, rng), xs, unroll=2
    )
    return params, opt_state, mem, index_state, metrics


def _run_phase_fused(
    cfg: Config,
    train: bool,
    n_batches: int,
    n_waves: int,
    use_pallas: bool,
    pallas_block: int,
    params,
    opt_state,
    mem: MemoryState,
    index_state,
    rng: jnp.ndarray,
    edge_feats: jnp.ndarray,
    stream: Stream,
    flat: jnp.ndarray,       # i32 [E] wave·cap + lane per edge
):
    """Wave-parallel index scan + the batch scan as ONE XLA program per
    superchunk (``--fused_dispatch``). Removes one host dispatch per chunk,
    but measured ~15% SLOWER than the two-dispatch split on the tunneled
    v5e: async enqueue already pipelines the split programs, and XLA
    compiles the combined module worse (RESULTS.md round-3 A/B: 86.0k vs
    100.8-104.7k ev/s back-to-back). Kept selectable for deployments where
    per-dispatch cost dominates; bit-equivalence with the split is tested
    (test_fused_chunk_matches_two_dispatch)."""
    from zebra_tpu.index.waves import _wave_scan_chunk

    tppr_params = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)
    index_state, queries = _wave_scan_chunk(
        index_state, tppr_params,
        stream.src, stream.dst, stream.neg, stream.t, stream.eidx,
        stream.valid, flat, n_waves, cfg.wave_cap, use_pallas, pallas_block,
    )
    params, opt_state, mem, _, metrics = _run_phase(
        cfg, train, n_batches, params, opt_state, mem, (), rng,
        edge_feats, (), stream, queries,
    )
    return params, opt_state, mem, index_state, metrics


def _lane_queries(cfg: Config, b: int, t_b, rows3, nbr_index, src, dst, neg):
    """One lane's top-k queries: unpack precomputed wave-scan rows, run the
    stateless pruning BFS, or None for the towers that query the graph
    directly. Shared by both seed-parallel formulations."""
    if cfg.embedding_module != "diffusion":
        return None
    if rows3 is not None:
        q = unpack_queries(rows3, t_b, cfg.n_tppr, cfg.topk)
        return TpprQueries(*(
            x.transpose(1, 2, 0, 3).reshape(x.shape[1], 3 * b, x.shape[3])
            for x in q
        ))
    return pruned_topk_impl(
        nbr_index,
        jnp.asarray(cfg.alpha_list, jnp.float32),
        jnp.asarray(cfg.beta_list, jnp.float32),
        jnp.concatenate([src, dst, neg]),
        jnp.concatenate([t_b, t_b, t_b]),
        cfg.n_degree, cfg.n_layer, cfg.topk,
    )


def _lane_step(cfg: Config, train: bool, b: int, opt, edge_feats, nbr_index,
               need_emb: bool, p, o, mem_like, k_drop, q, nodes3, times3,
               valid, mem_off=None):
    """One lane's forward (+ backward + optimizer) and metrics.
    ``mem_like`` is the shared flat [S·N, ·] tables; the diffusion path
    pre-offsets ``nodes3``/``q.nbr`` into the lane's row range, the other
    towers pass raw node ids plus ``mem_off`` (their forwards also resolve
    ADJACENCY by node id, which must stay raw — models/embedding.py:_offset).
    Returns (params, opt_state, metrics, emb2b-or-None)."""
    overflow = jnp.zeros(())
    if train:
        plan = (
            make_lazy_plan(cfg, q, nodes3)
            if cfg.embedding_module == "diffusion" else None
        )
        if plan is not None:
            overflow = plan.overflow

        def loss_fn(p_):
            emb = _forward(cfg, p_, mem_like, edge_feats, nodes3, times3,
                           q, nbr_index, k_drop, train=True, plan=plan,
                           mem_off=mem_off)
            pos_logit, neg_logit = _scores(cfg, p_, emb, b)
            bce_pos = optax.sigmoid_binary_cross_entropy(
                pos_logit, jnp.ones_like(pos_logit)
            )
            bce_neg = optax.sigmoid_binary_cross_entropy(
                neg_logit, jnp.zeros_like(neg_logit)
            )
            loss = _masked_mean(bce_pos, valid) + _masked_mean(bce_neg, valid)
            aux = (jax.nn.sigmoid(pos_logit), jax.nn.sigmoid(neg_logit),
                   emb[: 2 * b] if need_emb else None)
            return loss, aux

        (loss, (pos_p, neg_p, emb2b)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        if need_emb:
            emb2b = jax.lax.stop_gradient(emb2b)
    else:
        loss = jnp.zeros(())
        emb = _forward(cfg, p, mem_like, edge_feats, nodes3, times3, q,
                       nbr_index, None, train=False, mem_off=mem_off)
        pos_logit, neg_logit = _scores(cfg, p, emb, b)
        pos_p = jax.nn.sigmoid(pos_logit)
        neg_p = jax.nn.sigmoid(neg_logit)
        emb2b = emb[: 2 * b] if need_emb else None

    from zebra_tpu.ops.metrics import masked_ap, masked_auc, masked_rank_acc

    metrics = StepMetrics(
        loss=loss,
        ap=masked_ap(pos_p, neg_p, valid),
        auc=masked_auc(pos_p, neg_p, valid),
        acc=masked_rank_acc(pos_p, neg_p, valid),
        overflow=overflow,
    )
    return p, o, metrics, emb2b


def _run_phase_seeds(
    cfg: Config,
    train: bool,
    n_batches: int,
    params,                  # stacked [S, ...] per-seed trees
    opt_state,
    mem: MemoryState,
    rng: jnp.ndarray,        # [S] per-seed keys
    edge_feats: jnp.ndarray,
    nbr_index,               # shared NeighborIndex (pruning/recursive) or ()
    stream: Stream,          # neg is [E, S] (train) or [E] (eval: the seeded
                             # samplers draw the SAME negatives every run,
                             # reference train.py:141-144, evaluation.py:9-10)
    queries=None,            # packed rows [E, 2+S, F] from the multi-neg wave
                             # scan ([E, 3, F] for eval), or None for the
                             # strategies that query per seed (pruning BFS /
                             # recursive towers)
    seed_base=None,          # i32 [] global index of this shard's first seed
                             # (seed-sharded mesh execution: inside shard_map
                             # the leading axes hold only the LOCAL seeds,
                             # but the packed query rows stay replicated and
                             # are indexed by GLOBAL seed). None/0 = all
                             # seeds local (single-device)
):
    """Seed-parallel variant of :func:`_run_phase`: S independent runs
    (per-seed params, optimizer, memory, dropout streams, train negatives)
    advance together, vmapped over the seed axis, sharing the event stream,
    the T-PPR index scan (negatives are extraction-only — the wave scan
    extracts every seed's negative rows in one pass), and all host↔device
    traffic. The per-seed math is exactly :func:`_run_phase`'s, so each lane
    reproduces the run `Trainer(cfg.replace(seed=seed_s))` would produce.

    Bit-exactness caveat: under ``--prng_impl threefry2x32`` the per-seed
    dropout bits are identical to the sequential runs' (threefry bit
    generation is vmap-invariant — tested); the default ``rbg`` impl
    generates DIFFERENT (equally valid, per-seed independent) dropout masks
    under vmap, so rbg results match sequential runs in distribution, not
    bit-for-bit — the same class of difference as the reference's own
    run-to-run dropout variance. Everything deterministic (index queries,
    negatives, eval phases, init) is exact under either impl.

    The reference reaches multi-run statistics by looping runs sequentially
    (reference train.py:149); there is no single-GPU analogue of this.

    The streaming index is NOT carried here: seed-parallel streaming requires
    the wave pipeline (queries precomputed), which is the production path.
    Returns (params, opt_state, mem, metrics) with metrics [n_batches, S]."""
    b = stream.src.shape[0] // n_batches
    multi_neg = stream.neg.ndim == 2
    n_seeds = jax.tree.leaves(params)[0].shape[0]
    opt = make_optimizer(cfg)

    if cfg.embedding_module == "diffusion" and cfg.tppr_strategy == "streaming":
        if queries is None:
            raise ValueError(
                "seed-parallel streaming needs wave-scan queries (the "
                "in-program sequential index scan is not supported here)"
            )

    shared = Stream(
        src=stream.src.reshape(n_batches, b),
        dst=stream.dst.reshape(n_batches, b),
        neg=(stream.neg.reshape(n_batches, b, n_seeds) if multi_neg
             else stream.neg.reshape(n_batches, b)),
        t=stream.t.reshape(n_batches, b),
        eidx=stream.eidx.reshape(n_batches, b),
        valid=stream.valid.reshape(n_batches, b),
    )
    xs = (shared,
          queries.reshape((n_batches, b) + queries.shape[1:])
          if queries is not None else None)

    need_emb = (
        cfg.use_source_embedding_in_message
        or cfg.use_destination_embedding_in_message
    )
    # per-seed block picker: seed s reads query blocks [src, dst, neg_s];
    # under seed-sharded execution the neg-block index is the GLOBAL seed
    lanes = jnp.arange(n_seeds, dtype=jnp.int32)
    base = jnp.int32(0) if seed_base is None else seed_base
    block_of_seed = jnp.stack(
        [jnp.zeros_like(lanes), jnp.ones_like(lanes), 2 + base + lanes],
        axis=1,
    )                                                   # i32 [S, 3]

    # Every tower reads per-seed node state ONLY through row gathers, so the
    # seed axis lives in the ROW SPACE instead of a batched array axis: the
    # tables are carried FLAT [S·N, ...] with seed s owning rows
    # [s·N, (s+1)·N), the vmapped forward gathers at per-lane offset ids
    # from the unbatched tables, and the memory protocol runs ONCE over the
    # concatenated lanes (train/step.py:*_flat). Rationale: vmapped scatters
    # and gathers disagree about a stacked [S, N, ...] table's layout and
    # XLA relayouts the WHOLE table every batch — 2.5× at Wiki-Talk scale
    # (NOTES.md round 4). The diffusion path pre-offsets its query ids; the
    # recursive/identity/time towers also resolve ADJACENCY by raw node id,
    # so they take a lane offset (``mem_off``) applied only at the memory
    # gathers (models/embedding.py:_offset) — the adjacency index stays
    # shared across seeds.
    n_rows = mem.memory.shape[1]
    offs = jnp.arange(n_seeds, dtype=jnp.int32) * n_rows
    mem = jax.tree.map(
        lambda x: x.reshape((n_seeds * n_rows,) + x.shape[2:]), mem
    )

    def batch_body(carry, xs_item):
        s, q_rows = xs_item
        params, opt_state, memf, rng = carry
        positives = jnp.concatenate([s.src, s.dst])
        valid2 = jnp.concatenate([s.valid, s.valid])
        times3 = jnp.concatenate([s.t, s.t, s.t])

        def seed_fn(p, o, r, off, neg, rows3):
            r, k_drop = jax.random.split(r)
            q = _lane_queries(cfg, b, s.t, rows3, nbr_index,
                              s.src, s.dst, neg)
            nodes3 = jnp.concatenate([s.src, s.dst, neg])
            if q is not None:
                # this lane's rows live at ids + off; empty top-k slots
                # (nbr 0, w 0) land on the lane's own dummy row 0
                q = q._replace(nbr=q.nbr + off)
                nodes3 = nodes3 + off
                mem_off = None
            else:
                mem_off = off  # raw ids + in-forward offset (adjacency)
            p, o, metrics, emb2b = _lane_step(
                cfg, train, b, opt, edge_feats, nbr_index, need_emb,
                p, o, memf, k_drop, q, nodes3, times3, s.valid,
                mem_off=mem_off,
            )
            return (p, o, r), metrics, emb2b

        if multi_neg:
            negs_in, neg_ax = s.neg.T, 0                # [S, b]
        else:
            negs_in, neg_ax = s.neg, None               # shared eval draw
        if q_rows is None:
            q_in, q_ax = None, None
        elif q_rows.shape[1] == 3 and not multi_neg:
            q_in, q_ax = q_rows, None                   # shared eval rows
        else:
            q_in, q_ax = q_rows[:, block_of_seed].transpose(1, 0, 2, 3), 0

        (params, opt_state, rng), metrics, emb2b = jax.vmap(
            seed_fn, in_axes=(0, 0, 0, 0, neg_ax, q_ax)
        )(params, opt_state, rng, offs, negs_in, q_in)
        src_embs = dst_embs = None
        if need_emb:
            src_embs, dst_embs = emb2b[:, :b], emb2b[:, b:]
        # memory protocol on the flat tables, all lanes in one pass;
        # same per-lane order as the stacked path (train: commit with the
        # POST-step params, then store from post-commit memory; eval:
        # fused store+commit for 'last', store-then-commit for 'mean')
        if train:
            memf = commit_pending_flat(
                cfg, params, memf, positives, valid2, offs
            )
            memf = store_messages_flat(
                cfg, memf, edge_feats, s.src, s.dst, s.t, s.eidx,
                s.valid, offs, src_embs, dst_embs,
            )
        elif cfg.aggregator == "last":
            memf = eval_store_commit_flat(
                cfg, params, memf, edge_feats, s.src, s.dst, s.t,
                s.eidx, s.valid, offs, src_embs, dst_embs,
            )
        else:
            memf = store_messages_flat(
                cfg, memf, edge_feats, s.src, s.dst, s.t, s.eidx,
                s.valid, offs, src_embs, dst_embs,
            )
            memf = commit_pending_flat(
                cfg, params, memf, positives, valid2, offs
            )
        return (params, opt_state, memf, rng), metrics

    (params, opt_state, mem, _), metrics = jax.lax.scan(
        batch_body, (params, opt_state, mem, rng), xs, unroll=2,
    )
    mem = jax.tree.map(
        lambda x: x.reshape((n_seeds, n_rows) + x.shape[1:]), mem
    )
    return params, opt_state, mem, metrics


def _run_phase_seeds_sharded(
    cfg: Config,
    train: bool,
    n_batches: int,
    mesh,                    # jax.sharding.Mesh with axis 'data'
    params, opt_state, mem, rng, edge_feats, nbr_index, stream,
    queries=None,
):
    """Seed-SHARDED phase: the S vmapped lanes of :func:`_run_phase_seeds`
    distributed over the mesh, whole seeds per device (S % n_devices == 0).

    With the flat [S·N, ·] tables the seed axis is just rows, so sharding BY
    SEED is embarrassingly parallel: each device runs the identical batch
    scan over its own S/D lanes and ZERO collectives appear inside the scan
    — expressed as ``shard_map`` so locality holds by construction (a pjit
    gather over a row-sharded table could not be proven local and would
    lower to all-gathers). The shared event stream, wave-scan query rows,
    edge features, and adjacency index replicate; per-seed state (params,
    optimizer, memory, dropout keys) and the per-seed negative columns
    shard. Each shard indexes the replicated query rows by its GLOBAL seed
    ids (``seed_base``).

    The reference runs multi-run sweeps sequentially on one GPU (reference
    train.py:149); this is the TPU-native scale-out of that axis
    (SURVEY.md §7 stage 6)."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    n_seeds = jax.tree.leaves(params)[0].shape[0]
    if n_seeds % n_dev:
        raise ValueError(
            f"seed-sharded phase needs parallel_runs ({n_seeds}) divisible "
            f"by the mesh size ({n_dev})"
        )
    s_local = n_seeds // n_dev
    multi_neg = stream.neg.ndim == 2
    seed = P("data")
    repl = P()

    def body(params, opt_state, mem, rng, edge_feats, nbr_index, stream,
             queries):
        base = jax.lax.axis_index("data") * s_local
        params, opt_state, mem, metrics = _run_phase_seeds(
            cfg, train, n_batches, params, opt_state, mem, rng,
            edge_feats, nbr_index, stream, queries, seed_base=base,
        )
        # metrics replicate (all-gather over the seed axis): the host loop
        # reads them with np.asarray, which requires fully-addressable
        # arrays — a seed-sharded metric leaf would not be when the mesh
        # spans processes. [n_batches, S] floats: negligible traffic.
        metrics = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "data", axis=1, tiled=True),
            metrics,
        )
        return params, opt_state, mem, metrics

    stream_spec = Stream(
        src=repl, dst=repl,
        neg=P(None, "data") if multi_neg else repl,
        t=repl, eidx=repl, valid=repl,
    )
    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seed, seed, seed, seed, repl, repl, stream_spec, repl),
        out_specs=(seed, seed, seed, repl),
        check_vma=False,
    )(params, opt_state, mem, rng, edge_feats, nbr_index, stream, queries)
    return out


_run_phase_jit = None
_run_phase_fused_jit = None
_run_phase_seeds_jit = None
_run_phase_seeds_sharded_jit = None


def run_phase(*args, **kwargs):
    """Jitted :func:`_run_phase`; compiler options resolved at first call
    (utils/xla_options — backend probing must not happen at import)."""
    global _run_phase_jit
    if _run_phase_jit is None:
        _run_phase_jit = functools.partial(
            jax.jit,
            static_argnames=("cfg", "train", "n_batches"),
            donate_argnames=("params", "opt_state", "mem", "index_state"),
            compiler_options=resolve_compiler_options(),
        )(_run_phase)
    return _run_phase_jit(*args, **kwargs)


def run_phase_fused(*args, **kwargs):
    """Jitted :func:`_run_phase_fused` (one dispatch per superchunk)."""
    global _run_phase_fused_jit
    if _run_phase_fused_jit is None:
        _run_phase_fused_jit = functools.partial(
            jax.jit,
            static_argnames=("cfg", "train", "n_batches", "n_waves",
                             "use_pallas", "pallas_block"),
            donate_argnames=("params", "opt_state", "mem", "index_state"),
            compiler_options=resolve_compiler_options(),
        )(_run_phase_fused)
    return _run_phase_fused_jit(*args, **kwargs)


def run_phase_seeds(*args, mesh=None, **kwargs):
    """Jitted :func:`_run_phase_seeds` (seed-parallel phase); with ``mesh``,
    the seed-SHARDED variant (:func:`_run_phase_seeds_sharded` — whole seeds
    per device, zero collectives in the scan)."""
    global _run_phase_seeds_jit, _run_phase_seeds_sharded_jit
    if mesh is not None:
        if _run_phase_seeds_sharded_jit is None:
            _run_phase_seeds_sharded_jit = functools.partial(
                jax.jit,
                static_argnames=("cfg", "train", "n_batches", "mesh"),
                donate_argnames=("params", "opt_state", "mem"),
                compiler_options=resolve_compiler_options(),
            )(_run_phase_seeds_sharded)
        cfg, train, n_batches, *rest = args
        return _run_phase_seeds_sharded_jit(
            cfg, train, n_batches, mesh, *rest, **kwargs
        )
    if _run_phase_seeds_jit is None:
        _run_phase_seeds_jit = functools.partial(
            jax.jit,
            static_argnames=("cfg", "train", "n_batches"),
            donate_argnames=("params", "opt_state", "mem"),
            compiler_options=resolve_compiler_options(),
        )(_run_phase_seeds)
    return _run_phase_seeds_jit(*args, **kwargs)
