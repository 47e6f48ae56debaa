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
    eval_store_commit,
    make_lazy_plan,
    make_optimizer,
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


_run_phase_jit = None
_run_phase_fused_jit = None


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
