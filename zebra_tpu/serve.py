"""Online serving: score candidate links against live framework state.

Production-facing wrapper over the eval-mode forward: load (or take) a
trained state — parameters, node memory, T-PPR index — and score arbitrary
(src, dst, t) candidates, optionally ingesting observed interactions to keep
memory and index current. The reference has no serving story (train.py only);
this is the framework's deployment surface.

Example::

    predictor = LinkPredictor.from_trainer(trainer)
    probs = predictor.score(src, dst, t)        # link probabilities [B]
    predictor.observe(src, dst, t, eidx)        # stream new interactions
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("zebra_tpu")

from zebra_tpu.config import Config
from zebra_tpu.index.streaming import (
    TpprParams,
    TpprQueries,
    read_topk,
    streaming_scan,
)
from zebra_tpu.models.memory import MemoryState
from zebra_tpu.train.step import (
    _commit_pending,
    eval_store_commit,
    _forward,
    _store_messages,
)


_ARENA_BUCKET = 65536


def _events_to_internal(cfg: Config, events):
    """External-id event columns → internal (interleave-permuted) id space;
    identity when the config trained without --interleave_node_ids. THE one
    definition of the external→internal event relabeling (constructor and
    from_checkpoint both route through it)."""
    if events is None or int(getattr(cfg, "interleave_shards", 0) or 0) <= 1:
        return events
    from zebra_tpu.parallel import interleave_permutation

    perm = interleave_permutation(cfg.n_nodes, cfg.interleave_shards)
    return (perm[np.asarray(events[0], np.int64)],
            perm[np.asarray(events[1], np.int64)]) + tuple(events[2:])


def _arena_capacity(n_events: int) -> int:
    """Bucketed adjacency-arena capacity (2·E, both directions, rounded up to
    the bucket) — ONE static shape across incremental folds, so observe()'s
    rebuilds never recompile the jitted consumers (pruned_topk,
    _score_candidates)."""
    return -(-(2 * n_events) // _ARENA_BUCKET) * _ARENA_BUCKET


def _score_impl(cfg: Config, params, mem, edge_feats, nodes2, times2,
                q: Optional[TpprQueries], nbr_index):
    """Eval-mode embeddings for the 2b src‖dst rows scored by the affinity
    head; returns P(link) [B]. (The training forward's third, negative block
    is not materialized — its embedding would be discarded.)"""
    from zebra_tpu.models.tgn import affinity_score

    b = nodes2.shape[0] // 2
    emb = _forward(cfg, params, mem, edge_feats, nodes2, times2, q, nbr_index,
                   None, train=False)
    pos_logit = affinity_score(params, emb[:b], emb[b:], cfg.mxu_dtype)
    return jax.nn.sigmoid(pos_logit)


_score_candidates = functools.partial(
    jax.jit, static_argnames=("cfg",)
)(_score_impl)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _score_ensemble(cfg: Config, params, mem, edge_feats, nodes2, times2,
                    q: Optional[TpprQueries], nbr_index):
    """Deep-ensemble scoring over a [S, ...] seed axis (one seed-parallel
    training pass, --parallel_runs): every member scores the candidates in
    one vmapped dispatch — queries and the index are shared, only
    params/memory differ — and the link probability is the ensemble mean."""
    probs = jax.vmap(
        lambda p, m: _score_impl(cfg, p, m, edge_feats, nodes2, times2, q,
                                 nbr_index)
    )(params, mem)
    return probs.mean(axis=0)


class LinkPredictor:
    """Stateful scorer over a (params, memory, index) snapshot."""

    _stacked = False  # EnsemblePredictor: params/mem carry a [S, ...] axis

    def __init__(self, cfg: Config, params, mem: MemoryState, index_state,
                 edge_feats, nbr_index=(),
                 events: Optional[Tuple[np.ndarray, ...]] = None,
                 rebuild_every: int = 1, internal_ids: bool = False):
        """``events`` is the (sources, destinations, timestamps, edge_idxs)
        stream ``nbr_index`` was built from: with it, ``observe()`` folds new
        interactions into the adjacency index (stateless strategies — pruning
        queries and the recursive towers — would otherwise go stale). The
        fold is a host-side index rebuild, amortized by ``rebuild_every``:
        1 (default) rebuilds on every observe() call (always-fresh, O(E log E)
        host work per call), larger values batch rebuilds and bound staleness
        to that many events (``flush_index()`` forces one)."""
        self.cfg = cfg
        self.params = params
        self.mem = mem
        self.index_state = index_state
        self.edge_feats = edge_feats
        self.nbr_index = nbr_index
        self._tppr = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)
        # interleaved-id training (Config.interleave_shards): memory/index
        # rows live in the permuted id space, so every externally supplied
        # node id maps through the same permutation at this boundary.
        # ``internal_ids`` marks events already in internal space (the
        # from_trainer path — the Trainer permuted its splits at
        # construction); _events is ALWAYS stored internal.
        self._id_perm = None
        if int(getattr(cfg, "interleave_shards", 0) or 0) > 1:
            from zebra_tpu.parallel import interleave_permutation

            self._id_perm = interleave_permutation(
                cfg.n_nodes, cfg.interleave_shards
            )
        if events is not None and not internal_ids:
            events = _events_to_internal(cfg, events)
        self._events = (
            tuple(np.asarray(c).copy() for c in events)
            if events is not None else None
        )
        self._pending: list = []
        self._pending_n = 0
        self.rebuild_every = max(1, rebuild_every)
        self._warned_static = False
        if self._events is not None and self.nbr_index != ():
            # pre-pad a naturally-sized arena to the bucketed capacity the
            # folds use, so the FIRST flush_index keeps the arena shape too
            from zebra_tpu.index.neighbor_finder import pad_arena

            self.nbr_index = pad_arena(
                self.nbr_index, _arena_capacity(len(self._events[0]))
            )

    def _map_ids(self, ids):
        """External node ids → internal (permuted) row ids; identity when
        the checkpoint was not trained with --interleave_node_ids."""
        ids = np.asarray(ids, np.int32)
        if self._id_perm is None:
            return ids
        return self._id_perm[ids]

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[Config] = None,
                        edge_feats=None,
                        events: Optional[Tuple[np.ndarray, ...]] = None,
                        rebuild_every: int = 1,
                        run_index: int = 0,
                        ensemble: bool = False) -> "LinkPredictor":
        """Build a predictor from a ``Trainer.save_state`` checkpoint file —
        no live Trainer needed (the deployment path). ``cfg`` defaults to the
        one stored in the checkpoint; ``edge_feats`` to zeros (matching
        ``--ignore_edge_feats`` / SNAP-style training); ``events`` (the
        training stream columns) is required only by strategies that query
        an adjacency index (pruning / recursive towers). From a seed-parallel
        checkpoint (``--parallel_runs``: params/memory carry a leading seed
        axis; the index state is shared), ``run_index`` serves one seed and
        ``ensemble=True`` serves ALL seeds as a deep ensemble
        (:class:`EnsemblePredictor` — mean link probability)."""
        from zebra_tpu.train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        cfg = cfg if cfg is not None else ckpt.get("cfg")
        if cfg is None:
            raise ValueError(
                f"{path} predates config-carrying checkpoints; pass cfg="
            )
        as_dev = lambda t: jax.tree.map(jnp.asarray, t)
        params = as_dev(ckpt["params"])
        mem = as_dev(ckpt["mem"])
        if ensemble:
            if cfg.parallel_runs <= 1:
                raise ValueError(
                    "ensemble=True needs a seed-parallel checkpoint "
                    "(--parallel_runs > 1); this one is single-seed"
                )
            if run_index:
                raise ValueError("pass run_index OR ensemble=True, not both")
            cls = EnsemblePredictor
            cfg = cfg.replace(parallel_runs=1, parallel_lr=None)
        elif cfg.parallel_runs > 1:
            if not 0 <= run_index < cfg.parallel_runs:
                raise ValueError(
                    f"run_index {run_index} out of range for a "
                    f"{cfg.parallel_runs}-seed checkpoint"
                )
            pick = lambda t: jax.tree.map(lambda x: x[run_index], t)
            params, mem = pick(params), pick(mem)
            cfg = cfg.replace(parallel_runs=1, parallel_lr=None)
        elif run_index:
            raise ValueError(
                f"run_index {run_index} given, but this checkpoint is "
                "single-seed (no seed axis to select from)"
            )
        index_state = (
            as_dev(ckpt["index_state"]) if ckpt["index_state"] != () else ()
        )
        if edge_feats is None:
            real = cfg.real_edge_feats
            if real is None:
                # pre-flag checkpoint: fall back to the width heuristic —
                # which cannot tell a genuine 1-dim feature from the zero
                # placeholder, so say so
                real = cfg.edge_dim > 1 and not cfg.ignore_edge_feats
                if cfg.edge_dim == 1 and not cfg.ignore_edge_feats:
                    logger.warning(
                        "%s predates feature-provenance tracking and has "
                        "edge_dim=1: cannot tell whether it was trained "
                        "with a real 1-dim edge feature. Scoring with "
                        "zeroed features; pass edge_feats= if the training "
                        "run had a ml_{d}.npy matrix.", path,
                    )
            if real:
                # the model was trained WITH real edge features; scoring
                # with silently-zeroed ones would be finite but wrong
                raise ValueError(
                    f"this checkpoint was trained with {cfg.edge_dim}-dim "
                    "edge features; pass edge_feats= (the training "
                    "ml_{d}.npy matrix)"
                )
            edge_feats = jnp.zeros((cfg.n_edges, cfg.edge_dim), jnp.float32)
        else:
            edge_feats = jnp.asarray(edge_feats, jnp.float32)
        # checkpoint trained with interleaved ids: the caller's event stream
        # is external-id space — relabel once so the adjacency index and the
        # stored base stream live internal (like every row of the restored
        # memory/index state)
        events = _events_to_internal(cfg, events)
        nbr_index = ()
        if cfg.needs_adjacency:
            if events is None:
                raise ValueError(
                    f"tppr_strategy={cfg.tppr_strategy!r} / embedding_module="
                    f"{cfg.embedding_module!r} query an adjacency index; "
                    "pass events=(sources, destinations, timestamps, "
                    "edge_idxs) of the training stream"
                )
            from zebra_tpu.index.neighbor_finder import build_neighbor_index

            nbr_index = build_neighbor_index(
                events[0], events[1], events[2], events[3], cfg.n_nodes
            )
        return cls(cfg, params, mem, index_state, edge_feats, nbr_index,
                   events=events, rebuild_every=rebuild_every,
                   internal_ids=True)

    @classmethod
    def from_trainer(cls, trainer, rebuild_every: int = 1) -> "LinkPredictor":
        n_seeds = getattr(trainer, "_n_seeds", 1)
        if n_seeds > 1 and not cls._stacked:
            raise ValueError(
                "this Trainer is seed-parallel: serve all seeds with "
                "EnsemblePredictor.from_trainer, or one seed via "
                "from_checkpoint(run_index=...)"
            )
        if n_seeds == 1 and cls._stacked:
            raise ValueError(
                "EnsemblePredictor needs a seed-parallel Trainer "
                "(--parallel_runs > 1)"
            )
        copy = lambda t: jax.tree.map(jnp.copy, t) if t != () else ()
        cfg = trainer.cfg
        if cls._stacked:
            cfg = cfg.replace(parallel_runs=1, parallel_lr=None)
        fu = trainer.splits.full
        return cls(
            cfg, copy(trainer.params), copy(trainer.mem),
            copy(trainer.index_state), trainer.edge_feats,
            trainer.full_nbr_index,
            events=(fu.sources, fu.destinations, fu.timestamps, fu.edge_idxs),
            rebuild_every=rebuild_every,
            internal_ids=True,  # the Trainer permuted its splits already
        )

    # ------------------------------------------------------------ adjacency

    def _append_events(self, src, dst, t, eidx) -> None:
        """Queue observed interactions for the adjacency index (no-op for
        the streaming strategy, whose index IS the updated T-PPR state)."""
        if self.nbr_index == ():
            return
        if self._events is None:
            if not self._warned_static:
                logger.warning(
                    "LinkPredictor has no base event stream: observe()d "
                    "interactions update memory%s but NOT the adjacency "
                    "index — pruning/recursive queries will not see them. "
                    "Pass events= (or use from_trainer) to enable index "
                    "folding.",
                    "/T-PPR state" if self.index_state != () else "",
                )
                self._warned_static = True
            return
        self._pending.append(
            (np.asarray(src, np.int64), np.asarray(dst, np.int64),
             np.asarray(t, np.float64), np.asarray(eidx, np.int64))
        )
        self._pending_n += len(src)
        if self._pending_n >= self.rebuild_every:
            self.flush_index()

    def flush_index(self) -> None:
        """Fold all pending observed interactions into the adjacency index
        (host-side rebuild; reference get_neighbor_finder util.py:90-107).
        The arena pads to a bucketed capacity so successive folds keep ONE
        static shape — each new shape would recompile every jitted consumer
        (pruned_topk, _score_candidates), and that compile, not the
        O(E log E) rebuild, would dominate an observe→score cycle."""
        if not self._pending:
            return
        from zebra_tpu.index.neighbor_finder import build_neighbor_index

        cols = [np.concatenate([base] + [p[i] for p in self._pending])
                for i, base in enumerate(self._events)]
        self._events = tuple(cols)
        self._pending, self._pending_n = [], 0
        self.nbr_index = build_neighbor_index(
            cols[0], cols[1], cols[2], cols[3], self.cfg.n_nodes,
            capacity=_arena_capacity(len(cols[0])),
        )

    def _queries(self, src, dst, t, with_neg: bool = True):
        """Read-only T-PPR top-k at the query times: src‖dst‖dst blocks when
        ``with_neg`` (the training layout, for observe()), src‖dst for plain
        scoring — the repeated-dst negative block would only be discarded."""
        if self.cfg.embedding_module != "diffusion":
            return None
        b = len(src)
        cols = [np.asarray(src, np.int32), np.asarray(dst, np.int32)]
        if with_neg:
            cols.append(np.asarray(dst, np.int32))
        n_blocks = len(cols)
        if self.cfg.tppr_strategy == "pruning":
            from zebra_tpu.index.pruning import pruned_topk

            return pruned_topk(
                self.nbr_index,
                jnp.asarray(self.cfg.alpha_list, jnp.float32),
                jnp.asarray(self.cfg.beta_list, jnp.float32),
                jnp.asarray(np.concatenate(cols)),
                jnp.asarray(np.tile(np.asarray(t, np.float32), n_blocks)),
                self.cfg.n_degree, self.cfg.n_layer, self.cfg.topk,
            )
        # streaming: read-only row gather — no state copy, no scan, O(batch)
        # allocation (reference extract_streaming_tppr, util.py:447-469)
        nodes = jnp.stack([jnp.asarray(c) for c in cols], axis=1)
        q = read_topk(
            self.index_state, nodes, jnp.asarray(np.asarray(t, np.float32)),
            self.cfg.n_tppr, self.cfg.topk,
        )
        return TpprQueries(
            *(
                x.transpose(1, 2, 0, 3).reshape(
                    x.shape[1], n_blocks * b, x.shape[3]
                )
                for x in q
            )
        )

    def score(self, src, dst, t) -> np.ndarray:
        """P(interaction) for each (src, dst) candidate at its timestamp.
        ``src``/``dst`` are external node ids (mapped through the
        interleave permutation when the checkpoint used one)."""
        src, dst = self._map_ids(src), self._map_ids(dst)
        q = self._queries(src, dst, t, with_neg=False)
        nodes2 = jnp.asarray(
            np.concatenate([np.asarray(src), np.asarray(dst)]), jnp.int32
        )
        times2 = jnp.asarray(
            np.concatenate([np.asarray(t), np.asarray(t)]), jnp.float32
        )
        return np.asarray(
            _score_candidates(self.cfg, self.params, self.mem,
                              self.edge_feats, nodes2, times2, q,
                              self.nbr_index)
        )

    def observe(self, src, dst, t, eidx) -> None:
        """Ingest observed interactions: stream them through the T-PPR index
        (streaming strategy), fold them into the adjacency index
        (pruning/recursive strategies — see ``rebuild_every``), and apply the
        eval-mode memory protocol (store then commit). External node ids
        (mapped like :meth:`score`)."""
        src, dst = self._map_ids(src), self._map_ids(dst)
        self._append_events(src, dst, t, eidx)
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        t = np.asarray(t, np.float32)
        eidx = np.asarray(eidx, np.int32)
        valid = np.ones(len(src), bool)
        b = len(src)
        q = None
        if self.index_state != ():
            # the extraction emitted by the update scan is pre-edge — exactly
            # the queries an eval forward at these events would see
            self.index_state, q_raw = streaming_scan(
                self.index_state, self._tppr, src, dst, dst, t, eidx, valid
            )
            q = TpprQueries(
                *(
                    x.transpose(1, 2, 0, 3).reshape(x.shape[1], 3 * b, x.shape[3])
                    for x in q_raw
                )
            )
        cfg = self.cfg
        if (q is None and cfg.embedding_module == "diffusion"
                and (cfg.use_source_embedding_in_message
                     or cfg.use_destination_embedding_in_message)):
            q = self._queries(src, dst, t)
        self.mem = self._updated_mem(q, src, dst, t, eidx)

    def _updated_mem(self, q, src, dst, t, eidx):
        """Eval-protocol memory update for observe(); overridden by the
        ensemble to run per member."""
        cfg = self.cfg
        b = len(src)
        src_emb = dst_emb = None
        if (cfg.use_source_embedding_in_message
                or cfg.use_destination_embedding_in_message):
            nodes3 = jnp.asarray(np.concatenate([src, dst, dst]), jnp.int32)
            times3 = jnp.asarray(np.tile(t, 3), jnp.float32)
            emb = _forward(cfg, self.params, self.mem, self.edge_feats,
                           nodes3, times3, q, self.nbr_index, None,
                           train=False)
            src_emb, dst_emb = emb[:b], emb[b : 2 * b]
        return _observe_mem(
            self.cfg, self.params, self.mem, self.edge_feats,
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(t),
            jnp.asarray(eidx), src_emb, dst_emb,
        )


def _observe_mem_impl(cfg, params, mem, edge_feats, src, dst, t, eidx,
                      src_emb=None, dst_emb=None):
    valid = jnp.ones(src.shape[0], bool)
    if cfg.aggregator == "last":
        # fused store+commit — skips the [N,msg]-table round trip,
        # bit-identical (train/step.py:eval_store_commit)
        return eval_store_commit(cfg, params, mem, edge_feats, src, dst, t,
                                 eidx, valid, src_emb, dst_emb)
    mem = _store_messages(cfg, params, mem, edge_feats, src, dst, t, eidx,
                          valid, src_emb, dst_emb)
    positives = jnp.concatenate([src, dst])
    valid2 = jnp.concatenate([valid, valid])
    return _commit_pending(cfg, params, mem, positives, valid2)


_observe_mem = functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("mem",)
)(_observe_mem_impl)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("mem",))
def _observe_mem_ensemble(cfg, params, mem, edge_feats, src, dst, t, eidx,
                          q, nbr_index):
    """Per-member eval-mode memory protocol over the seed axis (the index
    scan and its queries are shared — computed once by the caller)."""
    b = src.shape[0]
    need_emb = (cfg.use_source_embedding_in_message
                or cfg.use_destination_embedding_in_message)

    def one(p, m):
        src_emb = dst_emb = None
        if need_emb:
            nodes3 = jnp.concatenate([src, dst, dst])
            times3 = jnp.concatenate([t, t, t])
            emb = _forward(cfg, p, m, edge_feats, nodes3, times3, q,
                           nbr_index, None, train=False)
            src_emb, dst_emb = emb[:b], emb[b : 2 * b]
        return _observe_mem_impl(cfg, p, m, edge_feats, src, dst, t, eidx,
                                 src_emb, dst_emb)

    return jax.vmap(one)(params, mem)


class EnsemblePredictor(LinkPredictor):
    """Deep-ensemble serving over a seed-parallel snapshot: ``params`` and
    ``mem`` carry the ``[S, ...]`` seed axis of one ``--parallel_runs``
    training pass, the T-PPR / adjacency index is shared (its evolution is
    model-independent), and ``score`` returns the mean link probability of
    the S members from ONE vmapped dispatch. ``observe`` runs the shared
    index scan once and the eval memory protocol per member.

    Build with ``LinkPredictor.from_checkpoint(path, ensemble=True)`` or
    ``EnsemblePredictor.from_trainer(seed_parallel_trainer)``. The reference
    has no ensemble story at all; sequential multi-run training plus ad-hoc
    averaging is the closest it could come."""

    _stacked = True

    @property
    def n_models(self) -> int:
        return int(jax.tree.leaves(self.params)[0].shape[0])

    def score(self, src, dst, t) -> np.ndarray:
        src, dst = self._map_ids(src), self._map_ids(dst)
        q = self._queries(src, dst, t, with_neg=False)
        nodes2 = jnp.asarray(
            np.concatenate([np.asarray(src), np.asarray(dst)]), jnp.int32
        )
        times2 = jnp.asarray(
            np.concatenate([np.asarray(t), np.asarray(t)]), jnp.float32
        )
        return np.asarray(
            _score_ensemble(self.cfg, self.params, self.mem, self.edge_feats,
                            nodes2, times2, q, self.nbr_index)
        )

    def member_scores(self, src, dst, t) -> np.ndarray:
        """Per-member probabilities [S, B] (for calibration / disagreement
        diagnostics; `score` is their mean)."""
        src, dst = self._map_ids(src), self._map_ids(dst)
        q = self._queries(src, dst, t, with_neg=False)
        nodes2 = jnp.asarray(
            np.concatenate([np.asarray(src), np.asarray(dst)]), jnp.int32
        )
        times2 = jnp.asarray(
            np.concatenate([np.asarray(t), np.asarray(t)]), jnp.float32
        )
        score_all = jax.vmap(
            lambda p, m: _score_candidates(self.cfg, p, m, self.edge_feats,
                                           nodes2, times2, q, self.nbr_index)
        )
        return np.asarray(score_all(self.params, self.mem))

    def _updated_mem(self, q, src, dst, t, eidx):
        return _observe_mem_ensemble(
            self.cfg, self.params, self.mem, self.edge_feats,
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(t),
            jnp.asarray(eidx), q, self.nbr_index,
        )
