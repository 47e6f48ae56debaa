"""End-to-end training driver.

Epoch structure and the memory/index backup-restore protocol follow the
reference run loop (reference train.py:149-320, SURVEY.md §3):

per epoch:
  zero the node memory; empty the T-PPR state; train over chronological
  batches (streaming index extracts queries per edge *before* that edge's
  update, negatives included). At the epoch boundary the index state needed
  for validation is simply the end-of-train-scan state — the reference's
  reset + replay of the train stream (train.py:241-244) lands on the
  identical state, so retention replaces recomputation.

validation (reference train.py:249-269):
  flush pending messages once (train→eval transition) → transductive val from
  (train-end memory, train-end index) → snapshot val-end state → restore
  train-end state (unflushed memory, exactly like the reference whose backup
  precedes the flush) → inductive new-node val → restore val-end state.
  Early-stop on transductive val AP; checkpoint at new best epochs.

test (train.py:294-309): transductive test from val-end state of the stopping
epoch (params/memory from the best epoch's checkpoint), then inductive test
from the val-end state again.

The index work runs as chunked on-device scans feeding chunked train/eval
scans — a few host dispatches per epoch; all metric computation stays on
device (see zebra_tpu.ops.metrics).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import Config
from zebra_tpu.data.dataset import Data, DatasetSplits
from zebra_tpu.data.sampler import RandEdgeSampler
from zebra_tpu.index.neighbor_finder import NeighborIndex, build_neighbor_index
from zebra_tpu.index.pruning import pruned_topk
from zebra_tpu.index.streaming import (
    TpprParams,
    TpprQueries,
    TpprState,
    init_tppr_state,
    streaming_scan,
)
from zebra_tpu.models.memory import MemoryState, init_memory
from zebra_tpu.models.tgn import init_tgn_params
from zebra_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from zebra_tpu.train.early_stopping import EarlyStopMonitor
from zebra_tpu.train.step import (
    Batch,
    StepMetrics,
    eval_chunk,
    flush_pending_messages,
    make_optimizer,
    train_chunk,
)

logger = logging.getLogger("zebra_tpu")


@dataclass
class PhaseResult:
    ap: float
    auc: float
    acc: float
    loss: float = 0.0
    seconds: float = 0.0


class Trainer:
    def __init__(
        self,
        cfg: Config,
        splits: DatasetSplits,
        edge_feats: Optional[np.ndarray] = None,
        node_feats: Optional[np.ndarray] = None,
    ):
        # ids are 1-based with 0 as padding; +1 for the sizes (reference
        # train.py:124-125). N rounds up to a multiple of 128 so the per-node
        # tables row-shard evenly over any mesh up to 128 devices; padding
        # rows are never referenced by real ids.
        n_nodes = -(-(splits.n_nodes + 1) // 128) * 128
        cfg = cfg.replace(n_nodes=n_nodes, n_edges=splits.n_edges + 1)
        if edge_feats is None or cfg.ignore_edge_feats:
            edge_feats = np.zeros((cfg.n_edges, 1), np.float32)
        cfg = cfg.replace(edge_dim=edge_feats.shape[1])
        self.cfg = cfg
        self.splits = splits
        self.edge_feats = jnp.asarray(edge_feats, jnp.float32)

        self.tppr_params = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)

        # chunking: index/train chunk of C events = n_b batches of bs
        self.n_b = max(1, cfg.index_chunk // cfg.bs)
        self.chunk = self.n_b * cfg.bs

        # samplers (reference train.py:140-144; the inductive val evaluation
        # reuses the seed-0 val sampler, train.py:266)
        tr, fu = splits.train, splits.full
        self.train_sampler = RandEdgeSampler(tr.sources, tr.destinations)
        self.val_sampler = RandEdgeSampler(fu.sources, fu.destinations, seed=0)
        self.test_sampler = RandEdgeSampler(fu.sources, fu.destinations, seed=2)
        self.nn_test_sampler = RandEdgeSampler(
            splits.new_node_test.sources, splits.new_node_test.destinations, seed=3
        )

        # pruning strategy: train-graph adjacency during training, full-graph
        # during val/test (reference train.py:191, 245)
        if cfg.tppr_strategy == "pruning":
            self.train_nbr_index = build_neighbor_index(
                tr.sources, tr.destinations, tr.timestamps, tr.edge_idxs, cfg.n_nodes
            )
            self.full_nbr_index = build_neighbor_index(
                fu.sources, fu.destinations, fu.timestamps, fu.edge_idxs, cfg.n_nodes
            )

        self.rng = jax.random.PRNGKey(cfg.seed)
        if not cfg.enable_random:
            np.random.seed(cfg.seed)

        self.rng, init_rng = jax.random.split(self.rng)
        self.params = init_tgn_params(init_rng, cfg)
        self.opt_state = make_optimizer(cfg).init(self.params)
        self.mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.message_dim)
        self.index_state = self._fresh_index()

        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        self.checkpoint_path = os.path.join(
            cfg.checkpoint_dir, cfg.run_name() + ".ckpt"
        )

    # ---------------------------------------------------------------- helpers

    def _fresh_index(self) -> Optional[TpprState]:
        if self.cfg.tppr_strategy != "streaming":
            return None
        return init_tppr_state(self.cfg.n_tppr, self.cfg.n_nodes, self.cfg.topk)

    def _pad_chunk(self, arrs: Dict[str, np.ndarray], lo: int, hi: int):
        """Slice [lo, hi) of the stream padded up to the chunk size."""
        c = self.chunk
        pad = c - (hi - lo)
        out = {}
        for name, a in arrs.items():
            sl = a[lo:hi]
            if pad:
                sl = np.concatenate([sl, np.zeros((pad,) + sl.shape[1:], sl.dtype)])
            out[name] = sl
        valid = np.zeros(c, bool)
        valid[: hi - lo] = True
        return out, valid

    def _chunk_queries(
        self,
        index_state: Optional[TpprState],
        nbr_index: Optional[NeighborIndex],
        arrs: Dict[str, np.ndarray],
        valid: np.ndarray,
    ) -> Tuple[Optional[TpprState], TpprQueries]:
        """Index queries for one chunk: streaming scan (stateful) or pruned
        BFS (stateless against the phase's adjacency)."""
        cfg = self.cfg
        if cfg.tppr_strategy == "streaming":
            index_state, queries = streaming_scan(
                index_state,
                self.tppr_params,
                jnp.asarray(arrs["src"]),
                jnp.asarray(arrs["dst"]),
                jnp.asarray(arrs["neg"]),
                jnp.asarray(arrs["t"], jnp.float32),
                jnp.asarray(arrs["eidx"]),
                jnp.asarray(valid),
            )
            return index_state, queries
        # pruning: query all 3 roles at the event time
        c = self.chunk
        nodes = np.stack([arrs["src"], arrs["dst"], arrs["neg"]], axis=1).reshape(-1)
        times = np.repeat(arrs["t"].astype(np.float32), 3)
        q = pruned_topk(
            nbr_index,
            jnp.asarray(cfg.alpha_list, jnp.float32),
            jnp.asarray(cfg.beta_list, jnp.float32),
            jnp.asarray(nodes, jnp.int32),
            jnp.asarray(times),
            cfg.n_degree,
            cfg.n_layer,
            cfg.topk,
        )  # fields [M, 3C, k] → [C, M, 3, k]
        m = q.nbr.shape[0]
        queries = TpprQueries(
            *(x.reshape(m, c, 3, cfg.topk).transpose(1, 0, 2, 3) for x in q)
        )
        return index_state, queries

    def _phase(
        self,
        data: Data,
        sampler: RandEdgeSampler,
        train: bool,
        index_state: Optional[TpprState],
        nbr_index: Optional[NeighborIndex] = None,
    ) -> Tuple[Optional[TpprState], PhaseResult]:
        """Run one pass (train or eval) over a chronological stream."""
        cfg = self.cfg
        t0 = time.time()
        if sampler.seed is not None:
            sampler.reset_random_state()  # reference evaluation.py:10

        n = data.n_interactions
        stream = {
            "src": data.sources.astype(np.int32),
            "dst": data.destinations.astype(np.int32),
            "t": data.timestamps.astype(np.float32),
            "eidx": data.edge_idxs.astype(np.int32),
        }
        metric_sums = np.zeros(4)  # loss, ap, auc, acc
        n_batches = 0

        for lo in range(0, n, self.chunk):
            hi = min(lo + self.chunk, n)
            arrs, valid = self._pad_chunk(stream, lo, hi)
            _, negs = sampler.sample(hi - lo)
            arrs["neg"] = np.concatenate(
                [negs.astype(np.int32), np.zeros(self.chunk - (hi - lo), np.int32)]
            )

            index_state, queries = self._chunk_queries(
                index_state, nbr_index, arrs, valid
            )
            batch = Batch(
                src=jnp.asarray(arrs["src"]),
                dst=jnp.asarray(arrs["dst"]),
                neg=jnp.asarray(arrs["neg"]),
                t=jnp.asarray(arrs["t"]),
                eidx=jnp.asarray(arrs["eidx"]),
                valid=jnp.asarray(valid),
            )
            if train:
                self.rng, step_rng = jax.random.split(self.rng)
                self.params, self.opt_state, self.mem, metrics = train_chunk(
                    cfg, self.n_b, self.params, self.opt_state, self.mem,
                    step_rng, self.edge_feats, batch, queries,
                )
            else:
                self.mem, metrics = eval_chunk(
                    cfg, self.n_b, self.params, self.mem,
                    self.edge_feats, batch, queries,
                )

            # only batches containing real events count toward the means
            real_batches = -(-(hi - lo) // cfg.bs)
            ms = jax.tree.map(lambda x: np.asarray(x[:real_batches]), metrics)
            metric_sums += [ms.loss.sum(), ms.ap.sum(), ms.auc.sum(), ms.acc.sum()]
            n_batches += real_batches

        mean = metric_sums / max(n_batches, 1)
        return index_state, PhaseResult(
            loss=float(mean[0]), ap=float(mean[1]), auc=float(mean[2]),
            acc=float(mean[3]), seconds=time.time() - t0,
        )

    # ---------------------------------------------------------------- epochs

    def train_epoch(self) -> PhaseResult:
        """One training epoch from zeroed memory and empty index (reference
        train.py:188-227)."""
        cfg = self.cfg
        self.mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.message_dim)
        self.index_state = self._fresh_index()
        nbr_index = (
            self.train_nbr_index if cfg.tppr_strategy == "pruning" else None
        )
        self.index_state, result = self._phase(
            self.splits.train, self.train_sampler, True, self.index_state, nbr_index
        )
        return result

    def validate(self) -> Tuple[PhaseResult, PhaseResult]:
        """Transductive + inductive validation with the backup/restore dance
        (reference train.py:249-269). Leaves (mem, index) at the val-end
        state so test can continue from it."""
        cfg = self.cfg
        nbr_index = self.full_nbr_index if cfg.tppr_strategy == "pruning" else None

        train_mem = self.mem  # backup precedes the flush, like the reference
        train_idx = self.index_state

        # one-time train→eval flush (reference tgn_model.py:143-146)
        self.mem = flush_pending_messages(cfg, self.params, _copy(self.mem))

        self.index_state, trans = self._phase(
            self.splits.val, self.val_sampler, False, _copy(train_idx), nbr_index
        )
        val_mem, val_idx = self.mem, self.index_state

        # inductive val from the (unflushed) train-end state, seed-0 sampler
        # (reference train.py:261-266)
        self.mem = _copy(train_mem)
        _, induct = self._phase(
            self.splits.new_node_val, self.val_sampler, False, _copy(train_idx),
            nbr_index,
        )

        self.mem, self.index_state = val_mem, val_idx
        return trans, induct

    def test(self) -> Tuple[PhaseResult, PhaseResult]:
        """Transductive + inductive test from the val-end state (reference
        train.py:294-309)."""
        cfg = self.cfg
        nbr_index = self.full_nbr_index if cfg.tppr_strategy == "pruning" else None
        val_mem, val_idx = self.mem, self.index_state

        self.mem = _copy(val_mem)  # eval_chunk donates self.mem
        self.index_state, trans = self._phase(
            self.splits.test, self.test_sampler, False, _copy(val_idx), nbr_index
        )

        self.mem = _copy(val_mem)
        _, induct = self._phase(
            self.splits.new_node_test, self.nn_test_sampler, False, _copy(val_idx),
            nbr_index,
        )
        return trans, induct

    # ---------------------------------------------------------------- run

    def fit(self, n_epoch: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        n_epoch = n_epoch or cfg.n_epoch
        stopper = EarlyStopMonitor(max_round=cfg.patience)
        stop_epoch = -1

        for epoch in range(n_epoch):
            tr = self.train_epoch()
            trans, induct = self.validate()
            logger.info(
                "epoch: %d, train: %.2fs, val: %.2fs", epoch + 1, tr.seconds,
                trans.seconds + induct.seconds,
            )
            logger.info(
                "train auc: %f, train ap: %f, train acc: %f, train loss: %f",
                tr.auc, tr.ap, tr.acc, tr.loss,
            )
            logger.info("val auc: %f, new node val auc: %f", trans.auc, induct.auc)
            logger.info("val ap: %f, new node val ap: %f", trans.ap, induct.ap)
            logger.info("val acc: %f, new node val acc: %f", trans.acc, induct.acc)

            if stopper.early_stop_check(trans.ap):
                stop_epoch = epoch + 1
                ckpt = load_checkpoint(self.checkpoint_path)
                self.params, self.mem = ckpt["params"], ckpt["mem"]
                break
            if epoch == stopper.best_epoch:
                save_checkpoint(
                    self.checkpoint_path, {"params": self.params, "mem": self.mem}
                )

        t_trans, t_induct = self.test()
        logger.info(
            "Test statistics: Old nodes -- auc: %f, ap: %f, acc: %f",
            t_trans.auc, t_trans.ap, t_trans.acc,
        )
        logger.info(
            "Test statistics: New nodes -- auc: %f, ap: %f, acc: %f",
            t_induct.auc, t_induct.ap, t_induct.acc,
        )
        if not cfg.save_best and os.path.exists(self.checkpoint_path):
            os.remove(self.checkpoint_path)
        return {
            "test_ap": t_trans.ap,
            "test_auc": t_trans.auc,
            "test_acc": t_trans.acc,
            "nn_test_ap": t_induct.ap,
            "nn_test_auc": t_induct.auc,
            "nn_test_acc": t_induct.acc,
            "stop_epoch": float(stop_epoch),
        }


def _copy(tree):
    """Deep-copy a device pytree (the scans donate their inputs, so retained
    snapshots must not alias them)."""
    if tree is None:
        return None
    return jax.tree.map(jnp.copy, tree)
