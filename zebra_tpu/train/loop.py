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

test (train.py:294-309): transductive test from the val-end state of the
stopping epoch (params/memory from the best epoch's checkpoint), then
inductive test from the val-end state again.

Every phase is ONE fused jitted program (``zebra_tpu.train.phase.run_phase``)
— index, towers, optimizer, and metrics all on device; streams upload once
at construction. Negatives are drawn on host with the reference's sampler
semantics (train.py:140-144, numpy RandomState seeds 0/2/3; inductive val
reuses the val sampler, train.py:266): eval negatives are therefore fixed
per phase and drawn once at construction, train negatives are redrawn every
epoch — and being host-resident they feed the wave scheduler of the
parallel index scan."""

from __future__ import annotations

import functools
import logging
import os
import time
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zebra_tpu.config import Config
from zebra_tpu.data.dataset import Data, DatasetSplits
from zebra_tpu.index.neighbor_finder import build_neighbor_index
from zebra_tpu.index.streaming import TpprState, init_tppr_state
from zebra_tpu.models.memory import init_memory
from zebra_tpu.models.tgn import init_tgn_params
from zebra_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from zebra_tpu.train.early_stopping import EarlyStopMonitor
from zebra_tpu.data.sampler import RandEdgeSampler
from zebra_tpu.index.streaming import TpprParams
from zebra_tpu.index.waves import wave_flat_index, wave_scan_chunk
from zebra_tpu.train.phase import (
    Stream,
    run_phase,
    run_phase_fused,
    run_phase_seeds,
)
from zebra_tpu.train.step import flush_pending_messages, make_optimizer
from zebra_tpu.utils.profiling import PhaseTimers, trace_context

logger = logging.getLogger("zebra_tpu")


def resolve_owner_aligned(cfg: Config) -> bool:
    """Owner-aligned wave scheduling policy. Explicit flag wins; auto (None)
    enables it only under multi-PROCESS execution: alignment exists to keep
    src-row reads on the owning HOST (the wave executors read their lane
    block's rows locally instead of pulling them over DCN), which is exactly
    the multi-process case — while its cost, wave-count inflation under node
    skew (every shard's hottest node serializes its own lane block; study in
    docs/SCALING.md), is paid on any mesh. Single-process meshes ride
    HBM/ICI for row traffic, so auto keeps alignment off there."""
    if cfg.owner_aligned_waves is not None:
        return cfg.owner_aligned_waves
    return jax.process_count() > 1

# eval negative-sampling seeds (reference train.py:141-144; inductive val
# shares the val sampler, train.py:266)
SEED_VAL, SEED_TEST, SEED_NN_TEST = 0, 2, 3


@dataclass
class PhaseResult:
    ap: float
    auc: float
    acc: float
    loss: float = 0.0
    seconds: float = 0.0
    index_seconds: float = 0.0  # time in the T-PPR index machinery
                                # (reference logs 'tppr: {t}', train.py:275).
                                # On the fused wave path this is host
                                # scheduling only (the device scan fuses into
                                # the phase program); run with --profile for
                                # the exact host+device split
    overflow: float = 0.0       # >0: some batch overflowed the lazy-update
                                # compaction cap (train/step.py) and the
                                # epoch's numbers are from the compacted
                                # path; train_epoch reruns it per-position


class PhaseStream(NamedTuple):
    """A phase's uploaded stream plus its padding geometry. ``n_chunks`` is
    the wave-pipeline superchunk count the padding was computed for — the
    consumer must reuse it rather than re-deriving it from the padded length
    (the two can disagree, leaving chunks that are not whole batches)."""

    stream: Stream
    n_batches: int       # padded batch count (= per_chunk * n_chunks)
    real_batches: int    # batches containing any real events
    n_chunks: int


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
        real_edge_feats = edge_feats is not None and not cfg.ignore_edge_feats
        if edge_feats is None or cfg.ignore_edge_feats:
            edge_feats = np.zeros((cfg.n_edges, 1), np.float32)
        cfg = cfg.replace(edge_dim=edge_feats.shape[1],
                          real_edge_feats=real_edge_feats)
        if node_feats is not None and not cfg.ignore_node_feats:
            # matches the reference's active path, which passes
            # node_features=None to the diffusion module and uses memory
            # rows as node representations (reference tgn_model.py:85,
            # embedding_module.py:253) — but a user shipping a real
            # ml_{d}_node.npy should know it is not consumed
            logger.warning(
                "node_feats provided but not used: every embedding module "
                "represents nodes by their memory rows, like the "
                "reference's active path (tgn_model.py:85). Pass "
                "--ignore_node_feats to silence."
            )
        self.cfg = cfg
        self.splits = splits

        # multi-device: replicate params/optimizer, row-shard the per-node
        # tables; XLA inserts the collectives inside the fused phases
        # (SURVEY.md §7 — all-new design, the reference is single-GPU).
        # Built before any device upload: under multi-CONTROLLER execution
        # every upload must be an explicitly global (replicated) array —
        # a plain jnp.asarray is process-local and cannot feed a jit that
        # spans processes (see _to_dev).
        self._mesh = None
        if cfg.n_devices > 1 or (cfg.n_devices == 0 and len(jax.devices()) > 1):
            from zebra_tpu.parallel import make_mesh

            self._mesh = make_mesh(cfg.n_devices)
        self._multiproc = (
            self._mesh is not None
            and len(set(d.process_index for d in self._mesh.devices.flat)) > 1
        )

        # node-id interleaving for owner-aligned sharding: relabel ids
        # round-robin across the mesh's shards so the aligned scheduler's
        # lane blocks stay balanced under bipartite (JODIE) numbering,
        # which otherwise lands EVERY src in shard 0 (2.00× wave inflation
        # at 2 shards — docs/SCALING.md study; no reference analogue, its
        # preprocess numbering at preprocess_data.py:37-61 CAUSES the
        # skew). Auto: on iff owner-aligned scheduling is active on a
        # >1-shard mesh. The permutation is deterministic in
        # (n_nodes, n_shards); cfg.interleave_shards rides in checkpoints
        # so serving maps external ids the same way (serve.py).
        n_shards_mesh = self._mesh.devices.size if self._mesh is not None else 1
        use_il = cfg.interleave_node_ids
        if use_il is None:
            # auto-on only where owner alignment actually runs: single-seed
            # row sharding on a >1-shard mesh (seed-sharded runs replicate
            # the index — _wave_scheds keeps n_shards=1 there)
            use_il = (n_shards_mesh > 1 and int(cfg.parallel_runs) <= 1
                      and resolve_owner_aligned(cfg))
        self._id_perm = None
        # negative SAMPLERS stay in original id space: RandEdgeSampler draws
        # indices into the SORTED unique-node array (reference util.py:74),
        # and relabeling changes that sort order — samplers built on the
        # permuted stream would pick different nodes per draw and break the
        # permuted ≡ unpermuted equivalence. Draws map through the
        # permutation afterwards (_neg_ids), making draw i exactly
        # perm[unpermuted draw i].
        sampler_splits = splits
        if use_il and n_shards_mesh > 1:
            from zebra_tpu.parallel import interleave_permutation

            self._id_perm = interleave_permutation(cfg.n_nodes, n_shards_mesh)
            cfg = cfg.replace(interleave_shards=n_shards_mesh)
            splits = _permute_splits(splits, self._id_perm)
            self.cfg, self.splits = cfg, splits
            logger.info(
                "node ids interleaved over %d shards for owner-aligned "
                "scheduling (--no_interleave_node_ids to disable)",
                n_shards_mesh,
            )
        elif cfg.interleave_node_ids and n_shards_mesh <= 1:
            logger.warning(
                "--interleave_node_ids has no effect without a >1-device "
                "mesh (the permutation exists to balance owner-aligned "
                "lane blocks across shards); running with raw ids"
            )

        # seed-parallel training: S independent runs (cfg.seed + s) advance
        # together, vmapped over a leading seed axis (run_phase_seeds); ONE
        # index scan serves all seeds (negatives are extraction-only)
        self._n_seeds = max(1, int(cfg.parallel_runs))
        if self._n_seeds > 1:
            if self._mesh is not None:
                # seed-sharded execution: whole seeds per device over the
                # flat [S·N, ·] tables (train/phase.py:
                # _run_phase_seeds_sharded) — embarrassingly parallel, no
                # collectives inside the train scan; the shared index/
                # adjacency state replicates
                n_dev = self._mesh.devices.size
                if self._n_seeds % n_dev:
                    raise ValueError(
                        f"parallel_runs ({self._n_seeds}) must be a "
                        f"multiple of the mesh size ({n_dev}): the seed "
                        f"axis shards whole seeds per device"
                    )
            if cfg.fused_dispatch:
                raise ValueError(
                    "parallel_runs > 1 does not support --fused_dispatch "
                    "(the split two-dispatch pipeline is the production "
                    "path; the fused program has no seed-parallel variant)"
                )
        if cfg.parallel_lr is not None:
            if self._n_seeds == 1:
                raise ValueError(
                    "--parallel_lr requires --parallel_runs > 1 (use --lr "
                    "for a single run)"
                )
            if len(cfg.parallel_lr) != self._n_seeds:
                raise ValueError(
                    f"--parallel_lr needs one value per parallel run: got "
                    f"{len(cfg.parallel_lr)} for {self._n_seeds} runs"
                )

        self._check_hbm_budget()
        self.edge_feats = self._to_dev(np.asarray(edge_feats, np.float32))

        # samplers (reference train.py:140-144; inductive val reuses the val
        # sampler, train.py:266) — built from the ORIGINAL-id splits; draws
        # map through the interleave permutation at use (_neg_ids above)
        tr, fu = sampler_splits.train, sampler_splits.full
        self.train_sampler = RandEdgeSampler(tr.sources, tr.destinations)
        self.val_sampler = RandEdgeSampler(fu.sources, fu.destinations,
                                           seed=SEED_VAL)
        self.test_sampler = RandEdgeSampler(fu.sources, fu.destinations,
                                            seed=SEED_TEST)
        self.nn_test_sampler = RandEdgeSampler(
            sampler_splits.new_node_test.sources,
            sampler_splits.new_node_test.destinations,
            seed=SEED_NN_TEST,
        )

        # The full chronological stream uploads ONCE; every phase stream is a
        # device-side gather of its (padded) event positions — per phase only
        # an int32 index vector, the negatives, and the valid mask cross
        # host→device (~9 B/event vs ~17 for re-uploading the columns, and
        # train/val/test would otherwise re-ship slices of the same events).
        # Host (numpy) copies feed the wave scheduler with no device
        # readback. Eval negatives are deterministic per phase (seeded
        # sampler, reset before each pass — reference evaluation.py:9-10), so
        # they are drawn once here; the train stream's negatives are redrawn
        # every epoch.
        fu_full = splits.full
        self._full_dev = (
            self._to_dev(np.asarray(fu_full.sources, np.int32)),
            self._to_dev(np.asarray(fu_full.destinations, np.int32)),
            self._to_dev(np.asarray(fu_full.timestamps, np.float32)),
            self._to_dev(np.asarray(fu_full.edge_idxs, np.int32)),
        )
        max_eidx = int(np.max(fu_full.edge_idxs)) if fu_full.n_interactions else 0
        self._pos_of_eidx = np.zeros(max_eidx + 1, np.int64)
        self._pos_of_eidx[np.asarray(fu_full.edge_idxs, np.int64)] = np.arange(
            fu_full.n_interactions
        )

        self._streams: Dict[str, PhaseStream] = {}
        self._host_streams: Dict[str, Dict[str, np.ndarray]] = {}
        for name, data, sampler in (
            ("train", splits.train, None),
            ("val", splits.val, self.val_sampler),
            ("test", splits.test, self.test_sampler),
            ("nn_val", splits.new_node_val, self.val_sampler),
            ("nn_test", splits.new_node_test, self.nn_test_sampler),
        ):
            self._streams[name], self._host_streams[name] = (
                self._upload_stream(data, sampler)
            )

        # adjacency indices: pruning queries and the recursive towers use the
        # train graph during training and the full graph during val/test
        # (reference train.py:191, 245). Built from ``splits`` — the
        # INTERNAL (possibly interleave-permuted) id space the streams
        # query with — NOT the raw-id sampler_splits above.
        if cfg.needs_adjacency:
            tr_i, fu_i = splits.train, splits.full
            self.train_nbr_index = build_neighbor_index(
                tr_i.sources, tr_i.destinations, tr_i.timestamps,
                tr_i.edge_idxs, cfg.n_nodes,
            )
            self.full_nbr_index = build_neighbor_index(
                fu_i.sources, fu_i.destinations, fu_i.timestamps,
                fu_i.edge_idxs, cfg.n_nodes,
            )
        else:
            self.train_nbr_index = self.full_nbr_index = ()

        self._tppr_params = TpprParams.create(
            cfg.alpha_list, cfg.beta_list, cfg.topk
        )
        # the fused Pallas merge runs compiled only on TPU backends
        # (elsewhere it would fall to the slow interpreter), and only for
        # configurations the backend compiler accepts — measured on v5e,
        # k=40 crashes the TPU compile helper while k≤20 is fine, so probe
        # once (seconds, persistent-cache-hit afterwards) and fall back to
        # the bit-identical XLA merge instead of crashing the run
        self._use_pallas = bool(
            cfg.pallas_merge and jax.default_backend() == "tpu"
        )
        self._pallas_block = 0
        # only the streaming-diffusion wave path runs the merge kernel —
        # other configs skip the probe (it costs real backend compiles)
        if cfg.embedding_module != "diffusion" or cfg.tppr_strategy != "streaming":
            self._use_pallas = False
        if self._use_pallas:
            from zebra_tpu.index.pallas_merge import resolve_pallas_block

            block = resolve_pallas_block(self._tppr_params, cfg.wave_cap)
            if jax.process_count() > 1:
                # every process must compile the SAME global program: a
                # transient probe failure on one host would otherwise pick a
                # different kernel form and deadlock the first collective —
                # process 0's outcome wins (same pattern as _neg_base)
                from jax.experimental import multihost_utils

                block = int(multihost_utils.broadcast_one_to_all(
                    np.int64(-1 if block is None else block)
                ))
                block = None if block < 0 else block
            if block is None:
                logger.warning(
                    "Pallas merge kernel does not compile for M=%d, k=%d "
                    "on this backend at any block size; using the XLA "
                    "merge (bit-identical, slower index scan)",
                    cfg.n_tppr, cfg.topk,
                )
                self._use_pallas = False
            else:
                self._pallas_block = block
                if block:
                    logger.info(
                        "Pallas merge gridded into %d-lane blocks for "
                        "M=%d, k=%d (single-block form exceeds this "
                        "backend's compiler)", block, cfg.n_tppr, cfg.topk,
                    )
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
        self.rng = self._to_dev(np.asarray(jax.random.PRNGKey(cfg.seed)))
        if not cfg.enable_random:
            np.random.seed(cfg.seed)

        if self._n_seeds == 1:
            self.rng, init_rng = jax.random.split(self.rng)
            self.params = init_tgn_params(init_rng, cfg)
            self.opt_state = make_optimizer(cfg).init(self.params)
        else:
            # per-seed inits exactly as S separate Trainers with
            # cfg.seed = seed + s would build them (the CLI's sequential
            # --n_runs loop uses the same seed schedule, train.py:73)
            opt = make_optimizer(cfg)
            rngs, plist, olist = [], [], []
            for s in range(self._n_seeds):
                r, init_r = jax.random.split(jax.random.PRNGKey(cfg.seed + s))
                p = init_tgn_params(init_r, cfg)
                rngs.append(r)
                plist.append(p)
                o = opt.init(p)
                if cfg.parallel_lr is not None:
                    # seed s's lr rides its optimizer state; the vmapped
                    # update reads it per lane (make_optimizer injects)
                    o = o._replace(hyperparams={
                        **o.hyperparams,
                        "learning_rate": jnp.asarray(
                            cfg.parallel_lr[s], jnp.float32
                        ),
                    })
                olist.append(o)
            self.rng = _stack_seed_trees(rngs)
            self.params = _stack_seed_trees(plist)
            self.opt_state = _stack_seed_trees(olist)
        self.mem = self._fresh_mem()
        self.index_state = self._fresh_index()
        self._apply_shardings()

        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        self.checkpoint_path = os.path.join(
            cfg.checkpoint_dir, cfg.run_name() + ".ckpt"
        )

        # mid-epoch resume bookkeeping (wave path): this epoch's negatives,
        # per-epoch dropout key, and the next superchunk to run
        self._epoch_negs: Optional[np.ndarray] = None
        self._epoch_rng = None
        self._chunk_cursor = 0
        # per-epoch train negatives derive from (base, epoch) so epoch e+1's
        # draw + wave schedule + H2D upload can happen while the device still
        # runs epoch e (the tunnel's H2D is the dominant host-side cost);
        # base is deterministic under --seed, random under --enable_random
        if self._n_seeds == 1:
            self._neg_base = int(np.random.randint(0, 2**31 - 1))
        elif cfg.enable_random:
            self._neg_base = np.random.randint(
                0, 2**31 - 1, self._n_seeds
            ).astype(np.int64)
        else:
            # seed s's base = the first draw a single Trainer with
            # cfg.seed = seed + s would make (np.random.seed(seed_s) then
            # randint — identical to RandomState(seed_s).randint)
            self._neg_base = np.asarray(
                [np.random.RandomState(cfg.seed + s).randint(0, 2**31 - 1)
                 for s in range(self._n_seeds)], np.int64,
            )
        if jax.process_count() > 1:
            # multi-controller JAX requires every process to feed identical
            # global arrays: under --enable_random each process would draw a
            # different base (np.random is unseeded), so broadcast process
            # 0's — negatives and wave schedules then agree everywhere
            from jax.experimental import multihost_utils

            nb = multihost_utils.broadcast_one_to_all(
                np.asarray(self._neg_base, np.int64)  # [] or [S] (seeds)
            )
            self._neg_base = (
                np.asarray(nb, np.int64) if np.ndim(nb) else int(nb)
            )
        self._epoch_id = 0
        self._train_prefetch = None
        # eval negatives are fixed per phase, so their wave schedules (and
        # the uploaded flat slot vectors) are computed once and reused
        self._eval_scheds: Dict[str, list] = {}
        # per-stream wave-count high-water mark (see _wave_scheds)
        self._wave_hwm: Dict[str, int] = {}
        # sticky switch to the per-position lazy-update path after a batch
        # overflows the unique compaction cap (train/step.py:make_lazy_plan);
        # the overflowing epoch itself is rerun exactly (train_epoch)
        self._lazy_fallback = False
        # early-stop monitor fields riding along in save_state (set around
        # fit's periodic checkpoint; restored by fit(resume_from=...))
        self._fit_state: Optional[Dict] = None
        # cooperative preemption flag (request_stop / the CLI's SIGTERM
        # handler): the train superchunk loop exits at the next chunk
        # boundary and fit saves a resumable full-state checkpoint
        self._stop_requested = False

    def request_stop(self) -> None:
        """Ask the running ``fit`` to stop at the next superchunk boundary
        and write a resumable full-state checkpoint (the graceful-preemption
        hook — the CLI wires SIGTERM to this). Safe from signal handlers:
        only sets a flag."""
        self._stop_requested = True

    @staticmethod
    def _stopper_state(stopper) -> Dict:
        """EarlyStopMonitor fields that ride in save_state (ONE definition —
        fit's periodic and preemption checkpoints must stay in sync)."""
        return {
            "num_round": stopper.num_round,
            "epoch_count": stopper.epoch_count,
            "best_epoch": stopper.best_epoch,
            "last_best": stopper.last_best,
        }

    @classmethod
    def _seed_stopper_state(cls, stoppers, stopped, stop_epoch) -> Dict:
        return {"per_seed": [
            dict(cls._stopper_state(st),
                 stopped=stopped[s], stop_epoch=stop_epoch[s])
            for s, st in enumerate(stoppers)
        ]}

    # ---------------------------------------------------------------- helpers

    def _to_dev(self, x):
        """Upload a host array as the phases expect it: a plain device put
        single-controller, an explicitly GLOBAL replicated array when the
        mesh spans processes (multi-controller jits reject process-local
        inputs; every process calls this with identical host data — the
        negative-base broadcast in __init__ guarantees it for the one
        nondeterministic input)."""
        if self._multiproc:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                x, NamedSharding(self._mesh, PartitionSpec())
            )
        return jnp.asarray(x)

    def _apply_shardings(self):
        if self._mesh is None:
            return
        from zebra_tpu.parallel import (
            replicate,
            shard_index_state,
            shard_memory,
            shard_params,
            shard_seed_trees,
        )

        if self._n_seeds > 1:
            # seed-sharded: per-seed state splits on the leading [S] axis
            # (whole seeds per device); the index is seed-independent and
            # replicates (each device runs the wave scan redundantly —
            # collective-free)
            self.params = shard_seed_trees(self.params, self._mesh)
            self.opt_state = shard_seed_trees(self.opt_state, self._mesh)
            self.mem = shard_seed_trees(self.mem, self._mesh)
            self.rng = shard_seed_trees(self.rng, self._mesh)
            self.index_state = replicate(self.index_state, self._mesh)
            return
        self.params = shard_params(self.params, self._mesh)
        self.opt_state = shard_params(self.opt_state, self._mesh)
        self.mem = shard_memory(self.mem, self._mesh)
        self.index_state = shard_index_state(self.index_state, self._mesh)

    def _fresh_index(self):
        cfg = self.cfg
        if cfg.embedding_module != "diffusion" or cfg.tppr_strategy != "streaming":
            return ()
        return init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk)

    def _fresh_mem(self):
        """Zeroed node memory; leading seed axis when seed-parallel."""
        cfg = self.cfg
        mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim,
                          jnp.dtype(cfg.message_dtype),
                          jnp.dtype(cfg.memory_dtype))
        if self._n_seeds > 1:
            mem = jax.tree.map(
                lambda x: jnp.zeros((self._n_seeds,) + x.shape, x.dtype), mem
            )
        return mem

    def _split_rng(self):
        """(next rng, epoch rng); per seed when seed-parallel. vmapped split
        equals per-key split for both PRNG impls (tested)."""
        if self._n_seeds == 1:
            return jax.random.split(self.rng)
        pair = jax.vmap(jax.random.split)(self.rng)   # [S, 2, key]
        return pair[:, 0], pair[:, 1]

    def _fold_rng(self, rng, ci: int):
        if self._n_seeds == 1:
            return jax.random.fold_in(rng, ci)
        return jax.vmap(lambda k: jax.random.fold_in(k, ci))(rng)

    def _check_hbm_budget(self):
        """Fail loudly (before any epoch) when the run's per-device node
        tables cannot fit the accelerator's HBM — it would otherwise die in
        an opaque allocator error mid-protocol. The binding requirement is
        validate(): its backup/restore holds THREE table copies at once
        (see the ×3 below); streams/params are comparatively negligible
        but un-modeled scratch eats ~20% of HBM (the 0.8 usable line).

        Also resolves ``cfg.host_backup``'s auto mode (``self._host_backup``):
        when the 3-copy protocol busts the budget but a 2-copy one fits,
        the val/test backups move to host RAM instead of failing."""
        cfg = self.cfg
        self._host_backup = bool(cfg.host_backup)
        if self._host_backup and self._multiproc:
            raise ValueError(
                "--host_backup is not supported under multi-process "
                "execution (the backup device_get needs fully-addressable "
                "arrays); shard over fewer hosts or run without it"
            )
        try:
            dev = jax.devices()[0]
        except Exception:
            return
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None  # backends that RAISE instead of returning None
        limit = (stats or {}).get("bytes_limit")
        if not limit:
            if dev.platform != "tpu":
                return  # CPU / backend without accounting
            # tunneled TPU backends report no memory_stats — fall back to
            # the known per-chip HBM of the attached generation
            limit = _tpu_hbm_bytes(dev.device_kind)
        n_dev = self._mesh.devices.size if self._mesh is not None else 1
        s_local = -(-self._n_seeds // n_dev)
        n_rows = cfg.n_nodes if self._n_seeds > 1 else (
            -(-cfg.n_nodes // n_dev)  # single-seed row sharding
        )
        per_row = (
            cfg.memory_dim * jnp.dtype(cfg.memory_dtype).itemsize
            + (cfg.msg_table_dim + 1) * jnp.dtype(cfg.message_dtype).itemsize
            + 3 * 4  # last_update, msg_ts, msg_count (f32)
        )
        tables = s_local * n_rows * per_row
        index = 0
        if cfg.embedding_module == "diffusion" and cfg.tppr_strategy == "streaming":
            # flat packed rows [N, M(4k+1)] f32, replicated under seed
            # sharding, row-sharded single-seed
            index = n_rows * cfg.n_tppr * (4 * cfg.topk + 1) * 4
        # the binding term is validate()'s backup/restore protocol, which
        # holds THREE table copies at once (train-end backup + flushed
        # working copy + the phase's donation partner; reference
        # train.py:249-269 — measured: S=8 × 1.14M nodes trains at 0.47×
        # but OOMs 16 GiB exactly here, RESULTS.md round 5); the index is
        # backed up once alongside
        # usable budget ≈ 0.8·HBM: the un-modeled residents (phase scan
        # scratch, uploaded streams + query buffers, XLA temp fusions)
        # measured ~2-3 GiB at Wiki-Talk scale — S=6×1.14M (est 13.2 GiB,
        # 82% of 16) still OOMs validate on the v5e while S=4 (9.3 GiB,
        # 58%) runs clean, so the 0.8 line separates the measured points
        est3 = 3 * tables + 2 * index
        est2 = 2 * tables + 2 * index  # host-resident backups
        usable = 0.8 * limit
        if (cfg.host_backup is None and not self._host_backup
                and not self._multiproc
                and est3 > usable >= est2):
            self._host_backup = True
            logger.info(
                "val/test table backups will live in host RAM "
                "(--host_backup auto: the 3-copy protocol needs "
                "~%.1f GiB of the usable ~%.1f GiB HBM, 2 copies fit; "
                "--no_host_backup forces the all-device protocol)",
                est3 / 2**30, usable / 2**30,
            )
        est = est2 if self._host_backup else est3
        if est > usable:
            copies = 2 if self._host_backup else 3
            raise ValueError(
                f"node-table HBM budget exceeded: ~{est / 2**30:.1f} GiB "
                f"estimated per device ({s_local} seed(s) × {n_rows} rows × "
                f"{per_row} B, ×{copies} for the val/test backup/restore "
                f"protocol, + index ×2) vs a usable "
                f"~{usable / 2**30:.1f} GiB of {limit / 2**30:.1f} GiB HBM "
                f"(the rest is scan scratch / stream buffers — measured "
                f"margin, RESULTS.md round 5). The val phase would die in "
                f"the allocator. Reduce --parallel_runs, shard seeds over "
                f"more devices (--n_devices), or shrink "
                f"--memory_dim/--topk."
            )
        if est > 0.6 * limit:
            logger.warning(
                "node tables estimated at %.1f GiB of %.1f GiB device HBM "
                "(%.0f%%) — close to the ceiling; expect allocator pressure",
                est / 2**30, limit / 2**30, 100 * est / limit,
            )

    def _neg_ids(self, negs: np.ndarray) -> np.ndarray:
        """Sampler draws (original id space) → internal row ids (the
        interleave permutation when active — see the sampler note in
        __init__)."""
        if self._id_perm is None:
            return negs
        return self._id_perm[negs]

    def _negs_to_dev(self, negs: np.ndarray):
        """Upload train negatives: [E] as-is; seed-parallel [S, E] uploads in
        the phases' [E, S] device layout."""
        if negs.ndim == 1:
            return self._to_dev(negs)
        return self._to_dev(np.ascontiguousarray(negs.T))

    def _flush_mem(self, donate: bool = False):
        """Train→eval flush of all pending messages; per seed when
        seed-parallel (reference update_memory_in_test). ``donate=True``
        consumes ``self.mem``'s buffers instead of copying — used by the
        host-backup protocol, where the pre-flush state already lives in
        host RAM and keeping a device copy would defeat the point."""
        cfg = self.cfg
        mem = self.mem if donate else _copy(self.mem)
        if self._n_seeds == 1:
            return flush_pending_messages(cfg, self.params, mem)
        if self._mesh is not None:
            return _flush_mem_seeds_sharded(cfg, self._mesh, self.params, mem)
        return _flush_mem_seeds(cfg, self.params, mem)

    def _mem_to_host(self):
        """D2H snapshot of the memory tables (the host-backup protocol's
        backup copy). Blocking; numpy pytree."""
        return jax.tree.map(np.asarray, self.mem)

    def _mem_from_host(self, host_mem):
        """Upload a host memory snapshot back to its training sharding."""
        mem = jax.tree.map(self._to_dev, host_mem)
        if self._mesh is None:
            return mem
        from zebra_tpu.parallel import shard_memory, shard_seed_trees

        if self._n_seeds > 1:
            return shard_seed_trees(mem, self._mesh)
        return shard_memory(mem, self._mesh)

    def _upload_stream(self, data: Data, sampler):
        """Pad a chronological stream to whole batches — and to equal-size
        wave-pipeline superchunks, so each stream compiles exactly one
        (wave_scan_chunk, run_phase) shape pair — and materialize it on
        device by gathering from the once-uploaded full stream (only the
        event-position index vector, negatives, and valid mask transfer);
        draw the phase's negatives when a seeded sampler is given.

        Returns (PhaseStream, host columns): padding may append fully invalid
        batches, which metric aggregation must skip, and the superchunk count
        the padding targets (``_phase`` must reuse it — recomputing it from
        the padded length can disagree and split chunks off batch
        boundaries)."""
        bs = self.cfg.bs
        n = data.n_interactions
        real_batches = max(1, -(-n // bs))
        # chunks hold whole batches, so there can never be more chunks than
        # real batches (index_chunk < bs degenerates to one batch per chunk)
        n_chunks = min(
            real_batches,
            max(1, -(-(real_batches * bs) // self.cfg.index_chunk)),
        )
        per_chunk = -(-real_batches // n_chunks)
        n_batches = per_chunk * n_chunks
        pad = n_batches * bs - n

        def p(a, dtype):
            a = np.asarray(a, dtype)
            return np.concatenate([a, np.zeros(pad, dtype)]) if pad else a

        if sampler is not None and n > 0:
            # exact reference draw order (evaluation.py:10,30-31)
            negs = self._neg_ids(sampler.sample_eval_negatives(n, bs))
        else:
            negs = np.zeros(n, np.int64)

        pos = (
            self._pos_of_eidx[np.asarray(data.edge_idxs, np.int64)]
            if n else np.zeros(0, np.int64)
        )
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        stream = _gather_stream(
            self._full_dev,
            self._to_dev(p(pos, np.int32)),
            self._to_dev(p(negs, np.int32)),
            self._to_dev(valid),
        )
        host = {
            "src": p(data.sources, np.int32),
            "dst": p(data.destinations, np.int32),
            "neg": p(negs, np.int32),
            "t": p(data.timestamps, np.float32),
            "eidx": p(data.edge_idxs, np.int32),
            "valid": valid,
        }
        return PhaseStream(stream, n_batches, real_batches, n_chunks), host

    def _draw_train_negs(self, epoch_id: int) -> np.ndarray:
        """This epoch's training negatives, padded to the stream length
        (fresh per epoch — reference train.py:203). Seed-parallel: one
        independent draw per seed, [S, E] — each row is exactly the draw a
        single Trainer with that seed would make."""
        n = self.splits.train.n_interactions
        pad = self._streams["train"].stream.src.shape[0] - n

        def draw(base):
            rs = np.random.RandomState(
                (int(base) + 0x9E3779B1 * (epoch_id + 1)) % (2**32)
            )
            _, negs = self.train_sampler.sample_with(rs, n)
            negs = self._neg_ids(negs)
            if pad:
                negs = np.concatenate([negs, np.zeros(pad, negs.dtype)])
            return negs.astype(np.int32)

        if self._n_seeds == 1:
            return draw(self._neg_base)
        return np.stack([draw(b) for b in self._neg_base])

    def _wave_scheds(self, stream_name: str, negs: np.ndarray) -> list:
        """Wave schedules for every superchunk of a stream under the given
        negatives: [(flat slot vector on device, n_waves)] (C++ scheduler +
        H2D upload)."""
        cfg = self.cfg
        stream, _, _, n_chunks = self._streams[stream_name]
        host = self._host_streams[stream_name]
        total = stream.src.shape[0]
        chunk = total // n_chunks
        n_shards = 1
        if (resolve_owner_aligned(cfg) and self._mesh is not None
                and self._n_seeds == 1):
            # owner alignment exists to keep src-row reads local to the
            # shard owning the row — under seed SHARDING the index state is
            # replicated (every device scans all rows), so alignment has no
            # locality to buy and would only pay the wave-count inflation
            n_shards = self._mesh.devices.size
        raw = []
        for lo in range(0, total, chunk):
            hi = lo + chunk
            v = host["valid"][lo:hi]
            flat_valid, n_waves = wave_flat_index(
                host["src"][lo:hi][v], host["dst"][lo:hi][v],
                negs[..., lo:hi][..., v],   # [E'] or [S, E'] (seed-parallel)
                cfg.n_nodes, cap=cfg.wave_cap, n_shards=n_shards,
            )
            raw.append((hi - lo, v, flat_valid, n_waves))
        # pad every chunk's wave count to the stream's high-water mark: the
        # wave count jitters across epochs (fresh negatives change the
        # extraction-read dependencies), and each distinct count compiles a
        # separate fused phase program (~tens of s); scanning a few hundred
        # extra empty waves costs ~ms. Padding only grows n_waves, so the
        # schedule stays valid — the extra waves hold no valid lanes.
        hwm = max(self._wave_hwm.get(stream_name, 0),
                  max(n for _, _, _, n in raw))
        self._wave_hwm[stream_name] = hwm
        scheds = []
        for size, v, flat_valid, _ in raw:
            flat = np.full(size, hwm * cfg.wave_cap, np.int32)
            flat[v] = flat_valid
            scheds.append((self._to_dev(flat), hwm))
        return scheds

    def _prepare_train_epoch(self, epoch_id: int):
        """Draw epoch ``epoch_id``'s negatives, schedule its waves, and start
        the device uploads. Called for epoch e+1 right after epoch e's chunks
        are dispatched (before their metric sync), so the host scheduling and
        the H2D transfers — ~25% of epoch wall time on tunneled deployments —
        hide under the device compute of the running epoch."""
        negs = self._draw_train_negs(epoch_id)
        negs_dev = self._negs_to_dev(negs)
        use_waves = (
            self.cfg.embedding_module == "diffusion"
            and self.cfg.tppr_strategy == "streaming"
        )
        scheds = self._wave_scheds("train", negs) if use_waves else None
        return (epoch_id, negs, negs_dev, scheds)

    def _phase(
        self,
        stream_name: str,
        train: bool,
        index_state,
        nbr_index,
        rng,
        start_chunk: int = 0,
        max_chunks: Optional[int] = None,
    ) -> Tuple[TpprState, PhaseResult]:
        """Run one phase. ``start_chunk``/``max_chunks`` window a training
        epoch to a range of superchunks (wave path only) for mid-epoch
        checkpoint/resume: state comes from the checkpoint, this epoch's
        already-drawn negatives are reused, ``self._chunk_cursor`` tracks the
        next chunk to run, and the returned metrics cover only the chunks
        actually run."""
        t0 = time.time()
        cfg = self.cfg
        # after a compaction-cap overflow the train program switches to the
        # exact per-position lazy-update variant (sticky; see train_epoch)
        run_cfg = (
            cfg.replace(lazy_unique_cap=0)
            if train and self._lazy_fallback else cfg
        )
        stream, n_batches, real_batches, n_chunks = self._streams[stream_name]
        host = self._host_streams[stream_name]
        use_waves = (
            cfg.embedding_module == "diffusion"
            and cfg.tppr_strategy == "streaming"
        )
        t_index = 0.0
        scheds = None
        if train:
            ti0 = time.time()
            if self._epoch_negs is not None:
                # mid-epoch resume or overflow rerun: reuse this epoch's draw
                negs, negs_dev = self._epoch_negs, None
            elif (self._train_prefetch is not None
                  and self._train_prefetch[0] == self._epoch_id):
                _, negs, negs_dev, scheds = self._train_prefetch
            else:
                _, negs, negs_dev, scheds = self._prepare_train_epoch(
                    self._epoch_id
                )
            self._train_prefetch = None
            self._epoch_negs = negs
            if negs_dev is None:
                negs_dev = self._negs_to_dev(negs)
            t_index += time.time() - ti0
            stream = stream._replace(neg=negs_dev)
            host = dict(host, neg=negs)
        elif use_waves:
            scheds = self._eval_scheds.get(stream_name)

        if use_waves and scheds is None:
            ti0 = time.time()
            scheds = self._wave_scheds(stream_name, host["neg"])
            if not train:
                self._eval_scheds[stream_name] = scheds
            t_index += time.time() - ti0

        if not use_waves:
            if self._n_seeds > 1:
                # pruning / recursive towers: per-seed queries are computed
                # inside the vmapped seed step; the carried index is () here
                # (only streaming-diffusion has a stateful index, and that
                # config always takes the wave path)
                self.params, self.opt_state, self.mem, metrics = (
                    run_phase_seeds(
                        run_cfg, train, n_batches,
                        self.params, self.opt_state, self.mem,
                        rng, self.edge_feats, nbr_index, stream,
                        mesh=self._mesh,
                    )
                )
            else:
                (self.params, self.opt_state, self.mem, index_state,
                 metrics) = run_phase(
                    run_cfg, train, n_batches,
                    self.params, self.opt_state, self.mem, index_state,
                    rng, self.edge_feats, nbr_index, stream,
                )
            if train:
                self._chunk_cursor = n_chunks  # phase runs whole epochs
                self._train_prefetch = self._prepare_train_epoch(
                    self._epoch_id + 1
                )
            ms = jax.tree.map(np.asarray, metrics)  # syncs the phase
        else:
            # wave-parallel pipeline: per superchunk, schedule on host
            # (C++, tens of ms), ship ONE int32 slot index per edge, and run
            # wave-layout scatter + index scan + stream-order query gather as
            # one program, then the fused train/eval scan over the chunk's
            # batches with the precomputed queries. Host↔device round trips
            # per chunk: one upload + two dispatches.
            total = stream.src.shape[0]
            chunk = total // n_chunks  # exact: upload pads to equal chunks
            assert chunk % cfg.bs == 0 and chunk * n_chunks == total, (
                "superchunks must hold whole batches "
                f"(chunk={chunk}, bs={cfg.bs}, n_chunks={n_chunks})"
            )
            all_metrics = []
            for ci, lo in enumerate(range(0, total, chunk)):
                if ci < start_chunk:
                    continue  # mid-epoch resume: state covers these already
                if max_chunks is not None and ci >= start_chunk + max_chunks:
                    break
                hi = min(lo + chunk, total)
                flat_dev, n_waves = scheds[ci]
                chunk_stream = jax.tree.map(lambda x: x[lo:hi], stream)
                # DEFAULT: two dispatches per chunk (wave scan, then the
                # batch scan). Measured on the tunneled v5e: the dispatches
                # pipeline (async enqueue keeps the device fed) and the
                # single fused program is ~15% SLOWER — XLA compiles the
                # combined module worse than the parts (back-to-back A/B in
                # RESULTS.md, round 3). --fused_dispatch keeps the fused
                # variant selectable for deployments where per-dispatch cost
                # dominates; results are equivalent either way (tested).
                if cfg.fused_dispatch and not cfg.profile:
                    (self.params, self.opt_state, self.mem, index_state,
                     metrics) = run_phase_fused(
                        run_cfg, train, (hi - lo) // cfg.bs, n_waves,
                        self._use_pallas, self._pallas_block,
                        self.params, self.opt_state, self.mem, index_state,
                        jax.random.fold_in(rng, ci), self.edge_feats,
                        chunk_stream, flat_dev,
                    )
                else:
                    ti0 = time.time()
                    index_state, queries = wave_scan_chunk(
                        index_state, self._tppr_params,
                        chunk_stream.src, chunk_stream.dst, chunk_stream.neg,
                        chunk_stream.t, chunk_stream.eidx, chunk_stream.valid,
                        flat_dev, n_waves, cfg.wave_cap,
                        self._use_pallas, self._pallas_block,
                    )
                    if cfg.profile:
                        # exact index/tower split, at the cost of overlap
                        jax.block_until_ready(queries)
                    t_index += time.time() - ti0
                    if self._n_seeds > 1:
                        self.params, self.opt_state, self.mem, metrics = (
                            run_phase_seeds(
                                run_cfg, train, (hi - lo) // cfg.bs,
                                self.params, self.opt_state, self.mem,
                                self._fold_rng(rng, ci), self.edge_feats,
                                nbr_index, chunk_stream, queries,
                                mesh=self._mesh,
                            )
                        )
                    else:
                        (self.params, self.opt_state, self.mem, _,
                         metrics) = run_phase(
                            run_cfg, train, (hi - lo) // cfg.bs,
                            self.params, self.opt_state, self.mem, (),
                            jax.random.fold_in(rng, ci), self.edge_feats,
                            nbr_index, chunk_stream, queries,
                        )
                all_metrics.append(metrics)
                self._chunk_cursor = ci + 1
                if train and self._stop_requested:
                    # cooperative preemption (request_stop / SIGTERM): leave
                    # the epoch at a superchunk boundary — the cursor plus
                    # the epoch negatives/rng already saved by save_state
                    # make the restart exact (same machinery as --state_every
                    # mid-epoch resume)
                    break
            if train and self._chunk_cursor >= n_chunks:
                # epoch fully dispatched: prep the NEXT epoch while the
                # device drains this one (the metric sync below waits on it)
                self._train_prefetch = self._prepare_train_epoch(
                    self._epoch_id + 1
                )
            assert all_metrics, (
                "empty superchunk window: start_chunk="
                f"{start_chunk}, max_chunks={max_chunks} select none of the "
                f"{n_chunks} chunks"
            )
            ms = jax.tree.map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
                *all_metrics,
            )
            # metrics cover chunks [start_chunk, cursor): window the
            # real-batch count accordingly
            start_b = start_chunk * (chunk // cfg.bs)
            real_batches = max(1, min(ms.loss.shape[0], real_batches - start_b))

        # seed-parallel metrics carry a trailing seed axis: average over
        # batches only, so PhaseResult fields are per-seed [S] arrays
        mean = [
            x[:real_batches].mean(axis=0)
            for x in (ms.loss, ms.ap, ms.auc, ms.acc)
        ]
        if self._n_seeds == 1:
            mean = [float(x) for x in mean]
        return index_state, PhaseResult(
            loss=mean[0], ap=mean[1], auc=mean[2], acc=mean[3],
            seconds=time.time() - t0,
            index_seconds=t_index if use_waves else 0.0,
            overflow=float(ms.overflow[:real_batches].max()),
        )

    def _eval_rng(self, seed: int):
        """Evaluation negatives reset deterministically per phase (reference
        evaluation.py:9-10). Seed-parallel: the same key tiled to [S] — eval
        is deterministic (no dropout), but the vmapped phase expects the
        stacked key layout."""
        key = jax.random.PRNGKey(1_000_003 + seed)
        if self._n_seeds > 1:
            # materialized stack (not broadcast_to): _fold_rng vmaps over
            # axis 0 and typed-key batching rejects lazy broadcast views
            key = jnp.stack([key] * self._n_seeds)
        return key

    # ---------------------------------------------------------------- epochs

    def train_epoch(self, start_chunk: int = 0,
                    max_chunks: Optional[int] = None) -> PhaseResult:
        """One training epoch from zeroed memory and empty index (reference
        train.py:188-227). The state reset is one fused device call — on
        tunneled deployments every dispatch costs tens of ms.

        ``start_chunk > 0`` resumes a partially-run epoch from restored
        state (no reset); ``max_chunks`` stops after that many superchunks
        so the caller can ``save_state`` a mid-epoch cursor."""
        cfg = self.cfg
        # the lazy-update compaction (train/step.py:make_lazy_plan) is exact
        # unless a batch's unique selected-node count overflows the static
        # cap; snapshot the (small) trainable state so an overflowed epoch
        # can be rerun bit-correctly on the per-position program
        snapshot = None
        if (
            start_chunk == 0
            and max_chunks is None
            and not self._lazy_fallback
            and self._lazy_compaction_active()
        ):
            snapshot = (_copy(self.params), _copy(self.opt_state))
        if start_chunk == 0:
            self._reset_epoch_state()
            self.rng, self._epoch_rng = self._split_rng()
        self.index_state, result = self._phase(
            "train", True, self.index_state, self.train_nbr_index,
            self._epoch_rng, start_chunk, max_chunks,
        )
        if result.overflow > 0 and not self._lazy_fallback:
            self._lazy_fallback = True
            if snapshot is not None:
                logger.warning(
                    "lazy-update compaction cap overflowed (epoch %d); "
                    "rerunning the epoch on the per-position path and "
                    "switching to it for the rest of the run "
                    "(set --lazy_unique_cap to resize)", self._epoch_id,
                )
                self.params, self.opt_state = snapshot
                self._reset_epoch_state()
                self.index_state, result = self._phase(
                    "train", True, self.index_state, self.train_nbr_index,
                    self._epoch_rng,
                )
            else:
                # windowed/mid-epoch run: earlier chunks were already folded
                # into donated state, so this epoch cannot be replayed —
                # surface it loudly and fall back from the next epoch on
                logger.error(
                    "lazy-update compaction cap overflowed during a windowed "
                    "epoch run; this epoch's updates used the compacted path "
                    "(set --lazy_unique_cap 0 or restart from the last "
                    "checkpoint for exact results)",
                )
        if self._chunk_cursor >= self._streams["train"].n_chunks:
            # epoch complete: the cursor and its epoch-scoped state expire
            self._chunk_cursor = 0
            self._epoch_negs = None
            self._epoch_id += 1
        return result

    def _lazy_compaction_active(self) -> bool:
        """Whether the train forward uses the compacted lazy-update path —
        only then can a batch overflow the cap and need the snapshot rerun
        (train/step.py:make_lazy_plan). Per-position mode (the default,
        lazy_unique_cap=0) never overflows; skipping the snapshot saves the
        per-epoch params/opt-state copy dispatches."""
        cfg = self.cfg
        if cfg.embedding_module != "diffusion":
            return False
        from zebra_tpu.train.step import lazy_position_count, resolve_lazy_cap

        return resolve_lazy_cap(cfg, lazy_position_count(cfg)) > 0

    def _reset_epoch_state(self):
        """Zeroed memory + empty index, sharded when a mesh is active."""
        self.mem, self.index_state = _fresh_epoch_state(
            self.cfg, self._n_seeds
        )
        if self._mesh is not None:
            from zebra_tpu.parallel import (
                replicate,
                shard_index_state,
                shard_memory,
                shard_seed_trees,
            )

            if self._n_seeds > 1:
                self.mem = shard_seed_trees(self.mem, self._mesh)
                self.index_state = replicate(self.index_state, self._mesh)
            else:
                self.mem = shard_memory(self.mem, self._mesh)
                self.index_state = shard_index_state(
                    self.index_state, self._mesh
                )

    def validate(self) -> Tuple[PhaseResult, PhaseResult]:
        """Transductive + inductive validation with the backup/restore dance
        (reference train.py:249-269). Leaves (mem, index) at the val-end
        state so test can continue from it."""
        cfg = self.cfg
        train_idx = self.index_state
        if self._host_backup:
            # host-backup protocol (--host_backup / auto): the train-end
            # backup lives in host RAM and the flush DONATES the device
            # buffers — peak device residency drops from 3 table copies to
            # 2, which is what raises the one-chip seed ceiling at large
            # S·N (RESULTS.md round 5). One D2H+H2D round trip per
            # validate; numerically identical (tested)
            train_mem_h = self._mem_to_host()
            self.mem = self._flush_mem(donate=True)
        else:
            train_mem = self.mem  # backup precedes the flush (reference)
            # one-time train→eval flush (reference tgn_model.py:143-146)
            self.mem = self._flush_mem()

        self.index_state, trans = self._phase(
            "val", False, _copy(train_idx), self.full_nbr_index,
            self._eval_rng(SEED_VAL),
        )
        val_mem, val_idx = self.mem, self.index_state

        # inductive val from the (unflushed) train-end state, with the val
        # sampler's seed (reference train.py:261-266)
        self.mem = (self._mem_from_host(train_mem_h) if self._host_backup
                    else _copy(train_mem))
        _, induct = self._phase(
            "nn_val", False, _copy(train_idx), self.full_nbr_index,
            self._eval_rng(SEED_VAL),
        )

        self.mem, self.index_state = val_mem, val_idx
        return trans, induct

    def test(self) -> Tuple[PhaseResult, PhaseResult]:
        """Transductive + inductive test from the val-end state (reference
        train.py:294-309)."""
        val_idx = self.index_state
        if self._host_backup:
            # val-end backup in host RAM; leg 1 donates the device tables
            val_mem_h = self._mem_to_host()
            self.index_state, trans = self._phase(
                "test", False, _copy(val_idx), self.full_nbr_index,
                self._eval_rng(SEED_TEST),
            )
            self.mem = self._mem_from_host(val_mem_h)
            _, induct = self._phase(
                "nn_test", False, _copy(val_idx), self.full_nbr_index,
                self._eval_rng(SEED_NN_TEST),
            )
            return trans, induct

        val_mem = self.mem
        self.mem = _copy(val_mem)  # run_phase donates self.mem
        self.index_state, trans = self._phase(
            "test", False, _copy(val_idx), self.full_nbr_index,
            self._eval_rng(SEED_TEST),
        )

        self.mem = _copy(val_mem)
        _, induct = self._phase(
            "nn_test", False, _copy(val_idx), self.full_nbr_index,
            self._eval_rng(SEED_NN_TEST),
        )
        return trans, induct

    # ---------------------------------------------------------------- checkpoint

    def save_state(self, path: str, epoch: int = 0,
                   chunk: Optional[int] = None) -> None:
        """Full-state checkpoint: params, optimizer, node memory, T-PPR index,
        PRNG keys, and the host RNG driving train negatives — enough for an
        exact restart (the reference checkpoints only (state_dict, memory),
        train.py:291, and reconstructs the index by replay).

        ``chunk`` records a mid-epoch stream cursor (the next superchunk to
        run; defaults to the Trainer's own cursor). A nonzero cursor also
        stores this epoch's negatives and dropout key so the resumed chunks
        see exactly what an uninterrupted epoch would."""
        if chunk is None:
            chunk = self._chunk_cursor
        save_checkpoint(path, {
            "cfg": self.cfg,  # lets serving rebuild a predictor from the
                              # file alone (LinkPredictor.from_checkpoint)
            "params": self.params,
            "opt_state": self.opt_state,
            "mem": self.mem,
            "index_state": self.index_state,
            "rng": self.rng,
            "np_random": np.random.get_state(),
            "epoch": epoch,
            "chunk": chunk,
            "epoch_negs": self._epoch_negs if chunk else None,
            "epoch_rng": self._epoch_rng if chunk else None,
            "epoch_id": self._epoch_id,
            "neg_base": self._neg_base,
            "fit": self._fit_state,
        })

    def restore_state(self, path: str) -> Tuple[int, int]:
        """Restore a ``save_state`` checkpoint; returns (epoch, chunk) — pass
        ``chunk`` to ``train_epoch(start_chunk=...)`` to finish a partially
        trained epoch."""
        ckpt = load_checkpoint(path)
        saved_cfg = ckpt.get("cfg")
        if saved_cfg is not None:
            diffs = Config.state_compat_diff(saved_cfg, self.cfg)
            if diffs:
                hint = ""
                if any(d.startswith("parallel_runs:") for d in diffs):
                    hint = (
                        " (to serve one seed of a seed-parallel checkpoint "
                        "use LinkPredictor.from_checkpoint(run_index=...))"
                    )
                raise ValueError(
                    "checkpoint config is incompatible with this Trainer — "
                    "restoring would mis-shape or silently mis-read the "
                    "state:\n  " + "\n  ".join(diffs) + hint
                )
        as_dev = lambda t: jax.tree.map(self._to_dev, t)
        self.params = as_dev(ckpt["params"])
        self.opt_state = as_dev(ckpt["opt_state"])
        self.mem = as_dev(ckpt["mem"])
        self.index_state = (
            as_dev(ckpt["index_state"]) if ckpt["index_state"] != () else ()
        )
        if self._mesh is not None:
            # checkpoints store host arrays; put the node tables back on
            # their shards (seed axis when seed-parallel, node rows
            # otherwise; params/optimizer replicate in the row layout)
            from zebra_tpu.parallel import (
                replicate,
                shard_index_state,
                shard_memory,
                shard_seed_trees,
            )

            if self._n_seeds > 1:
                self.params = shard_seed_trees(self.params, self._mesh)
                self.opt_state = shard_seed_trees(self.opt_state, self._mesh)
                self.mem = shard_seed_trees(self.mem, self._mesh)
                self.index_state = replicate(self.index_state, self._mesh)
            else:
                self.mem = shard_memory(self.mem, self._mesh)
                if self.index_state != ():
                    self.index_state = shard_index_state(
                        self.index_state, self._mesh
                    )
        self.rng = jnp.asarray(ckpt["rng"])
        np.random.set_state(ckpt["np_random"])
        chunk = int(ckpt.get("chunk", 0) or 0)
        self._chunk_cursor = chunk
        # unconditional: an epoch-boundary checkpoint stores None here, and
        # stale values from this Trainer's own abandoned partial epoch would
        # otherwise leak into the restored run (its next train_epoch would
        # reuse them via _phase's epoch-negs branch)
        negs = ckpt.get("epoch_negs")
        self._epoch_negs = np.asarray(negs) if negs is not None else None
        erng = ckpt.get("epoch_rng")
        self._epoch_rng = jnp.asarray(erng) if erng is not None else None
        self._epoch_id = int(ckpt.get("epoch_id", 0))
        if ckpt.get("neg_base") is not None:
            nb = ckpt["neg_base"]
            self._neg_base = (
                np.asarray(nb, np.int64) if np.ndim(nb) else int(nb)
            )
        self._train_prefetch = None  # keyed to the pre-restore epoch stream
        self._fit_state = ckpt.get("fit")
        return int(ckpt["epoch"]), chunk

    # ---------------------------------------------------------------- run

    def fit(self, n_epoch: Optional[int] = None,
            resume_from: Optional[str] = None) -> Dict[str, float]:
        """The reference's per-run loop (train.py:149-320). ``resume_from``
        restores a ``save_state`` checkpoint (e.g. one written by
        ``--state_every``) and continues the epoch loop from it, including
        the early-stop monitor and a mid-epoch stream cursor if one was
        saved."""
        if self._n_seeds > 1:
            return self._fit_seeds(n_epoch, resume_from)
        cfg = self.cfg
        n_epoch = n_epoch or cfg.n_epoch
        stopper = EarlyStopMonitor(max_round=cfg.patience)
        stop_epoch = -1
        timers = PhaseTimers()
        n_train_events = self.splits.train.n_interactions

        start_epoch, start_chunk = 0, 0
        if resume_from:
            start_epoch, start_chunk = self.restore_state(resume_from)
            for k, v in (self._fit_state or {}).items():
                setattr(stopper, k, v)
            logger.info(
                "resumed from %s at epoch %d chunk %d",
                resume_from, start_epoch, start_chunk,
            )
        state_path = os.path.join(
            cfg.checkpoint_dir, cfg.run_name() + ".state.ckpt"
        )

        for epoch in range(start_epoch, n_epoch):
            # capture a device trace of one post-compile epoch when asked
            with trace_context(
                cfg.trace_dir if epoch == cfg.trace_epoch else None
            ):
                with timers.time("train", n_train_events):
                    # a restored mid-epoch cursor finishes its epoch first
                    tr = self.train_epoch(
                        start_chunk=start_chunk if epoch == start_epoch else 0
                    )
            if self._stop_requested:
                self._fit_state = self._stopper_state(stopper)
                # train_epoch resets the cursor to 0 (and bumps _epoch_id)
                # when the epoch ran to completion — a nonzero cursor is the
                # only mid-epoch signal here
                done = self._chunk_cursor == 0
                self.save_state(
                    state_path, epoch=epoch + 1 if done else epoch,
                    chunk=self._chunk_cursor,
                )
                self._fit_state = None
                logger.info(
                    "stop requested: resumable state saved to %s "
                    "(epoch %d, chunk %d)", state_path, epoch,
                    self._chunk_cursor,
                )
                return {"interrupted": True, "state_path": state_path,
                        "stop_epoch": float(epoch)}
            timers.seconds["tppr"] += tr.index_seconds
            with timers.time("val"):
                trans, induct = self.validate()
            logger.info(
                "epoch: %d, tppr: %.2fs, train: %.2fs, val: %.2fs, "
                "train events/s: %.0f",
                epoch + 1, tr.index_seconds, tr.seconds,
                trans.seconds + induct.seconds,
                n_train_events / max(tr.seconds, 1e-9),
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
                self.params = jax.tree.map(jnp.asarray, ckpt["params"])
                self.mem = jax.tree.map(jnp.asarray, ckpt["mem"])
                break
            if epoch == stopper.best_epoch:
                save_checkpoint(
                    self.checkpoint_path, {"params": self.params, "mem": self.mem}
                )
            if cfg.state_every and (epoch + 1) % cfg.state_every == 0:
                # periodic full-state checkpoint (epoch boundary: the next
                # epoch restarts from zeroed memory/index by protocol, so
                # params/optimizer/RNGs + the stopper are the whole state)
                self._fit_state = self._stopper_state(stopper)
                self.save_state(state_path, epoch=epoch + 1, chunk=0)
                self._fit_state = None

        with timers.time("test"):
            t_trans, t_induct = self.test()
        logger.info("phase totals: %s", timers.summary())
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

    def _fit_seeds(self, n_epoch: Optional[int] = None,
                   resume_from: Optional[str] = None) -> Dict:
        """Seed-parallel fit: the reference's sequential multi-run loop
        (reference train.py:149) collapsed into ONE epoch loop with per-seed
        early stopping. Each seed keeps its own stopper and best-epoch
        (params, mem) snapshot; a stopped seed keeps riding the vmapped
        phases (harmless — its frozen snapshot is what test uses), so
        wall-clock is bounded by the slowest-stopping seed, exactly like the
        longest run of a sequential sweep. Test evaluates every seed in one
        vmapped pass: stopped seeds from their best snapshot (the reference
        reloads the best checkpoint on early stop, train.py:285-287),
        unstopped seeds from their final state. Returns mean/σ per metric
        plus the per-seed values."""
        cfg = self.cfg
        s_n = self._n_seeds
        n_epoch = n_epoch or cfg.n_epoch
        stoppers = [EarlyStopMonitor(max_round=cfg.patience)
                    for _ in range(s_n)]
        stopped = [False] * s_n
        stop_epoch = [-1] * s_n
        best: list = [None] * s_n    # (params_s, mem_s) at the best val epoch
        timers = PhaseTimers()
        n_train_events = self.splits.train.n_interactions

        start_epoch, start_chunk = 0, 0
        if resume_from:
            start_epoch, start_chunk = self.restore_state(resume_from)
            for s, fields in enumerate(
                (self._fit_state or {}).get("per_seed", [])[:s_n]
            ):
                fields = dict(fields)
                stopped[s] = bool(fields.pop("stopped", False))
                stop_epoch[s] = int(fields.pop("stop_epoch", -1))
                for k, v in fields.items():
                    setattr(stoppers[s], k, v)
            if os.path.exists(self.checkpoint_path):
                ckpt = load_checkpoint(self.checkpoint_path)
                bp = jax.tree.map(jnp.asarray, ckpt["params"])
                bm = jax.tree.map(jnp.asarray, ckpt["mem"])
                best = [(_slice_seed(bp, s), _slice_seed(bm, s))
                        for s in range(s_n)]
            logger.info(
                "resumed seed-parallel fit from %s at epoch %d chunk %d",
                resume_from, start_epoch, start_chunk,
            )
        state_path = os.path.join(
            cfg.checkpoint_dir, cfg.run_name() + ".state.ckpt"
        )

        def snap_best():
            """Stacked best-or-current (params, mem) for the disk checkpoint."""
            ps = [best[s][0] if best[s] is not None
                  else _slice_seed(self.params, s) for s in range(s_n)]
            ms = [best[s][1] if best[s] is not None
                  else _slice_seed(self.mem, s) for s in range(s_n)]
            return _stack_seed_trees(ps), _stack_seed_trees(ms)

        for epoch in range(start_epoch, n_epoch):
            with trace_context(
                cfg.trace_dir if epoch == cfg.trace_epoch else None
            ):
                with timers.time("train", n_train_events):
                    tr = self.train_epoch(
                        start_chunk=start_chunk if epoch == start_epoch else 0
                    )
            if self._stop_requested:
                self._fit_state = self._seed_stopper_state(
                    stoppers, stopped, stop_epoch
                )
                # see fit(): cursor == 0 means train_epoch completed the
                # epoch and already advanced _epoch_id
                done = self._chunk_cursor == 0
                self.save_state(
                    state_path, epoch=epoch + 1 if done else epoch,
                    chunk=self._chunk_cursor,
                )
                self._fit_state = None
                bp, bm = snap_best()
                save_checkpoint(self.checkpoint_path,
                                {"params": bp, "mem": bm})
                logger.info(
                    "stop requested: resumable seed-parallel state saved to "
                    "%s (epoch %d, chunk %d)", state_path, epoch,
                    self._chunk_cursor,
                )
                return {"interrupted": True, "state_path": state_path,
                        "stop_epoch": float(epoch)}
            timers.seconds["tppr"] += tr.index_seconds
            with timers.time("val"):
                trans, induct = self.validate()
            logger.info(
                "epoch: %d (%d seeds, %d live), tppr: %.2fs, train: %.2fs, "
                "val: %.2fs, train events/s (aggregate): %.0f",
                epoch + 1, s_n, sum(not x for x in stopped),
                tr.index_seconds, tr.seconds,
                trans.seconds + induct.seconds,
                s_n * n_train_events / max(tr.seconds, 1e-9),
            )
            logger.info("train ap: %s, train loss: %s",
                        _fmt_seeds(tr.ap), _fmt_seeds(tr.loss))
            logger.info("val ap: %s, new node val ap: %s",
                        _fmt_seeds(trans.ap), _fmt_seeds(induct.ap))

            improved = False
            for s in range(s_n):
                if stopped[s]:
                    continue
                if stoppers[s].early_stop_check(float(trans.ap[s])):
                    stopped[s] = True
                    stop_epoch[s] = epoch + 1
                    logger.info("seed %d stopped at epoch %d (best epoch %d)",
                                s, epoch + 1, stoppers[s].best_epoch + 1)
                elif epoch == stoppers[s].best_epoch:
                    best[s] = (_slice_seed(self.params, s),
                               _slice_seed(self.mem, s))
                    improved = True
            if improved:
                bp, bm = snap_best()
                save_checkpoint(self.checkpoint_path,
                                {"params": bp, "mem": bm})
            if all(stopped):
                break
            if cfg.state_every and (epoch + 1) % cfg.state_every == 0:
                self._fit_state = self._seed_stopper_state(
                    stoppers, stopped, stop_epoch
                )
                self.save_state(state_path, epoch=epoch + 1, chunk=0)
                self._fit_state = None

        # test protocol: stopped seeds from their best snapshot, unstopped
        # ones from their final state (= the single-run reference protocol,
        # train.py:285-287 / 294)
        for s in range(s_n):
            if not stopped[s] or best[s] is None:
                best[s] = (_slice_seed(self.params, s),
                           _slice_seed(self.mem, s))
        self.params = _stack_seed_trees([b[0] for b in best])
        self.mem = _stack_seed_trees([b[1] for b in best])

        with timers.time("test"):
            t_trans, t_induct = self.test()
        logger.info("phase totals: %s", timers.summary())
        logger.info("Test statistics: Old nodes -- ap: %s, auc: %s, acc: %s",
                    _fmt_seeds(t_trans.ap), _fmt_seeds(t_trans.auc),
                    _fmt_seeds(t_trans.acc))
        logger.info("Test statistics: New nodes -- ap: %s, auc: %s, acc: %s",
                    _fmt_seeds(t_induct.ap), _fmt_seeds(t_induct.auc),
                    _fmt_seeds(t_induct.acc))
        if not cfg.save_best and os.path.exists(self.checkpoint_path):
            os.remove(self.checkpoint_path)

        mean = lambda x: float(np.asarray(x).mean())
        std = lambda x: float(np.asarray(x).std())
        aslist = lambda x: [float(v) for v in np.asarray(x)]
        return {
            "test_ap": mean(t_trans.ap), "test_ap_std": std(t_trans.ap),
            "test_auc": mean(t_trans.auc), "test_acc": mean(t_trans.acc),
            "nn_test_ap": mean(t_induct.ap),
            "nn_test_ap_std": std(t_induct.ap),
            "nn_test_auc": mean(t_induct.auc),
            "nn_test_acc": mean(t_induct.acc),
            "stop_epoch": float(np.mean(stop_epoch)),
            "per_seed": {
                "test_ap": aslist(t_trans.ap),
                "test_auc": aslist(t_trans.auc),
                "test_acc": aslist(t_trans.acc),
                "nn_test_ap": aslist(t_induct.ap),
                "nn_test_auc": aslist(t_induct.auc),
                "nn_test_acc": aslist(t_induct.acc),
                "stop_epoch": [float(e) for e in stop_epoch],
                "lr": [float(lr) for lr in (
                    cfg.parallel_lr or (cfg.lr,) * s_n
                )],
            },
        }


def _tpu_hbm_bytes(device_kind: Optional[str]) -> int:
    """Per-chip HBM by TPU generation, for backends that report no
    memory_stats (the tunneled client returns None). Sources: public TPU
    system docs — v2 8 GiB/core, v3 16/core, v4 32/chip, v5e 16, v5p 95,
    v6e (Trillium) 32. device_kind strings look like 'TPU v5 lite',
    'TPU v5p', 'TPU v4'. Unknown kinds use a conservative 16 GiB."""
    kind = (device_kind or "").lower()
    if "v5p" in kind:
        return 95 * 2**30
    if "v6" in kind:
        return 32 * 2**30
    if "v5" in kind:          # 'v5 lite' (v5e) and any other v5 spelling
        return 16 * 2**30
    if "v4" in kind:
        return 32 * 2**30
    if "v3" in kind:
        return 16 * 2**30
    if "v2" in kind:
        return 8 * 2**30
    return 16 * 2**30


def _permute_splits(splits: DatasetSplits, perm: np.ndarray) -> DatasetSplits:
    """Relabel every split's node ids through ``perm`` (timestamps, edge
    ids, and labels are positional and unchanged). The model is
    permutation-equivariant in node ids — all per-node state is gathered
    by id — so training on the permuted stream produces identical results
    up to top-k tie-break order (ties break by neighbor id)."""
    def pd(d: Data) -> Data:
        return Data(perm[d.sources], perm[d.destinations], d.timestamps,
                    d.edge_idxs, d.labels)

    return DatasetSplits(
        full=pd(splits.full), train=pd(splits.train), val=pd(splits.val),
        test=pd(splits.test), new_node_val=pd(splits.new_node_val),
        new_node_test=pd(splits.new_node_test),
        n_nodes=splits.n_nodes, n_edges=splits.n_edges,
    )


@jax.jit
def _gather_stream(full, pos, negs, valid) -> Stream:
    """Materialize a phase stream by gathering the full stream's columns at
    ``pos`` (padding slots gather row 0 and are zeroed via ``valid``)."""
    src, dst, t, eidx = full
    g = lambda a: jnp.where(valid, a[pos], jnp.zeros((), a.dtype))
    return Stream(
        src=g(src), dst=g(dst),
        neg=jnp.where(valid, negs, 0),
        t=g(t), eidx=g(eidx), valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "n_seeds"))
def _fresh_epoch_state(cfg: Config, n_seeds: int = 1):
    mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim,
                      jnp.dtype(cfg.message_dtype), jnp.dtype(cfg.memory_dtype))
    if n_seeds > 1:
        # seed-parallel: per-seed memory; the index state stays UNSTACKED
        # (its evolution is seed-independent — negatives are extraction-only)
        mem = jax.tree.map(
            lambda x: jnp.zeros((n_seeds,) + x.shape, x.dtype), mem
        )
    if cfg.embedding_module == "diffusion" and cfg.tppr_strategy == "streaming":
        index = init_tppr_state(cfg.n_tppr, cfg.n_nodes, cfg.topk)
    else:
        index = ()
    return mem, index


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("mem",))
def _flush_one_seed(cfg: Config, params_s, mem, s):
    """Flush seed ``s``'s rows of the stacked [S, ...] tables in place
    (donated buffer → a row-range update, no full-table copy)."""
    from zebra_tpu.train.step import flush_pending_impl

    m_s = jax.tree.map(lambda x: x[s], mem)
    m_s = flush_pending_impl(cfg, params_s, m_s)
    return jax.tree.map(lambda x, v: x.at[s].set(v), mem, m_s)


def _flush_mem_seeds(cfg: Config, params, mem):
    """Per-seed train→eval flush, one small jitted program dispatched S
    times — NOT one big vmapped/scanned module: the flush is dense over all
    N rows and upcasts the bf16 message table to f32 for the cell math.
    Vmapped, those temporaries materialize for ALL S seeds at once (S=8 at
    1.14M nodes ≈ 11 GiB of f32 scratch — observed v5e OOM); a single
    lax.map program bounds the scratch but its whole-table loop crashed the
    v5e remote-compile helper at the same scale. S dispatches of the
    seed-sliced program compile once (``s`` is traced), peak one seed's
    scratch, and cost S·~30 ms of dispatch on the tunnel — the flush runs a
    handful of times per epoch."""
    n_seeds = jax.tree.leaves(params)[0].shape[0]
    for s in range(n_seeds):
        p_s = _slice_seed(params, s)
        mem = _flush_one_seed(cfg, p_s, mem, jnp.int32(s))
    return mem


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"),
                   donate_argnames=("mem",))
def _flush_mem_seeds_sharded(cfg: Config, mesh, params, mem):
    """Seed-SHARDED flush: each device flushes its own local seeds
    sequentially inside one shard_map program (a plain lax.map over the
    sharded seed axis would reshard; a vmap would re-create the
    all-seeds-at-once scratch OOM — loop.py:_flush_mem_seeds). The local
    loop is a statically unrolled slice/flush/update chain, NOT a lax.map:
    the whole-table loop-carried module shape is what crashed the v5e
    remote-compile helper at Wiki-Talk scale (RESULTS.md round 5); the
    unrolled chain sequences per-seed flushes whose scratch XLA's buffer
    allocator can reuse."""
    from jax.sharding import PartitionSpec as P

    from zebra_tpu.train.step import flush_pending_impl

    def body(p, m):
        s_local = jax.tree.leaves(p)[0].shape[0]
        for l in range(s_local):
            p_l = jax.tree.map(lambda x: x[l], p)
            m_l = jax.tree.map(lambda x: x[l], m)
            m_l = flush_pending_impl(cfg, p_l, m_l)
            m = jax.tree.map(lambda x, v: x.at[l].set(v), m, m_l)
        return m

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )(params, mem)


def _stack_seed_trees(trees):
    """Stack a list of per-seed pytrees along a new leading seed axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


@functools.partial(jax.jit, static_argnames=("s",))
def _slice_seed(tree, s: int):
    """Seed ``s``'s slice of a stacked pytree — one fused dispatch per call
    (per-leaf host slicing would cost a tunneled round trip per array)."""
    return jax.tree.map(lambda x: x[s], tree)


def _fmt_seeds(x) -> str:
    """Log format for a per-seed metric vector: mean±σ plus the values."""
    a = np.asarray(x, np.float64).ravel()
    vals = ", ".join(f"{v:.6f}" for v in a)
    return f"{a.mean():.6f}±{a.std():.6f} [{vals}]"


@jax.jit
def _copy_impl(tree):
    return jax.tree.map(jnp.copy, tree)


def _copy(tree):
    """Deep-copy a device pytree (the fused phases donate their state inputs,
    so retained snapshots must not alias them). One fused dispatch per tree:
    per-leaf jnp.copy cost a tunneled host round trip per array (the r2
    device profile showed ~58 near-empty jit_copy executions per epoch)."""
    if tree is None or tree == ():
        return tree
    return _copy_impl(tree)
