"""Typed configuration for zebra_tpu.

Flag names and defaults mirror the reference CLI (reference train.py:22-58) so a
user of the reference can carry their command lines over; semantics documented
per field. The config is a frozen dataclass usable both programmatically and via
``Config.from_args`` (argparse CLI).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # ---- data ----
    data: str = "wikipedia"          # dataset name (-d/--data)
    data_dir: str = "data"           # root holding {data}/ml_{data}.csv (+ .npy)
    bs: int = 200                    # chronological mini-batch size (--bs)

    # ---- model dims (reference train.py:53-55) ----
    node_dim: int = 100              # node embedding dim (--node_dim)
    time_dim: int = 100              # Bochner time-encoding dim (--time_dim)
    memory_dim: int = 100            # TGN node-memory dim (--memory_dim)

    # ---- T-PPR index (reference train.py:45-48) ----
    tppr_strategy: str = "streaming"  # 'streaming' (SANTA) | 'pruning' (temporal BFS)
    topk: int = 10                    # entries kept per node per metric (--topk)
    alpha_list: Sequence[float] = (0.1,)  # ensemble of termination probs α
    beta_list: Sequence[float] = (0.9,)   # ensemble of decay factors β
    # pruning strategy query shape (reference overloads --n_degree/--n_layer,
    # embedding_module.py:107-108)
    n_degree: int = 10               # pruning width (most-recent nbrs per hop)
    n_layer: int = 2                 # pruning depth (hops)

    # ---- towers ----
    embedding_module: str = "diffusion"  # diffusion | graph_attention | graph_sum | identity | time
    # message-source flags (reference train.py:35-36, tgn_model.py:217-218):
    # build raw messages from the sender/recipient *embedding* of the batch
    # that produced them instead of the memory row
    use_source_embedding_in_message: bool = False
    use_destination_embedding_in_message: bool = False
    memory_updater: str = "gru"          # gru | rnn (--memory_updater)
    message_function: str = "identity"   # identity | mlp (--message_function)
    aggregator: str = "last"             # last | mean (--aggregator)
    n_head: int = 2                      # attention heads (--n_head)
    dropout: float = 0.1                 # tower dropout (diffusion tower uses 0.1
                                         # regardless of --drop_out in the
                                         # reference, embedding_module.py:89)

    # ---- optimization (reference train.py:27-32) ----
    n_epoch: int = 50
    lr: float = 1e-4
    patience: int = 5                # early-stop patience on val AP
    drop_out: float = 0.3            # reference --drop_out (vestigial for diffusion)
    n_runs: int = 1
    task: str = "link"               # "link": self-supervised link prediction
                                     # (the reference's only runnable task);
                                     # "node": link-train first, then the
                                     # downstream node-classification decoder
                                     # on the frozen embeddings (the working
                                     # form of the reference's broken
                                     # evaluation/evaluation.py:51-78 path)
    node_decoder_steps: int = 500    # decoder Adam steps (task="node")
    node_decoder_lr: float = 1e-3
    parallel_runs: int = 1           # train this many independent seeds
                                     # (cfg.seed + s) CONCURRENTLY in one
                                     # Trainer: per-seed params/optimizer/
                                     # memory/negatives vmapped over a seed
                                     # axis, sharing the event stream and ONE
                                     # T-PPR index scan (negatives are
                                     # extraction-only). The TPU-native
                                     # replacement for looping --n_runs
                                     # sequentially (reference train.py:149);
                                     # produces the paper-style multi-run
                                     # mean ± σ in a single pass. See
                                     # train/phase.py:run_phase_seeds for the
                                     # rbg-dropout bit-exactness caveat
    parallel_lr: Optional[Tuple[float, ...]] = None
                                     # per-seed learning rates for
                                     # --parallel_runs (len == parallel_runs):
                                     # turns the seed axis into a one-pass lr
                                     # sweep — each vmapped lane reads its own
                                     # lr from the optimizer state
                                     # (optax.inject_hyperparams). None: every
                                     # seed uses --lr

    # ---- determinism ----
    enable_random: bool = False      # if False: seed 0 everywhere (reference train.py:86-88)
    seed: int = 0

    # ---- feature handling (reference train.py:51-52) ----
    ignore_edge_feats: bool = False
    ignore_node_feats: bool = False
    real_edge_feats: Optional[bool] = None  # set by the Trainer: whether a
                                     # genuine edge-feature matrix was supplied
                                     # at training time. edge_dim alone cannot
                                     # tell a real 1-dim feature from the zero
                                     # placeholder; serving keys its
                                     # missing-features guard off this.
                                     # None = unknown (config from a
                                     # pre-flag checkpoint)

    # ---- debugging / observability ----
    debug_nans: bool = False         # enable jax NaN checks (SURVEY.md §5:
                                     # the 'race detection' analogue — jit
                                     # boundary sanitizers)
    trace_dir: Optional[str] = None  # capture a jax.profiler device trace of
                                     # one post-compile training epoch here
    trace_epoch: int = 1             # 0-based epoch index to trace (default:
                                     # the second epoch, after compiles)
    profile: bool = False            # block around the index scan so the
                                     # per-epoch tppr/train time split is
                                     # exact (costs pipeline overlap)

    # ---- checkpointing / logging ----
    save_best: bool = False
    checkpoint_dir: str = "saved_checkpoints"
    log_dir: str = "log"
    state_every: int = 0             # save a full-state checkpoint
                                     # (<run>.state.ckpt) every N epochs;
                                     # resume with --resume_state
    resume_state: Optional[str] = None  # path of a save_state checkpoint to
                                        # resume fit() from (epochs, early-
                                        # stop monitor, mid-epoch cursor)

    # ---- parallelism (new; no reference analogue, SURVEY.md §2 row 26) ----
    n_devices: int = 1               # 1 = single device; 0 = all visible; N = mesh of N
    # multi-process bring-up (jax.distributed); env fallbacks:
    # ZEBRA_COORDINATOR / ZEBRA_NUM_PROCESSES / ZEBRA_PROCESS_ID
    dist_coordinator: Optional[str] = None  # e.g. "host0:8476"
    dist_num_processes: int = 1
    dist_process_id: int = 0
    index_chunk: int = 65536         # events per wave-pipeline superchunk
    wave_cap: int = 64               # max edges per wave (static lane count)
    fused_dispatch: bool = False     # fuse the wave scan + batch scan into
                                     # one program per superchunk. Off: the
                                     # two dispatches pipeline under async
                                     # enqueue and the fused module compiles
                                     # ~15% slower on v5e (RESULTS.md r3 A/B)
    owner_aligned_waves: Optional[bool] = None  # pack each wave's lanes into
                                       # per-shard blocks keyed by the src
                                       # row's owner (keeps src-row traffic
                                       # chip-local on sharded meshes; costs
                                       # wave count under node skew — study
                                       # in docs/SCALING.md). None = auto:
                                       # on iff multi-PROCESS (cross-host
                                       # row traffic is the cost alignment
                                       # removes; single-host meshes ride
                                       # fast ICI/HBM and only pay the wave
                                       # inflation)
    interleave_node_ids: Optional[bool] = None
                                     # relabel node ids round-robin across
                                     # shards (parallel/sharding.py:
                                     # interleave_permutation) so
                                     # owner-aligned wave scheduling keeps
                                     # its lane blocks balanced under
                                     # JODIE-style bipartite numbering
                                     # (which otherwise puts EVERY src in
                                     # shard 0 — 2.00× wave inflation at 2
                                     # shards, docs/SCALING.md). None =
                                     # auto: on iff owner-aligned
                                     # scheduling is active on a >1-shard
                                     # mesh. Results are identical up to
                                     # top-k tie-break order (the model is
                                     # permutation-equivariant in node ids)
    interleave_shards: int = 0       # set by the Trainer: the shard count
                                     # the id permutation was built for
                                     # (0 = identity). Rides in checkpoints
                                     # so serving reconstructs the same
                                     # mapping; state-shaping (rows are
                                     # relabeled) — see STATE_FIELDS
    host_backup: Optional[bool] = None
                                     # keep the val/test protocol's
                                     # memory-table backups (reference
                                     # train.py:249-309's backup/restore
                                     # dance) in HOST RAM instead of HBM:
                                     # cuts the protocol's peak table
                                     # residency from 3 copies to 2 at the
                                     # cost of one D2H+H2D round trip of
                                     # the tables per val/test leg
                                     # (seconds on PCIe; slower on
                                     # tunneled links). None = auto: on
                                     # iff the 3-copy estimate busts the
                                     # device HBM budget but the 2-copy
                                     # one fits (loop._check_hbm_budget) —
                                     # raises the one-chip seed ceiling at
                                     # Wiki-Talk scale from S=4 to S=6.
                                     # Numerically identical either way
    pallas_merge: bool = True        # fused Pallas kernel for the SANTA merge
                                     # (used when running on TPU; ~3x the
                                     # XLA merge)
    lazy_unique_cap: int = 0         # static row budget for the deduplicated
                                     # lazy-update path (train/step.py): the
                                     # selected-neighbor set's unique ids are
                                     # compacted to ≤cap rows and the updater
                                     # cell runs once per unique node instead
                                     # of once per position. An epoch with a
                                     # batch whose unique count exceeds cap
                                     # is rerun on the exact per-position
                                     # path (Trainer, loop.py), so results
                                     # are correct for any cap. -1 = auto
                                     # (2/5 of the position count); 0 =
                                     # per-position (DEFAULT: on v5e at the
                                     # bench shapes the compaction's sorts +
                                     # re-expansion cost ~2.3x the updater
                                     # work they save — see NOTES.md; enable
                                     # for streams with extreme selected-set
                                     # duplication, e.g. small node
                                     # populations)
    prng_impl: str = "rbg"           # jax PRNG implementation; rbg is much
                                     # cheaper than threefry for per-batch
                                     # dropout masks on TPU
    message_dtype: str = "bfloat16"  # pending-message storage dtype; the
                                     # [N, msg_dim] table dominates HBM and
                                     # the lazy-update gather bandwidth
                                     # (2.15GB f32 at Wiki-Talk scale)
    compute_dtype: str = "float32"   # MXU input dtype for the dense-tower /
                                     # updater-cell matmuls (f32 accumulation,
                                     # f32 master weights). bfloat16 measured
                                     # 17% SLOWER end-to-end at the default
                                     # widths (100-600): the cast traffic
                                     # dominates and the matmuls are too small
                                     # to be MXU-bound. Flag retained for
                                     # wider models where bf16 should win.
    memory_dtype: str = "bfloat16"   # node-memory table storage dtype (cell
                                     # math stays f32). bfloat16 halves the
                                     # [N, d] recurrent state's HBM footprint
                                     # and gather traffic; accuracy-validated
                                     # twice: reference-parity harness
                                     # (Δ test AP 0.0008, PARITY.md) and a
                                     # 1M-event Wiki-Talk-scale stream
                                     # (train AP 0.8279 vs 0.8278 f32 at
                                     # epoch 3). +2-4% ev/s measured.
                                     # 'float32' restores exact reference
                                     # storage

    # ---- filled from data at runtime ----
    n_nodes: int = 0                 # max node id + 1 (ids are 1-based; 0 = padding)
    n_edges: int = 0                 # max edge idx + 1 (0 = padding edge)
    edge_dim: int = 1
    node_feat_dim: int = 0

    @property
    def n_tppr(self) -> int:
        return len(self.alpha_list)

    @property
    def hidden_dim(self) -> int:
        """Link-head input width: node_dim per ensemble member plus the source
        tower (reference tgn_model.py:102-108)."""
        if self.embedding_module == "diffusion":
            return self.node_dim * (self.n_tppr + 1)
        return self.node_dim

    @property
    def message_dim(self) -> int:
        """Raw-message width: [src_part; dst_part; edge_feat; time_enc]
        (reference tgn_model.py:60-61). With a use_*_embedding_in_message
        flag the corresponding part is the embedding (hidden_dim wide); the
        reference sizes the message 2·memory_dim regardless and therefore
        crashes at runtime when a flag is combined with an embedding whose
        width differs from memory_dim — here the updater cell is sized to the
        actual message."""
        src_part = (self.hidden_dim if self.use_source_embedding_in_message
                    else self.memory_dim)
        dst_part = (self.hidden_dim if self.use_destination_embedding_in_message
                    else self.memory_dim)
        return src_part + dst_part + self.edge_dim + self.time_dim

    @property
    def compact_messages(self) -> bool:
        """Whether pending-message rows drop the sender-memory part
        (models/memory.py): a node's memory cannot change between a store and
        its commit (commits precede stores for a node, and only commits write
        memory), so every consumer already holds the sender part — it is the
        updater cell's own hidden-state gather — and ``message_input``
        re-attaches it for free. Cuts the scan-carried message table and its
        hot-path row gathers from ``message_dim+1`` to
        ``message_dim−memory_dim+1`` columns (473 → 373 at reference dims).
        Invalid only with use_source_embedding_in_message, whose sender part
        is the batch embedding, not the memory row. (Reconstructing the edge
        features / time encoding from stored scalars was measured too: three
        skinny [N]-gathers plus a cosine per consumption — twice, forward +
        backward — cost far more than the 272 columns saved.)"""
        return not self.use_source_embedding_in_message

    @property
    def msg_table_dim(self) -> int:
        """Stored width of a pending-message row, excluding the flag column."""
        if self.compact_messages:
            return self.message_dim - self.memory_dim
        return self.message_dim

    @property
    def mxu_dtype(self):
        """jnp dtype for MXU matmul inputs, or None for plain f32 math
        (models/cells.py matmul)."""
        if self.compute_dtype == "bfloat16":
            import jax.numpy as jnp

            return jnp.bfloat16
        return None

    @property
    def cell_input_dim(self) -> int:
        """Updater-cell input width: the raw message, or the MLP message
        function's output (identity is the reference default; its 'mlp'
        branch is unrunnable there, tgn_model.py:64)."""
        return self.memory_dim if self.message_function == "mlp" else self.message_dim

    @property
    def needs_adjacency(self) -> bool:
        """Whether this config queries a padded-CSR adjacency index: the
        pruning strategy's bounded BFS and the recursive towers both do
        (reference train.py:191, 245). Shared by the Trainer and
        LinkPredictor.from_checkpoint so the two cannot desync."""
        return self.tppr_strategy == "pruning" or self.embedding_module in (
            "graph_attention", "graph_sum",
        )

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # Fields that determine the shapes / dtypes / layout / semantics of a
    # ``save_state`` checkpoint. ``state_compat_diff`` compares them so a
    # restore across an incompatible config change fails with a one-line
    # field diff instead of a deep XLA shape error — or worse: two index
    # states with different ``topk`` but equal row counts would restore
    # without any shape error and silently be read at the wrong packed
    # layout (index/streaming.py rows are [M(4k+1)]-packed by k).
    STATE_FIELDS = (
        # table extents
        "n_nodes", "n_edges", "edge_dim",
        # parameter shapes
        "node_dim", "time_dim", "memory_dim", "n_head",
        "embedding_module", "memory_updater", "message_function",
        "aggregator",
        # index layout + accumulation semantics (the stored index was built
        # under these α/β; values, not just lengths, must match)
        "topk", "alpha_list", "beta_list", "tppr_strategy",
        # pending-message table width (message_dim / compact_messages)
        "use_source_embedding_in_message",
        "use_destination_embedding_in_message",
        # storage dtypes + RNG key shape
        "message_dtype", "memory_dtype", "prng_impl",
        # stacked seed axis
        "parallel_runs",
        # node-id relabeling (memory/index rows live in permuted id space)
        "interleave_shards",
    )

    @classmethod
    def state_compat_diff(cls, saved: "Config", live: "Config") -> List[str]:
        """Field-level diff of the state-shaping fields between a
        checkpoint's stored config and the live one; empty = compatible.
        Callers (Trainer.restore_state) raise with the returned lines."""
        saved = cls.upgrade(saved)  # old pickles may predate some fields
        diffs = []
        for name in cls.STATE_FIELDS:
            sv, lv = getattr(saved, name), getattr(live, name)
            if name == "parallel_runs":
                sv, lv = max(1, int(sv)), max(1, int(lv))
            elif name in ("alpha_list", "beta_list"):
                sv, lv = tuple(sv), tuple(lv)
            if sv != lv:
                diffs.append(f"{name}: checkpoint={sv!r} vs live={lv!r}")
        # the recursive towers carry one attention/sum layer per n_layer
        # (models/tgn.py) — a params-shape field there, but vestigial for
        # diffusion (where it is only the derived run_name's pruning depth),
        # so compare it only when it shapes state
        if (saved.embedding_module in ("graph_attention", "graph_sum")
                or live.embedding_module in ("graph_attention", "graph_sum")):
            if saved.n_layer != live.n_layer:
                diffs.append(
                    f"n_layer: checkpoint={saved.n_layer!r} vs "
                    f"live={live.n_layer!r}"
                )
        # inject_hyperparams wraps the optimizer state in an extra node:
        # the pytree STRUCTURE differs, not just values
        if (saved.parallel_lr is None) != (live.parallel_lr is None):
            diffs.append(
                f"parallel_lr: checkpoint "
                f"{'set' if saved.parallel_lr is not None else 'unset'} vs "
                f"live {'set' if live.parallel_lr is not None else 'unset'} "
                f"(per-seed lr rides the optimizer state pytree)"
            )
        return diffs

    @classmethod
    def upgrade(cls, cfg: "Config") -> "Config":
        """Rebuild a Config unpickled from an older checkpoint. Pickle
        restores instance state without __init__, so fields added since the
        checkpoint was written are simply absent — and would break hashing /
        static-jit-arg use. Re-construct with defaults for the missing ones."""
        missing = object()
        kw = {}
        for f in dataclasses.fields(cls):
            v = getattr(cfg, f.name, missing)
            if v is not missing:
                kw[f.name] = v
        return cls(**kw)

    def run_name(self) -> str:
        """Derived config string doubling as log filename (reference train.py:94-107)."""
        name = self.data
        if self.embedding_module == "diffusion":
            name += f"_{self.tppr_strategy}_topk_{self.topk}"
            name += f"_alpha_{list(self.alpha_list)}_beta_{list(self.beta_list)}"
            if self.tppr_strategy == "pruning":
                name += f"_width_{self.n_degree}_depth_{self.n_layer}"
        name += f"_bs_{self.bs}_layer_{self.n_layer}_epoch_{self.n_epoch}_lr_{self.lr}"
        if self.enable_random:
            name += "_random_seed"
        if self.parallel_runs > 1:
            # seed-parallel checkpoints stack a [S, ...] axis — keep their
            # log/checkpoint paths distinct from single-seed runs of the
            # same config (restore_state rejects a width mismatch anyway)
            name += f"_par_{self.parallel_runs}"
        return name

    # ------------------------------------------------------------------ CLI
    @staticmethod
    def arg_parser() -> argparse.ArgumentParser:
        p = argparse.ArgumentParser("zebra_tpu training")
        p.add_argument("-d", "--data", type=str, default="wikipedia")
        p.add_argument("--data_dir", type=str, default="data")
        p.add_argument("--bs", type=int, default=200)
        p.add_argument("--n_degree", type=int, default=10)
        p.add_argument("--n_head", type=int, default=2)
        p.add_argument("--n_epoch", type=int, default=50)
        p.add_argument("--n_layer", type=int, default=2)
        p.add_argument("--lr", type=float, default=1e-4)
        p.add_argument("--patience", type=int, default=5)
        p.add_argument("--n_runs", type=int, default=1)
        p.add_argument("--task", type=str, default="link",
                       choices=["link", "node"])
        p.add_argument("--node_decoder_steps", type=int, default=500)
        p.add_argument("--node_decoder_lr", type=float, default=1e-3)
        p.add_argument("--parallel_runs", type=int, default=1)
        p.add_argument("--parallel_lr", type=float, nargs="+", default=None)
        p.add_argument("--drop_out", type=float, default=0.3)
        p.add_argument("--memory_updater", type=str, default="gru", choices=["gru", "rnn"])
        p.add_argument("--embedding_module", type=str, default="diffusion")
        p.add_argument("--message_function", type=str, default="identity", choices=["mlp", "identity"])
        p.add_argument("--use_source_embedding_in_message", action="store_true")
        p.add_argument("--use_destination_embedding_in_message", action="store_true")
        p.add_argument("--aggregator", type=str, default="last")
        p.add_argument("--enable_random", action="store_true")
        p.add_argument("--save_best", action="store_true")
        p.add_argument("--tppr_strategy", type=str, default="streaming", choices=["streaming", "pruning"])
        p.add_argument("--topk", type=int, default=10)
        p.add_argument("--alpha_list", type=float, nargs="+", default=[0.1])
        p.add_argument("--beta_list", type=float, nargs="+", default=[0.9])
        p.add_argument("--ignore_edge_feats", action="store_true")
        p.add_argument("--ignore_node_feats", action="store_true")
        p.add_argument("--node_dim", type=int, default=100)
        p.add_argument("--time_dim", type=int, default=100)
        p.add_argument("--memory_dim", type=int, default=100)
        p.add_argument("--n_devices", type=int, default=1)
        p.add_argument("--dist_coordinator", type=str, default=None)
        p.add_argument("--dist_num_processes", type=int, default=1)
        p.add_argument("--dist_process_id", type=int, default=0)
        p.add_argument("--index_chunk", type=int, default=65536)
        p.add_argument("--wave_cap", type=int, default=64)
        p.add_argument("--fused_dispatch", action="store_true")
        p.add_argument("--owner_aligned_waves", dest="owner_aligned_waves",
                       action="store_true", default=None)
        p.add_argument("--no_owner_aligned_waves",
                       dest="owner_aligned_waves", action="store_false")
        p.add_argument("--interleave_node_ids", dest="interleave_node_ids",
                       action="store_true", default=None)
        p.add_argument("--no_interleave_node_ids",
                       dest="interleave_node_ids", action="store_false")
        p.add_argument("--host_backup", dest="host_backup",
                       action="store_true", default=None)
        p.add_argument("--no_host_backup", dest="host_backup",
                       action="store_false")
        p.add_argument("--debug_nans", action="store_true")
        p.add_argument("--trace_dir", type=str, default=None)
        p.add_argument("--trace_epoch", type=int, default=1)
        p.add_argument("--profile", action="store_true")
        p.add_argument("--no_pallas_merge", dest="pallas_merge",
                       action="store_false")
        p.add_argument("--lazy_unique_cap", type=int, default=0)
        p.add_argument("--prng_impl", type=str, default="rbg",
                       choices=["rbg", "threefry2x32"])
        p.add_argument("--message_dtype", type=str, default="bfloat16",
                       choices=["bfloat16", "float32"])
        p.add_argument("--memory_dtype", type=str, default="bfloat16",
                       choices=["bfloat16", "float32"])
        p.add_argument("--compute_dtype", type=str, default="float32",
                       choices=["bfloat16", "float32"])
        p.add_argument("--checkpoint_dir", type=str, default="saved_checkpoints")
        p.add_argument("--log_dir", type=str, default="log")
        p.add_argument("--state_every", type=int, default=0)
        p.add_argument("--resume_state", type=str, default=None)
        p.add_argument("--seed", type=int, default=0)
        return p

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "Config":
        ns = cls.arg_parser().parse_args(argv)
        kw = vars(ns)
        kw["alpha_list"] = tuple(kw["alpha_list"])
        kw["beta_list"] = tuple(kw["beta_list"])
        if len(kw["alpha_list"]) != len(kw["beta_list"]):
            raise ValueError("alpha_list and beta_list must have equal length")
        if kw.get("parallel_lr") is not None:
            kw["parallel_lr"] = tuple(kw["parallel_lr"])
        return cls(**kw)
