"""CLI training driver — the zebra_tpu equivalent of the reference's
``python train.py -d wikipedia --tppr_strategy streaming --alpha_list 0.1
--beta_list 0.9`` entry point (reference train.py).

Expects preprocessed data under ``{data_dir}/{name}/ml_{name}.csv`` (see
``python -m zebra_tpu.data.preprocess``).

SIGTERM (preemption, maintenance events) is handled gracefully: the run
stops at the next superchunk boundary, writes a resumable full-state
checkpoint, and exits; restart with ``--resume_state <path>`` to continue
exactly (the reference loses the run — it checkpoints only at best-val
epochs, reference train.py:289-291)."""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import sys
import time

import numpy as np

# Honor JAX_PLATFORMS even on deployments whose sitecustomize force-registers
# an accelerator backend via jax.config (where the env var alone is ignored).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax  # noqa: E402

from zebra_tpu.utils.compile_cache import enable as _enable_compile_cache

from zebra_tpu.config import Config
from zebra_tpu.data.dataset import get_data, load_feat
from zebra_tpu.train.loop import Trainer


@contextlib.contextmanager
def _graceful_sigterm(trainer, logger):
    """Route SIGTERM/SIGINT to ``Trainer.request_stop`` for the duration of
    a fit: the epoch loop exits at the next superchunk boundary and writes a
    resumable state checkpoint. Second signal falls back to the previous
    handler (force-exit escape hatch)."""
    prev = {}

    def handler(signum, frame):
        logger.info(
            "signal %d: stopping at the next superchunk boundary "
            "(send again to force)", signum,
        )
        trainer.request_stop()
        for sig, h in prev.items():
            signal.signal(sig, h)

    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev[sig] = signal.signal(sig, handler)
    except ValueError:  # not the main thread (embedded use)
        prev.clear()
    try:
        yield
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)


def setup_logging(cfg: Config) -> logging.Logger:
    logger = logging.getLogger("zebra_tpu")
    logger.setLevel(logging.DEBUG)
    os.makedirs(os.path.join(cfg.log_dir, cfg.data), exist_ok=True)
    fh = logging.FileHandler(os.path.join(cfg.log_dir, cfg.data, cfg.run_name()))
    fh.setLevel(logging.DEBUG)
    ch = logging.StreamHandler()
    ch.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh.setFormatter(fmt)
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger


def main(argv=None):
    cfg = Config.from_args(argv)
    from zebra_tpu.parallel import initialize_distributed

    initialize_distributed(
        cfg.dist_coordinator, cfg.dist_num_processes, cfg.dist_process_id
    )
    # persistent compile cache (accelerator backends only — XLA:CPU's AOT
    # cache roundtrip segfaults on some programs, utils/compile_cache.py):
    # on tunneled TPU deployments a cold compile of the fused phase programs
    # dominates short runs. After initialize_distributed — this touches the
    # backend.
    _enable_compile_cache(jax)
    logger = setup_logging(cfg)
    logger.info(cfg)

    splits = get_data(cfg.data, cfg.data_dir)
    node_feats, edge_feats = load_feat(cfg.data, cfg.data_dir)
    if cfg.ignore_node_feats:
        node_feats = None

    if cfg.task == "node" and cfg.parallel_runs > 1:
        raise SystemExit(
            "--task node is single-seed: the downstream decoder consumes one "
            "model's embeddings (drop --parallel_runs, or train seed-parallel "
            "with --task link and serve one seed via run_index)"
        )
    if cfg.parallel_runs > 1:
        # all seeds advance concurrently in ONE Trainer (vmapped seed axis,
        # shared index scan) — the TPU-native form of the sequential
        # --n_runs loop; reports per-seed results and mean ± σ
        if cfg.n_runs > 1:
            logger.warning(
                "--parallel_runs %d supersedes --n_runs %d: all seeds run "
                "in one pass", cfg.parallel_runs, cfg.n_runs,
            )
        t0 = time.time()
        trainer = Trainer(cfg, splits, edge_feats, node_feats)
        with _graceful_sigterm(trainer, logger):
            results = trainer.fit(resume_from=cfg.resume_state)
        if results.get("interrupted"):
            logger.info(
                "parallel run interrupted; resume with --resume_state %s",
                results["state_path"],
            )
            return
        logger.info(
            "%d parallel runs finished in %.1fs: %s",
            cfg.parallel_runs, time.time() - t0, results,
        )
        return

    for run in range(cfg.n_runs):
        t0 = time.time()
        trainer = Trainer(
            cfg.replace(seed=cfg.seed + run), splits, edge_feats, node_feats
        )
        with _graceful_sigterm(trainer, logger):
            results = trainer.fit(
                resume_from=cfg.resume_state if run == 0 else None
            )
        if results.get("interrupted"):
            logger.info(
                "run %d interrupted; resume with --resume_state %s",
                run, results["state_path"],
            )
            return
        if cfg.task == "node":
            # downstream node classification on the frozen link-trained
            # model (--task node): decoder on source embeddings vs event
            # labels, ROC-AUC per stream
            from zebra_tpu.train.node_classification import (
                run_node_classification,
            )

            node = run_node_classification(
                trainer, n_steps=cfg.node_decoder_steps,
                lr=cfg.node_decoder_lr, seed=cfg.seed + run,
            )
            results.update(node)
            logger.info(
                "node classification auc -- train: %f, val: %f, test: %f",
                node["node_train_auc"], node["node_val_auc"],
                node["node_test_auc"],
            )
        logger.info("run %d finished in %.1fs: %s", run, time.time() - t0, results)


if __name__ == "__main__":
    main()
