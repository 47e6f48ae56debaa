"""zebra_tpu — a TPU-native framework for training temporal graph neural networks
on continuous-time dynamic graphs via streaming top-k temporal personalized
PageRank (T-PPR) indices.

Built from scratch for TPU (JAX / XLA / Pallas / pjit). Capability parity target:
LuckyLYM/Zebra (PVLDB'23), see SURVEY.md. The compute path is pure functional JAX:

- ``zebra_tpu.index``   — dense, on-device streaming T-PPR index (SANTA recurrence
  as a ``lax.scan``; Pallas kernel for the hot merge/top-k path) plus the stateless
  pruned temporal-BFS query over a padded-CSR neighbor index.
- ``zebra_tpu.models``  — TGN-family model stack: node memory + GRU/RNN updater,
  Bochner time encoding, diffusion/attention/sum embedding towers, link head.
- ``zebra_tpu.data``    — event-stream datasets, chronological splits with the
  inductive new-node holdout protocol, offline preprocessors, negative samplers.
- ``zebra_tpu.train``   — functional training loop, two-phase memory protocol,
  evaluation, checkpointing, early stopping.
- ``zebra_tpu.parallel``— device-mesh sharding (data-parallel towers, replicated
  or row-sharded index state) via ``jax.sharding`` + ``shard_map``.
- ``zebra_tpu.ops``     — metrics (AP/AUC/acc) and TPU kernels.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences: ``zebra_tpu.Trainer``, ``Config``,
    ``LinkPredictor`` without importing jax at package import time."""
    if name == "Config":
        from zebra_tpu.config import Config

        return Config
    if name == "Trainer":
        from zebra_tpu.train.loop import Trainer

        return Trainer
    if name == "LinkPredictor":
        from zebra_tpu.serve import LinkPredictor

        return LinkPredictor
    raise AttributeError(name)
