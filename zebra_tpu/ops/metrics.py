"""Link-prediction metrics in pure jnp, computed on device.

The reference syncs probabilities to host every batch and calls sklearn
(reference train.py:218-227, evaluation/evaluation.py:34-45); here the
per-batch AP / AUC / rank-accuracy run on the TPU so the train loop never
blocks on a device→host transfer. Semantics match sklearn on tie-free scores
(verified against sklearn in tests); each function takes a validity mask so
ragged tail batches are exact.

Inputs are per-batch positive/negative scores of equal length b (one negative
per positive, the reference's NUM_NEG=1 protocol)."""

from __future__ import annotations

import jax.numpy as jnp


def masked_ap(pos: jnp.ndarray, neg: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Average precision over the 2·n_valid scored samples (positives labeled
    1). Equals sklearn.average_precision_score for tie-free scores."""
    scores = jnp.concatenate([pos, neg])
    labels = jnp.concatenate([valid, jnp.zeros_like(valid)]).astype(jnp.float32)
    vmask = jnp.concatenate([valid, valid])
    s = jnp.where(vmask, scores, -jnp.inf)  # invalid ranked last, label 0
    order = jnp.argsort(-s, stable=True)
    l_sorted = labels[order]
    ranks = jnp.arange(1, s.shape[0] + 1, dtype=jnp.float32)
    precision = jnp.cumsum(l_sorted) / ranks
    n_pos = jnp.sum(labels)
    return jnp.sum(precision * l_sorted) / jnp.maximum(n_pos, 1.0)


def masked_auc(pos: jnp.ndarray, neg: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """ROC-AUC via the pairwise Mann-Whitney statistic (exact, incl. 0.5 per
    tied pair). O(b²) — trivial at reference batch sizes."""
    pair_valid = valid[:, None] & valid[None, :]
    gt = (pos[:, None] > neg[None, :]) & pair_valid
    eq = (pos[:, None] == neg[None, :]) & pair_valid
    n = jnp.maximum(jnp.sum(pair_valid), 1)
    return (jnp.sum(gt) + 0.5 * jnp.sum(eq)) / n


def masked_rank_acc(pos: jnp.ndarray, neg: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Fraction of events whose positive outscores its own negative. Ties
    count as correct — the reference's argmax over hstack([pos, neg]) picks
    index 0 on ties (train.py:224)."""
    correct = (pos >= neg) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
