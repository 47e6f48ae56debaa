"""Device metrics must match sklearn on tie-free scores, including ragged
(masked) batches."""

import numpy as np
import jax.numpy as jnp
from sklearn.metrics import accuracy_score, average_precision_score, roc_auc_score

from zebra_tpu.ops.metrics import masked_ap, masked_auc, masked_rank_acc


def _sklearn_ref(pos, neg):
    pred = np.concatenate([pos, neg])
    true = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    pred_binary = np.argmax(np.stack([pos, neg], axis=1), axis=1)
    return (
        average_precision_score(true, pred),
        roc_auc_score(true, pred),
        accuracy_score(np.zeros(len(pos)), pred_binary),
    )


def test_metrics_match_sklearn():
    rs = np.random.RandomState(0)
    for trial in range(5):
        b = 50
        pos = rs.beta(3, 2, b).astype(np.float32)
        neg = rs.beta(2, 3, b).astype(np.float32)
        want_ap, want_auc, want_acc = _sklearn_ref(pos, neg)
        valid = np.ones(b, bool)
        np.testing.assert_allclose(
            float(masked_ap(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
            want_ap, rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(masked_auc(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
            want_auc, rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(masked_rank_acc(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
            want_acc, rtol=1e-5,
        )


def test_masked_equals_truncated():
    """Padding entries must not change the result: metric(first v valid of b)
    == metric(v-length arrays)."""
    rs = np.random.RandomState(1)
    b, v = 32, 19
    pos = rs.rand(b).astype(np.float32)
    neg = rs.rand(b).astype(np.float32)
    valid = np.zeros(b, bool)
    valid[:v] = True

    want_ap, want_auc, want_acc = _sklearn_ref(pos[:v], neg[:v])
    np.testing.assert_allclose(
        float(masked_ap(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
        want_ap, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(masked_auc(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
        want_auc, rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(masked_rank_acc(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(valid))),
        want_acc, rtol=1e-5,
    )
