"""Node classification: embedding collection runs with the eval protocol, the
decoder learns separable labels, and AUC is computed correctly."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_train_loop import _make_trainer
from zebra_tpu.train.node_classification import (
    collect_source_embeddings,
    decoder_apply,
    eval_node_classification,
    init_decoder,
    train_node_classifier,
)


def test_collect_and_classify():
    trainer = _make_trainer("streaming", n_events=800)
    trainer.train_epoch()
    cfg = trainer.cfg

    stream, n_batches, _, _ = trainer._streams["train"]
    mem, idx, embs = collect_source_embeddings(
        cfg, n_batches, trainer.params,
        jax.tree.map(jnp.copy, trainer.mem),
        jax.tree.map(jnp.copy, trainer.index_state),
        trainer.edge_feats, (), stream,
    )
    h = cfg.hidden_dim
    embs = np.asarray(embs).reshape(-1, h)
    valid = np.asarray(stream.valid)
    embs = embs[valid]
    assert np.isfinite(embs).all()

    # synthetic separable labels: positive iff a chosen embedding direction
    # is above median — the decoder must fit this easily
    rng = np.random.RandomState(0)
    w = rng.randn(h)
    score = embs @ w
    labels = (score > np.median(score)).astype(np.float32)

    params = train_node_classifier(
        jnp.asarray(embs), jnp.asarray(labels), jax.random.PRNGKey(0),
        n_steps=300,
    )
    auc = eval_node_classification(params, jnp.asarray(embs), jnp.asarray(labels))
    assert auc > 0.9, auc


def test_decoder_shapes():
    p = init_decoder(jax.random.PRNGKey(0), 24)
    x = jnp.zeros((7, 24))
    out = decoder_apply(p, x, train=False)
    assert out.shape == (7,)


def test_collect_non_diffusion_tower():
    """Collection must also run for the recursive/identity towers (q is None
    there — guards the batch-size binding regression)."""
    trainer = _make_trainer("streaming", n_events=400,
                            embedding_module="identity")
    trainer.train_epoch()
    cfg = trainer.cfg
    stream, n_batches, _, _ = trainer._streams["train"]
    _, _, embs = collect_source_embeddings(
        cfg, n_batches, trainer.params,
        jax.tree.map(jnp.copy, trainer.mem), (),
        trainer.edge_feats, trainer.train_nbr_index, stream,
    )
    assert np.isfinite(np.asarray(embs)).all()
