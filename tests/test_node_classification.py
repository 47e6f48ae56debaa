"""Node classification: embedding collection runs with the eval protocol, the
decoder learns separable labels, and AUC is computed correctly."""

import numpy as np
import pytest

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


def test_run_node_classification_protocol():
    """The full downstream protocol (--task node): chronological replay over
    train→val→test, decoder fit on train embeddings, AUC well above chance
    on labels tied to source identity."""
    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer
    from zebra_tpu.train.node_classification import run_node_classification

    data, edge_feats = synthetic_stream(
        n_events=1200, n_users=40, n_items=40, edge_dim=4, seed=0,
        label_users_frac=0.3,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    assert splits.train.labels.sum() > 0 and splits.test.labels.sum() > 0
    cfg = Config(
        data="synthetic", bs=50, index_chunk=200, node_dim=16, time_dim=16,
        memory_dim=16, topk=5, alpha_list=(0.1,), beta_list=(0.9,),
        tppr_strategy="streaming", lr=3e-3, n_epoch=2,
        checkpoint_dir="/tmp/zebra_nc_ckpt",
    )
    trainer = Trainer(cfg, splits, edge_feats)
    trainer.train_epoch()
    trainer.train_epoch()

    out = run_node_classification(trainer, n_steps=300)
    assert set(out) == {"node_train_auc", "node_val_auc", "node_test_auc"}
    # protocol-level check: decoder beats chance on the stream it was fit
    # on and produces finite scores downstream (decoder *quality* on
    # separable labels is asserted in test_collect_and_classify; at this
    # tiny config identity labels are only weakly linearly separable)
    assert out["node_train_auc"] > 0.55, out
    assert np.isfinite(out["node_val_auc"]), out
    assert np.isfinite(out["node_test_auc"]), out


def test_run_node_classification_rejects_seed_parallel():
    from tests.test_train_loop import _make_trainer
    from zebra_tpu.train.node_classification import run_node_classification

    trainer = _make_trainer("streaming", n_events=400, parallel_runs=2)
    with pytest.raises(ValueError, match="single-seed"):
        run_node_classification(trainer)
