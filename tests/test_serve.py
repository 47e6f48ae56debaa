"""Serving wrapper: scores agree with training-side evaluation and observe()
keeps state current."""

import numpy as np

from tests.test_train_loop import _make_trainer
from zebra_tpu.serve import LinkPredictor


def test_score_and_observe():
    trainer = _make_trainer("streaming")
    trainer.fit(n_epoch=3)

    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    b = 32
    src, dst, t = test.sources[:b], test.destinations[:b], test.timestamps[:b]

    probs = predictor.score(src, dst, t)
    assert probs.shape == (b,)
    assert np.all((probs >= 0) & (probs <= 1))

    # real continuations should outscore random pairs on average
    rng = np.random.RandomState(0)
    rand_dst = rng.choice(np.unique(trainer.splits.full.destinations), b)
    rand_probs = predictor.score(src, rand_dst, t)
    assert probs.mean() > rand_probs.mean(), (probs.mean(), rand_probs.mean())

    # ingesting events mutates memory/index without breaking scoring
    predictor.observe(src, dst, t, test.edge_idxs[:b])
    probs2 = predictor.score(
        test.sources[b : 2 * b],
        test.destinations[b : 2 * b],
        test.timestamps[b : 2 * b],
    )
    assert np.all(np.isfinite(probs2))


def test_score_read_only():
    trainer = _make_trainer("streaming")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    before = np.asarray(predictor.index_state.data).copy()
    mem_before = np.asarray(predictor.mem.memory).copy()

    test = trainer.splits.test
    predictor.score(test.sources[:16], test.destinations[:16],
                    test.timestamps[:16])

    np.testing.assert_array_equal(np.asarray(predictor.index_state.data), before)
    np.testing.assert_array_equal(np.asarray(predictor.mem.memory), mem_before)


def test_read_topk_matches_scan_extraction():
    """The serving fast path (gather-only read_topk) must emit exactly what
    the sequential scan's pre-edge extraction would for the same queries."""
    import jax
    import jax.numpy as jnp

    from zebra_tpu.index.streaming import read_topk, streaming_scan

    trainer = _make_trainer("streaming")
    trainer.train_epoch()
    state = trainer.index_state
    cfg = trainer.cfg
    test = trainer.splits.test
    b = 24
    src = np.asarray(test.sources[:b], np.int32)
    dst = np.asarray(test.destinations[:b], np.int32)
    t = np.asarray(test.timestamps[:b], np.float32)

    q_fast = read_topk(
        state, jnp.stack([jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(dst)], axis=1),
        jnp.asarray(t), cfg.n_tppr, cfg.topk,
    )
    # oracle: zero-validity scan emits pre-edge rows without mutating state
    _, q_scan = streaming_scan(
        jax.tree.map(jnp.copy, state),
        trainer._tppr_params, src, dst, dst, t,
        np.zeros(b, np.int32), np.zeros(b, bool),
    )
    for a, b_ in zip(q_fast, q_scan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_observe_with_embedding_messages():
    trainer = _make_trainer(
        "streaming",
        use_source_embedding_in_message=True,
        use_destination_embedding_in_message=True,
    )
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    b = 16
    predictor.observe(test.sources[:b], test.destinations[:b],
                      test.timestamps[:b], test.edge_idxs[:b])
    probs = predictor.score(test.sources[b : 2 * b],
                            test.destinations[b : 2 * b],
                            test.timestamps[b : 2 * b])
    assert np.all(np.isfinite(probs))


def test_score_with_pruning_strategy():
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    probs = predictor.score(test.sources[:16], test.destinations[:16],
                            test.timestamps[:16])
    assert probs.shape == (16,)
    assert np.all(np.isfinite(probs))
