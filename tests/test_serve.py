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


def test_score_with_pruning_strategy():
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    probs = predictor.score(test.sources[:16], test.destinations[:16],
                            test.timestamps[:16])
    assert probs.shape == (16,)
    assert np.all(np.isfinite(probs))
