"""Full-state checkpoint/resume: a restored trainer continues bit-identically
(same metrics, same state) as the uninterrupted run."""

import numpy as np

import jax

from tests.test_train_loop import _make_trainer
from zebra_tpu.utils.profiling import PhaseTimers


def test_save_restore_exact(tmp_path):
    path = str(tmp_path / "full.ckpt")

    t1 = _make_trainer("streaming")
    t1.train_epoch()
    t1.save_state(path, epoch=1)
    r_cont = t1.train_epoch()

    t2 = _make_trainer("streaming")
    assert t2.restore_state(path) == 1
    r_res = t2.train_epoch()

    assert r_cont.loss == r_res.loss
    assert r_cont.ap == r_res.ap
    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t1.mem), jax.tree.leaves(t2.mem)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(t1.index_state), jax.tree.leaves(t2.index_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_phase_timers():
    t = PhaseTimers()
    with t.time("train", n_events=100):
        pass
    with t.time("train", n_events=100):
        pass
    assert t.events["train"] == 200
    assert t.seconds["train"] >= 0
    assert "train" in t.summary()
