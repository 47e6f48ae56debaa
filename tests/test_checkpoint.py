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
    assert t2.restore_state(path) == (1, 0)
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


def test_mid_epoch_cursor_resume_exact(tmp_path):
    """Stopping an epoch at a superchunk boundary, checkpointing the cursor,
    and resuming in a fresh Trainer lands on bit-identical state to an
    uninterrupted epoch (same negatives, same dropout keys)."""
    path = str(tmp_path / "mid.ckpt")

    # uninterrupted epoch (fixed host RNG so negatives match across trainers)
    t1 = _make_trainer("streaming")
    n_chunks = t1._streams["train"].n_chunks
    assert n_chunks >= 2, "test needs multiple superchunks"
    t1.train_epoch()

    t2 = _make_trainer("streaming")
    t2.train_epoch(max_chunks=2)
    assert t2._chunk_cursor == 2
    t2.save_state(path, epoch=0)

    t3 = _make_trainer("streaming")
    epoch, chunk = t3.restore_state(path)
    assert (epoch, chunk) == (0, 2)
    t3.train_epoch(start_chunk=chunk)

    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(t1.mem), jax.tree.leaves(t3.mem)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(t1.index_state), jax.tree.leaves(t3.index_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_raw_tree_checkpoint_loads(tmp_path):
    """Round-1 checkpoints (raw pickled trees, no version wrapper) load."""
    import pickle

    from zebra_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "legacy.ckpt")
    tree = {"a": np.arange(3), "b": 7}
    with open(path, "wb") as f:
        pickle.dump(tree, f)
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["a"], tree["a"])

    # versioned round-trip
    save_checkpoint(path, tree)
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["a"], tree["a"])

    # future versions refuse to load
    with open(path, "wb") as f:
        pickle.dump({"magic": "zebra_tpu_checkpoint", "version": 99,
                     "tree": {}}, f)
    import pytest

    with pytest.raises(ValueError, match="version 99"):
        load_checkpoint(path)


def test_phase_timers():
    t = PhaseTimers()
    with t.time("train", n_events=100):
        pass
    with t.time("train", n_events=100):
        pass
    assert t.events["train"] == 200
    assert t.seconds["train"] >= 0
    assert "train" in t.summary()

def test_fit_resume_from_state(tmp_path):
    """fit(resume_from=...) continues a --state_every checkpoint exactly:
    same final test metrics as the uninterrupted fit, including the restored
    early-stop monitor."""
    ckpt_dir = str(tmp_path / "ck")
    t1 = _make_trainer("streaming", checkpoint_dir=ckpt_dir, state_every=2,
                       save_best=True)
    full = t1.fit(n_epoch=4)
    state_path = t1.cfg.checkpoint_dir + "/" + t1.cfg.run_name() + ".state.ckpt"

    t2 = _make_trainer("streaming", checkpoint_dir=ckpt_dir, state_every=0,
                       save_best=True)
    resumed = t2.fit(n_epoch=4, resume_from=state_path)

    for k in ("test_ap", "test_auc", "nn_test_ap", "stop_epoch"):
        assert np.isclose(full[k], resumed[k], rtol=1e-5, atol=1e-6), (
            k, full[k], resumed[k],
        )


def test_restore_rejects_incompatible_config(tmp_path):
    """Restoring a checkpoint written under different state-shaping fields
    (topk / dims / n_nodes / strategy / dtypes / α-β) fails with a named
    field-level diff, not a deep XLA shape error. topk especially: two index
    states with different k can have EQUAL row counts and would otherwise
    silently restore at the wrong packed layout."""
    import pytest

    path = str(tmp_path / "compat.ckpt")
    t1 = _make_trainer("streaming", topk=5)
    t1.train_epoch()
    t1.save_state(path, epoch=1)

    for kw, field in [
        (dict(topk=4), "topk"),
        (dict(memory_dim=32, node_dim=32), "memory_dim"),
        (dict(alpha_list=(0.2,), beta_list=(0.9,)), "alpha_list"),
        (dict(tppr_strategy="pruning"), "tppr_strategy"),
        (dict(memory_dtype="float32"), "memory_dtype"),
        (dict(parallel_runs=2), "parallel_runs"),
    ]:
        t2 = _make_trainer("streaming", **{"topk": 5, **kw})
        with pytest.raises(ValueError, match=field):
            t2.restore_state(path)

    # the matching config still restores
    t3 = _make_trainer("streaming", topk=5)
    assert t3.restore_state(path) == (1, 0)


def test_state_compat_diff_fields():
    from zebra_tpu.config import Config

    a = Config(topk=5, alpha_list=(0.1,), beta_list=(0.9,))
    assert Config.state_compat_diff(a, a) == []
    # list vs tuple α/β is not a mismatch
    b = a.replace(alpha_list=[0.1], beta_list=[0.9])
    assert Config.state_compat_diff(a, b) == []
    # run-shaping-only fields (lr, bs, epochs, patience) never block restore
    c = a.replace(lr=1e-2, bs=17, n_epoch=3, patience=1, index_chunk=1024)
    assert Config.state_compat_diff(a, c) == []
    # parallel_lr presence changes the optimizer pytree structure
    d = a.replace(parallel_runs=2, parallel_lr=(1e-3, 1e-4))
    e = a.replace(parallel_runs=2)
    diff = Config.state_compat_diff(d, e)
    assert len(diff) == 1 and "parallel_lr" in diff[0]
    # configs from old pickles (missing fields) upgrade before diffing
    old = Config(topk=5, alpha_list=(0.1,), beta_list=(0.9,))
    object.__delattr__(old, "real_edge_feats")
    assert Config.state_compat_diff(old, a) == []
    # n_layer shapes params only for the recursive towers (one attention/sum
    # layer per hop); vestigial for diffusion
    g1 = a.replace(embedding_module="graph_attention", n_layer=1)
    g2 = g1.replace(n_layer=2)
    diff = Config.state_compat_diff(g1, g2)
    assert len(diff) == 1 and diff[0].startswith("n_layer")
    assert Config.state_compat_diff(a, a.replace(n_layer=3)) == []


def test_config_upgrade_fills_missing_fields():
    """Configs unpickled from older checkpoints lack fields added since; the
    upgrade path must fill defaults and restore hashability (static-jit-arg
    use breaks on a missing dataclass attribute)."""
    from zebra_tpu.config import Config

    cfg = Config(data="legacy", topk=7)
    object.__delattr__(cfg, "real_edge_feats")  # simulate a pre-flag pickle
    up = Config.upgrade(cfg)
    assert up.real_edge_feats is None
    assert up.data == "legacy" and up.topk == 7
    hash(up)  # usable as a static jit argument again
