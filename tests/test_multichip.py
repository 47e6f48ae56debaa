"""Multi-device sharding: the fused train phase must compile and run over a
virtual 8-device mesh with row-sharded node state, and produce the same
numbers as the single-device run."""

import numpy as np

import jax
import jax.numpy as jnp

from zebra_tpu.parallel import (
    make_mesh,
    shard_index_state,
    shard_memory,
    shard_params,
)
from zebra_tpu.train.phase import run_phase


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """Fused phases with sharded state vs unsharded:

    - eval (forward-only) metrics and the sequential index state must agree
      to float precision — row/batch partitioning does not re-associate any
      per-element contraction in the forward pass or the index math;
    - a train phase must run and land in the same loss neighborhood (grad
      all-reduces over the sharded batch axis legitimately re-associate f32
      sums, and Adam amplifies the wiggle across steps, so bit-equality is
      not expected there)."""
    import __graft_entry__ as g

    trainer = g._toy_setup()
    cfg = trainer.cfg
    stream, n_batches, _, _ = trainer._streams["train"]

    def run(shard: bool, train: bool):
        params = jax.tree.map(jnp.copy, trainer.params)
        opt_state = jax.tree.map(jnp.copy, trainer.opt_state)
        mem = jax.tree.map(jnp.copy, trainer.mem)
        index_state = jax.tree.map(jnp.copy, trainer.index_state)
        if shard:
            mesh = make_mesh(8)
            params = shard_params(params, mesh)
            opt_state = shard_params(opt_state, mesh)
            mem = shard_memory(mem, mesh)
            index_state = shard_index_state(index_state, mesh)
        rng = jax.random.PRNGKey(0)
        params, opt_state, mem, index_state, metrics = run_phase(
            cfg, train, n_batches, params, opt_state, mem, index_state, rng,
            trainer.edge_feats, (), stream,
        )
        return (
            jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, mem),
            jax.tree.map(np.asarray, metrics),
            jax.tree.map(np.asarray, index_state),
        )

    # The index state must be EXACT: its math is elementwise + small sorts,
    # no matmuls, so partitioning cannot re-associate anything. Dense-tower
    # outputs go through matmuls whose accumulation blocking differs by shard
    # shape, so memory and metrics are compared statistically.
    _, m1, met1, idx1 = run(shard=False, train=False)
    _, m8, met8, idx8 = run(shard=True, train=False)
    for a, b in zip(jax.tree.leaves(idx1), jax.tree.leaves(idx8)):
        np.testing.assert_array_equal(a, b, err_msg="index state diverges")
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m8)):
        np.testing.assert_allclose(a, b, atol=1e-3, err_msg="memory diverges")
    assert abs(float(met1.ap.mean()) - float(met8.ap.mean())) < 0.05

    # training runs and lands in the same loss neighborhood
    p1, _, met1, _ = run(shard=False, train=True)
    p8, _, met8, _ = run(shard=True, train=True)
    np.testing.assert_allclose(met1.loss, met8.loss, atol=0.05,
                               err_msg="train losses in different neighborhoods")


def test_trainer_multi_device_fit():
    """Trainer with n_devices=8 trains end to end on the virtual mesh with
    row-sharded state and reaches the same quality regime."""
    from tests.test_train_loop import _make_trainer

    trainer = _make_trainer("streaming", n_devices=8)
    assert trainer._mesh is not None
    r1 = trainer.train_epoch()
    trainer.train_epoch()
    r3 = trainer.train_epoch()
    assert np.isfinite(r3.loss) and r3.loss < r1.loss
    trans, induct = trainer.validate()
    assert np.isfinite(trans.ap) and np.isfinite(induct.ap)


def test_attention_tower_multi_device():
    """Recursive towers (adjacency gathers) also run over the mesh."""
    from tests.test_train_loop import _make_trainer

    trainer = _make_trainer(
        "streaming", embedding_module="graph_attention", n_events=800,
        node_dim=16, time_dim=16, memory_dim=16, n_devices=8,
    )
    r = trainer.train_epoch()
    assert np.isfinite(r.loss)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """save_state/restore_state work under a sharded mesh: the checkpoint
    gathers the row-sharded tables to host, and a fresh sharded Trainer
    restored from it continues identically to the uninterrupted one."""
    from tests.test_train_loop import _make_trainer

    path = str(tmp_path / "mesh.ckpt")
    t1 = _make_trainer("streaming", n_devices=8)
    t1.train_epoch()
    t1.save_state(path, epoch=1)
    r_cont = t1.train_epoch()

    t2 = _make_trainer("streaming", n_devices=8)
    assert t2.restore_state(path) == (1, 0)
    r_res = t2.train_epoch()

    assert np.isclose(r_cont.loss, r_res.loss, rtol=1e-6)
    assert np.isclose(r_cont.ap, r_res.ap, rtol=1e-6)
