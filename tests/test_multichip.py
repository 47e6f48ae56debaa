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
    """One fused training phase with sharded state == unsharded bit-for-bit
    (same program, XLA inserts collectives)."""
    import __graft_entry__ as g

    trainer = g._toy_setup()
    cfg = trainer.cfg
    stream, n_batches = trainer._streams["train"]

    def run(shard: bool):
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
            cfg, True, n_batches, params, opt_state, mem, index_state, rng,
            trainer.edge_feats, (), stream, trainer._pools["train"],
        )
        return (
            jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, mem),
            jax.tree.map(np.asarray, metrics),
            jax.tree.map(np.asarray, index_state),
        )

    p1, m1, met1, idx1 = run(shard=False)
    p8, m8, met8, idx8 = run(shard=True)

    for a, b in zip(jax.tree.leaves(met1), jax.tree.leaves(met8)):
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg="metrics diverge")
    for a, b in zip(jax.tree.leaves(idx1), jax.tree.leaves(idx8)):
        np.testing.assert_array_equal(a, b, err_msg="index state diverges")
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m8)):
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg="memory diverges")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg="params diverge")
