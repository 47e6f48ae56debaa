"""Multi-device sharding: the full train step must compile and run over a
virtual 8-device mesh with row-sharded node state, and produce the same
numbers as the single-device run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zebra_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_index_state,
    shard_memory,
    shard_params,
    shard_queries,
)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """One training chunk with sharded state == unsharded state bit-for-bit
    (same program, XLA inserts collectives)."""
    import __graft_entry__ as g

    from zebra_tpu.index.streaming import streaming_scan
    from zebra_tpu.train.step import Batch, train_chunk

    trainer = g._toy_setup()
    cfg = trainer.cfg

    tr = trainer.splits.train
    n = trainer.chunk
    rng_np = np.random.RandomState(0)
    src = tr.sources[:n].astype(np.int32)
    dst = tr.destinations[:n].astype(np.int32)
    neg = rng_np.randint(1, cfg.n_nodes, n).astype(np.int32)
    t = tr.timestamps[:n].astype(np.float32)
    eidx = tr.edge_idxs[:n].astype(np.int32)
    valid = np.ones(n, bool)

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
        index_state, queries = streaming_scan(
            index_state, trainer.tppr_params, src, dst, neg, t, eidx, valid
        )
        batch = Batch(
            src=jnp.asarray(src), dst=jnp.asarray(dst), neg=jnp.asarray(neg),
            t=jnp.asarray(t), eidx=jnp.asarray(eidx), valid=jnp.asarray(valid),
        )
        if shard:
            batch = shard_batch(batch, mesh)
            queries = shard_queries(queries, mesh)
        rng = jax.random.PRNGKey(0)
        params, _, mem, metrics = train_chunk(
            cfg, trainer.n_b, params, opt_state, mem, rng,
            trainer.edge_feats, batch, queries,
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
