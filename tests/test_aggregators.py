"""Message-function and aggregator options (mlp / mean) train end to end and
have the intended semantics. Both are declared but unrunnable in the
reference (message_function='mlp' hits an unbound local, tgn_model.py:64;
the aggregators have no call sites)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_loop import _make_trainer


@pytest.mark.parametrize(
    "kw",
    [
        dict(message_function="mlp"),
        dict(aggregator="mean"),
        dict(message_function="mlp", aggregator="mean"),
    ],
    ids=["mlp-msg", "mean-agg", "mlp+mean"],
)
def test_variants_train(kw):
    trainer = _make_trainer("streaming", n_events=800, **kw)
    r1 = trainer.train_epoch()
    r2 = trainer.train_epoch()
    assert np.isfinite(r2.loss)
    assert r2.loss < r1.loss, (kw, r1.loss, r2.loss)
    trans, induct = trainer.validate()
    assert np.isfinite(trans.ap) and np.isfinite(induct.ap)


def test_mean_aggregator_accumulates():
    """Two messages to the same node within one batch average at commit."""
    from zebra_tpu.config import Config
    from zebra_tpu.models.memory import init_memory
    from zebra_tpu.models.tgn import init_tgn_params, message_input
    from zebra_tpu.train.step import _store_messages

    cfg = Config(
        node_dim=8, time_dim=8, memory_dim=8, aggregator="mean",
        alpha_list=(0.1,), beta_list=(0.9,),
    ).replace(n_nodes=16, n_edges=32, edge_dim=2)
    params = init_tgn_params(jax.random.PRNGKey(0), cfg)
    mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim)
    edge_feats = jnp.asarray(
        np.random.RandomState(0).randn(cfg.n_edges, 2), jnp.float32
    )

    # node 1 interacts twice (with 2 then 3); node 5 once
    src = jnp.asarray([1, 1, 5], jnp.int32)
    dst = jnp.asarray([2, 3, 6], jnp.int32)
    t = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    eidx = jnp.asarray([1, 2, 3], jnp.int32)
    valid = jnp.ones(3, bool)

    mem2 = _store_messages(cfg, params, mem, edge_feats, src, dst, t, eidx, valid)
    counts = np.asarray(mem2.msg_count)
    assert counts[1] == 2.0 and counts[5] == 1.0 and counts[2] == 1.0
    assert float(mem2.msg_ts[1]) == 2.0  # newest pending timestamp

    # the cell input is the mean of the accumulated messages (the last
    # message column is the pending-flag accumulator, not cell input); under
    # the compact layout the sender-memory prefix is re-attached unaveraged
    raw, flag = message_input(cfg, params, mem2, jnp.asarray([1]))
    got = np.asarray(raw)[0]
    assert bool(flag[0])
    total = np.asarray(mem2.messages)[1, :-1]
    d = cfg.memory_dim
    np.testing.assert_allclose(got[:d], np.asarray(mem2.memory)[1], rtol=1e-6)
    np.testing.assert_allclose(got[d:], total / 2.0, rtol=1e-6)
