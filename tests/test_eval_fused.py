"""The fused eval store+commit (train/step.py:eval_store_commit) is
bit-identical to the two-step _store_messages → _commit_pending path it
replaces in the eval branch of the fused phase (reference protocol:
tgn_model.py:159-172 — store this batch's messages, consume immediately)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zebra_tpu.config import Config
from zebra_tpu.models.memory import init_memory
from zebra_tpu.models.tgn import init_tgn_params
from zebra_tpu.train.step import (
    _commit_pending,
    _store_messages,
    eval_store_commit,
)


def _setup(seed=0, **kw):
    cfg = Config(
        node_dim=8, time_dim=8, memory_dim=8,
        alpha_list=(0.1,), beta_list=(0.9,), **kw
    ).replace(n_nodes=32, n_edges=64, edge_dim=4)
    params = init_tgn_params(jax.random.PRNGKey(seed), cfg)
    mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim,
                      msg_dtype=cfg.message_dtype,
                      mem_dtype=cfg.memory_dtype)
    rs = np.random.RandomState(seed)
    # non-trivial starting state: warm memory, stale pending rows for some
    # nodes (the store must overwrite them in both paths)
    mem = mem._replace(
        memory=jnp.asarray(rs.randn(*mem.memory.shape), mem.memory.dtype),
        last_update=jnp.asarray(
            rs.rand(cfg.n_nodes).astype(np.float32) * 0.5
        ),
        messages=mem.messages.at[3].set(
            jnp.asarray(rs.randn(mem.messages.shape[1]), mem.messages.dtype)
        ),
        msg_count=mem.msg_count.at[3].set(1.0),
        msg_ts=mem.msg_ts.at[3].set(0.3),
    )
    edge_feats = jnp.asarray(rs.randn(cfg.n_edges, 4), jnp.float32)
    # duplicate senders across both directions (node 3 is src twice and dst
    # once; node 7 both sides) + one padding event
    src = jnp.asarray([3, 7, 3, 9, 11], jnp.int32)
    dst = jnp.asarray([7, 3, 5, 12, 13], jnp.int32)
    t = jnp.asarray([1.0, 2.0, 3.0, 4.0, 99.0], jnp.float32)
    eidx = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    valid = jnp.asarray([True, True, True, True, False])
    b = src.shape[0]
    src_emb = jnp.asarray(rs.randn(b, cfg.hidden_dim), jnp.float32)
    dst_emb = jnp.asarray(rs.randn(b, cfg.hidden_dim), jnp.float32)
    return cfg, params, mem, edge_feats, (src, dst, t, eidx, valid), (
        src_emb, dst_emb,
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(message_function="mlp"),
        dict(memory_dtype="float32", message_dtype="float32"),
        dict(use_source_embedding_in_message=True),
        dict(use_destination_embedding_in_message=True),
        dict(memory_updater="rnn"),
    ],
    ids=["default", "mlp-msg", "f32", "src-emb", "dst-emb", "rnn"],
)
def test_fused_matches_two_step(kw):
    cfg, params, mem, edge_feats, ev, embs = _setup(**kw)
    src, dst, t, eidx, valid = ev
    need_emb = (
        cfg.use_source_embedding_in_message
        or cfg.use_destination_embedding_in_message
    )
    src_emb, dst_emb = embs if need_emb else (None, None)

    positives = jnp.concatenate([src, dst])
    valid2 = jnp.concatenate([valid, valid])
    ref = _store_messages(cfg, params, mem, edge_feats, src, dst, t, eidx,
                          valid, src_emb, dst_emb)
    ref = _commit_pending(cfg, params, ref, positives, valid2)

    got = eval_store_commit(cfg, params, mem, edge_feats, src, dst, t, eidx,
                            valid, src_emb, dst_emb)

    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
