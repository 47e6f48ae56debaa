"""The message-source flags (reference train.py:35-36, tgn_model.py:217-218):
raw messages built from the batch's node embeddings instead of memory rows.

The reference sizes the message 2·memory_dim regardless of the flags
(tgn_model.py:60-61) and therefore cannot actually run them with the
diffusion tower (hidden_dim ≠ memory_dim); here the message layout follows
the flags (Config.message_dim)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zebra_tpu.config import Config
from zebra_tpu.models.memory import init_memory
from zebra_tpu.models.time_encoding import time_basis, time_encode


def _cfg(**kw):
    base = dict(
        data="t", bs=4, node_dim=8, time_dim=8, memory_dim=8, topk=3,
        alpha_list=(0.1,), beta_list=(0.9,), edge_dim=2, n_nodes=32, n_edges=64,
    )
    base.update(kw)
    return Config(**base)


def test_message_dim_follows_flags():
    c0 = _cfg()
    cs = _cfg(use_source_embedding_in_message=True)
    cd = _cfg(use_destination_embedding_in_message=True)
    cb = _cfg(use_source_embedding_in_message=True,
              use_destination_embedding_in_message=True)
    h = c0.hidden_dim  # node_dim * (M+1) = 16 for the diffusion tower
    assert c0.message_dim == 8 + 8 + 2 + 8
    assert cs.message_dim == h + 8 + 2 + 8
    assert cd.message_dim == 8 + h + 2 + 8
    assert cb.message_dim == h + h + 2 + 8


@pytest.mark.parametrize("src_flag,dst_flag", [(True, False), (False, True), (True, True)])
def test_store_messages_uses_embeddings(src_flag, dst_flag):
    """Stored pending message = [snd_part; rcv_part; edge_feat; Δt-encoding]
    where each part is the positional embedding when flagged, the memory row
    otherwise — both directions (reference tgn_model.py:160-164, 217-218)."""
    from zebra_tpu.train.step import _store_messages
    from zebra_tpu.models.tgn import init_tgn_params
    import jax

    cfg = _cfg(use_source_embedding_in_message=src_flag,
               use_destination_embedding_in_message=dst_flag,
               message_dtype="float32")
    params = init_tgn_params(jax.random.PRNGKey(0), cfg)
    mem = init_memory(cfg.n_nodes, cfg.memory_dim, cfg.msg_table_dim,
                      jnp.float32)
    rng = np.random.RandomState(0)
    mem = mem._replace(
        memory=jnp.asarray(rng.randn(cfg.n_nodes, cfg.memory_dim), jnp.float32)
    )
    edge_feats = jnp.asarray(rng.randn(cfg.n_edges, cfg.edge_dim), jnp.float32)

    b, h = 3, cfg.hidden_dim
    src = jnp.asarray([1, 2, 3], jnp.int32)
    dst = jnp.asarray([4, 5, 6], jnp.int32)   # all-distinct: no dedup races
    t = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    eidx = jnp.asarray([10, 11, 12], jnp.int32)
    valid = jnp.ones(b, bool)
    src_emb = jnp.asarray(rng.randn(b, h), jnp.float32)
    dst_emb = jnp.asarray(rng.randn(b, h), jnp.float32)

    out = _store_messages(cfg, params, mem, edge_feats, src, dst, t, eidx,
                          valid, src_emb, dst_emb)

    basis = time_basis(cfg.time_dim)
    memory = np.asarray(mem.memory)
    for i in range(b):
        for snd, rcv, s_part, r_part in (
            (int(src[i]), int(dst[i]),
             src_emb[i] if src_flag else memory[int(src[i])],
             dst_emb[i] if dst_flag else memory[int(dst[i])]),
            (int(dst[i]), int(src[i]),
             dst_emb[i] if src_flag else memory[int(dst[i])],
             src_emb[i] if dst_flag else memory[int(src[i])]),
        ):
            # the sender part is stored only when it is an embedding
            # (compact layout otherwise re-attaches the memory row at
            # consumption — Config.compact_messages)
            head = [np.asarray(s_part)] if src_flag else []
            want = np.concatenate(head + [
                np.asarray(r_part),
                np.asarray(edge_feats[int(eidx[i])]),
                np.asarray(time_encode(t[i] - mem.last_update[snd], basis)),
            ])
            got = np.asarray(out.messages[snd][:-1])  # last col = flag
            np.testing.assert_allclose(got, want, rtol=1e-6)
            assert bool(out.msg_flag[snd])


def test_train_end_to_end_with_embedding_messages():
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer

    data, edge_feats = synthetic_stream(
        n_events=600, n_users=30, n_items=30, edge_dim=4, seed=0
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    cfg = Config(
        data="msgsrc", bs=50, index_chunk=200, node_dim=12, time_dim=12,
        memory_dim=12, topk=4, alpha_list=(0.1,), beta_list=(0.9,),
        lr=3e-3, checkpoint_dir="/tmp/zebra_msgsrc_ckpt",
        use_source_embedding_in_message=True,
        use_destination_embedding_in_message=True,
    )
    trainer = Trainer(cfg, splits, edge_feats)
    assert trainer.mem.messages.shape[1] == trainer.cfg.message_dim + 1
    r1 = trainer.train_epoch()
    r2 = trainer.train_epoch()
    assert np.isfinite(r1.loss) and np.isfinite(r2.loss)
    trans, induct = trainer.validate()
    assert np.isfinite(trans.ap) and np.isfinite(induct.ap)
