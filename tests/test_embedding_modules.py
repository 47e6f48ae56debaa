"""All five embedding modules train end to end; the attention layer matches
torch's MultiheadAttention at identical parameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_loop import _make_trainer


@pytest.mark.parametrize(
    "module", ["graph_attention", "graph_sum", "identity", "time"]
)
def test_module_trains(module):
    trainer = _make_trainer(
        "streaming", embedding_module=module, n_events=800,
        # query_dim = node+time must divide n_head for attention
        node_dim=16, time_dim=16, memory_dim=16,
    )
    r1 = trainer.train_epoch()
    trainer.train_epoch()
    r2 = trainer.train_epoch()
    assert np.isfinite(r1.loss) and np.isfinite(r2.loss)
    if module in ("graph_attention", "graph_sum"):
        assert r2.loss < r1.loss, (module, r1.loss, r2.loss)
    else:
        # identity/time are weak heads over raw memory (and `time` scales by
        # unnormalized Δt, so its loss is noisy — it is dead code in the
        # reference too); require learning signal via AP instead
        assert r2.ap > 0.52, (module, r1.ap, r2.ap)
    trans, induct = trainer.validate()
    assert np.isfinite(trans.ap) and np.isfinite(induct.ap)


def test_graph_attention_learns():
    trainer = _make_trainer(
        "streaming", embedding_module="graph_attention", n_events=1200,
        node_dim=16, time_dim=16, memory_dim=16,
    )
    out = trainer.fit(n_epoch=8)
    assert out["test_ap"] > 0.52, out


def test_attention_layer_matches_torch():
    import torch

    from zebra_tpu.models.attention import (
        attention_layer_apply,
        attention_layer_init,
    )

    node_dim, edge_dim, time_dim, n_head, b, n = 8, 3, 8, 2, 5, 4
    q_dim = node_dim + time_dim
    k_dim = node_dim + edge_dim + time_dim
    p = attention_layer_init(jax.random.PRNGKey(0), node_dim, edge_dim,
                             time_dim, n_head)

    mha = torch.nn.MultiheadAttention(
        embed_dim=q_dim, kdim=k_dim, vdim=k_dim, num_heads=n_head,
        dropout=0.0, batch_first=False,
    )
    with torch.no_grad():
        mha.q_proj_weight.copy_(torch.from_numpy(np.asarray(p["w_q"]).T))
        mha.k_proj_weight.copy_(torch.from_numpy(np.asarray(p["w_k"]).T))
        mha.v_proj_weight.copy_(torch.from_numpy(np.asarray(p["w_v"]).T))
        mha.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [np.asarray(p["b_q"]), np.asarray(p["b_k"]), np.asarray(p["b_v"])]
                )
            )
        )
        mha.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["w_o"]).T))
        mha.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["b_o"])))

    rs = np.random.RandomState(0)
    src = rs.randn(b, node_dim).astype(np.float32)
    src_te = rs.randn(b, time_dim).astype(np.float32)
    nbr = rs.randn(b, n, node_dim).astype(np.float32)
    nbr_te = rs.randn(b, n, time_dim).astype(np.float32)
    ef = rs.randn(b, n, edge_dim).astype(np.float32)
    valid = rs.rand(b, n) > 0.3
    valid[0] = False  # exercise the all-invalid guard

    got = attention_layer_apply(
        p, jnp.asarray(src), jnp.asarray(src_te), jnp.asarray(nbr),
        jnp.asarray(nbr_te), jnp.asarray(ef), jnp.asarray(valid), n_head,
    )

    # torch reference of the attention core (mask semantics as in the
    # reference layer: key_padding_mask True = masked out, all-invalid rows
    # unmask slot 0 then zero the output, temporal_attention.py:57-64)
    query = torch.from_numpy(np.concatenate([src, src_te], axis=1))[None]
    key = torch.from_numpy(
        np.concatenate([nbr, ef, nbr_te], axis=2)
    ).permute(1, 0, 2)
    pad = ~valid
    inv = pad.all(axis=1)
    pad[inv, 0] = False
    t_out, _ = mha(
        query, key, key, key_padding_mask=torch.from_numpy(pad)
    )
    t_out = t_out[0].detach().numpy()
    t_out[inv] = 0.0

    # compare pre-merge attention output by replaying the merge on torch's out
    x = np.concatenate([t_out, src], axis=1)
    h = np.maximum(
        x @ np.asarray(p["merge_fc1"]["w"]) + np.asarray(p["merge_fc1"]["b"]), 0
    )
    want = h @ np.asarray(p["merge_fc2"]["w"]) + np.asarray(p["merge_fc2"]["b"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
