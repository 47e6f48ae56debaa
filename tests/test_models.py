"""Model building blocks: numerics vs torch reference conventions, shapes,
and semantic invariants of the towers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zebra_tpu.config import Config
from zebra_tpu.models.cells import gru_apply, gru_init, rnn_apply, rnn_init
from zebra_tpu.models.tgn import (
    affinity_score,
    diffusion_embed,
    init_tgn_params,
)
from zebra_tpu.models.time_encoding import time_basis, time_encode


def test_time_encoding_matches_torch_reference():
    """cos(Δt·ω) with ω = 1/10^linspace(0,9,d) (reference
    model/time_encoding.py:17-28)."""
    import torch

    dim = 16
    t = np.array([0.0, 1.0, 10.0, 12345.6], np.float32)

    w = torch.nn.Linear(1, dim)
    w.weight = torch.nn.Parameter(
        torch.from_numpy(1 / 10 ** np.linspace(0, 9, dim, dtype=np.float32)).reshape(
            dim, -1
        )
    )
    w.bias = torch.nn.Parameter(torch.zeros(dim))
    want = torch.cos(w(torch.from_numpy(t).unsqueeze(1))).detach().numpy()

    got = np.asarray(time_encode(jnp.asarray(t), time_basis(dim)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "rnn"])
def test_cells_match_torch(cell):
    import torch

    d_in, d_h, b = 12, 8, 5
    rng = jax.random.PRNGKey(0)
    init, apply = (gru_init, gru_apply) if cell == "gru" else (rnn_init, rnn_apply)
    params = init(rng, d_in, d_h)

    t_cell = (torch.nn.GRUCell if cell == "gru" else torch.nn.RNNCell)(d_in, d_h)
    with torch.no_grad():
        t_cell.weight_ih.copy_(torch.from_numpy(np.asarray(params["w_ih"]).T))
        t_cell.weight_hh.copy_(torch.from_numpy(np.asarray(params["w_hh"]).T))
        t_cell.bias_ih.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        t_cell.bias_hh.copy_(torch.from_numpy(np.asarray(params["b_hh"])))

    x = np.random.RandomState(1).randn(b, d_in).astype(np.float32)
    h = np.random.RandomState(2).randn(b, d_h).astype(np.float32)
    want = t_cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    got = np.asarray(apply(params, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _toy_cfg(**kw):
    base = dict(
        node_dim=8, time_dim=8, memory_dim=8, topk=4,
        alpha_list=(0.1, 0.2), beta_list=(0.9, 0.8), bs=4,
    )
    base.update(kw)
    return Config(**base).replace(n_nodes=20, n_edges=50, edge_dim=3)


def test_diffusion_embed_shapes_and_weighting():
    cfg = _toy_cfg()
    params = init_tgn_params(jax.random.PRNGKey(0), cfg)
    m, q, k, d = cfg.n_tppr, 6, cfg.topk, cfg.node_dim

    rs = np.random.RandomState(0)
    src_mem = jnp.asarray(rs.randn(q, d), jnp.float32)
    nbr_mem = jnp.asarray(rs.randn(m, q, k, d), jnp.float32)
    edge_feat = jnp.asarray(rs.randn(m, q, k, cfg.edge_dim), jnp.float32)
    dt = jnp.asarray(rs.rand(m, q, k), jnp.float32)
    w = jnp.asarray(rs.rand(m, q, k), jnp.float32)
    from zebra_tpu.models.time_encoding import time_basis, time_encode

    static = jnp.concatenate(
        [edge_feat, time_encode(dt, time_basis(cfg.time_dim))], axis=-1
    )

    emb = diffusion_embed(cfg, params, src_mem, nbr_mem, static, w,
                          None, train=False)
    assert emb.shape == (q, d * (m + 1))

    # empty queries (all weights 0) contribute exactly zero neighbor parts —
    # the reference's zero-sum guard (embedding_module.py:271)
    emb0 = diffusion_embed(
        cfg, params, src_mem, nbr_mem, static, jnp.zeros_like(w),
        None, train=False,
    )
    np.testing.assert_allclose(np.asarray(emb0[:, d:]), 0.0, atol=1e-6)
    # source part unaffected by weights
    np.testing.assert_allclose(
        np.asarray(emb0[:, :d]), np.asarray(emb[:, :d]), rtol=1e-6
    )

    # weight normalization: scaling all weights by a constant changes nothing
    emb2 = diffusion_embed(cfg, params, src_mem, nbr_mem, static, 7.5 * w,
                           None, train=False)
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb), rtol=1e-4)


def test_affinity_head_matches_torch_mergelayer():
    import torch

    cfg = _toy_cfg()
    params = init_tgn_params(jax.random.PRNGKey(1), cfg)
    h = cfg.hidden_dim

    fc1 = torch.nn.Linear(2 * h, h)
    fc2 = torch.nn.Linear(h, 1)
    with torch.no_grad():
        fc1.weight.copy_(torch.from_numpy(np.asarray(params["affinity_fc1"]["w"]).T))
        fc1.bias.copy_(torch.from_numpy(np.asarray(params["affinity_fc1"]["b"])))
        fc2.weight.copy_(torch.from_numpy(np.asarray(params["affinity_fc2"]["w"]).T))
        fc2.bias.copy_(torch.from_numpy(np.asarray(params["affinity_fc2"]["b"])))

    rs = np.random.RandomState(3)
    e1 = rs.randn(5, h).astype(np.float32)
    e2 = rs.randn(5, h).astype(np.float32)
    x = torch.cat([torch.from_numpy(e1), torch.from_numpy(e2)], dim=1)
    want = fc2(torch.relu(fc1(x))).detach().numpy()[:, 0]
    got = np.asarray(affinity_score(params, jnp.asarray(e1), jnp.asarray(e2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
