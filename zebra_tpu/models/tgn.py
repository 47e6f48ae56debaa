"""TGN model stack: parameter initialization and the pure forward functions.

Components (reference model/tgn_model.py:14-233, modules/embedding_module.py:76-331):

- diffusion embedding tower: shared-across-ensemble neighbor MLP
  fc2(drop(relu(fc1([mem_nbr; edge_feat; time_enc(Δt)])))) with
  weight-normalized top-k sum, plus a source MLP on the query node's memory;
  member outputs concatenate to [·, node_dim·(M+1)].
- GRU/RNN memory-updater cell (message_dim → memory_dim).
- MergeLayer link head scoring concat(src‖src) against concat(dst‖neg).

Weight init mirrors the reference: Xavier-normal tower/head weights
(embedding_module.py:90-98, util.py:20-21), torch-Linear-default uniform
biases, U(-1/√H) cell params."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from zebra_tpu.config import Config
from zebra_tpu.models.cells import CELLS, matmul
from zebra_tpu.models.time_encoding import time_basis, time_encode

TgnParams = Dict[str, Any]


# ------------------------------------------------------------------ init

def _linear_init(rng, d_in: int, d_out: int, xavier: bool = True):
    k_w, k_b = jax.random.split(rng)
    if xavier:
        std = jnp.sqrt(2.0 / (d_in + d_out))
        w = jax.random.normal(k_w, (d_in, d_out), jnp.float32) * std
    else:
        bound = 1.0 / jnp.sqrt(d_in)
        w = jax.random.uniform(k_w, (d_in, d_out), jnp.float32, -bound, bound)
    bound = 1.0 / jnp.sqrt(d_in)
    b = jax.random.uniform(k_b, (d_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _linear(p, x):
    return x @ p["w"] + p["b"]


def init_tgn_params(rng, cfg: Config) -> TgnParams:
    assert cfg.node_dim == cfg.memory_dim, (
        "all towers feed memory rows as node representations "
        "(reference embedding_module.py:94, 245)"
    )
    d = cfg.node_dim
    nbr_in = d + cfg.time_dim + cfg.edge_dim
    h = cfg.hidden_dim
    ks = jax.random.split(rng, 12)
    cell_init, _ = CELLS[cfg.memory_updater]
    params: TgnParams = {
        "affinity_fc1": _linear_init(ks[4], 2 * h, h),
        "affinity_fc2": _linear_init(ks[5], h, 1),
        "cell": cell_init(ks[6], cfg.cell_input_dim, cfg.memory_dim),
    }
    if cfg.message_function == "mlp":
        # MLPMessageFunction: raw → raw/2 → memory_dim (reference
        # modules/message_function.py:13-22)
        raw = cfg.message_dim
        params["msg_fc1"] = _linear_init(ks[9], raw, raw // 2, xavier=False)
        params["msg_fc2"] = _linear_init(ks[10], raw // 2, cfg.memory_dim,
                                         xavier=False)
    if cfg.embedding_module == "diffusion":
        params.update(
            fc1=_linear_init(ks[0], nbr_in, d),
            fc2=_linear_init(ks[1], d, d),
            fc1_src=_linear_init(ks[2], d, d),
            fc2_src=_linear_init(ks[3], d, d),
        )
    elif cfg.embedding_module == "graph_attention":
        from zebra_tpu.models.attention import attention_layer_init

        layer_keys = jax.random.split(ks[7], cfg.n_layer)
        params["attn"] = [
            attention_layer_init(k, d, cfg.edge_dim, cfg.time_dim, cfg.n_head)
            for k in layer_keys
        ]
    elif cfg.embedding_module == "graph_sum":
        k1s = jax.random.split(ks[7], cfg.n_layer)
        k2s = jax.random.split(ks[8], cfg.n_layer)
        params["sum_fc1"] = [
            _linear_init(k, nbr_in, d, xavier=False) for k in k1s
        ]
        params["sum_fc2"] = [
            _linear_init(k, 2 * d + cfg.time_dim, d, xavier=False) for k in k2s
        ]
    elif cfg.embedding_module == "time":
        # JODIE NormalLinear(1, D): weights and bias ~ N(0, 1/sqrt(D))
        # (reference embedding_module.py:45-52)
        std = 1.0 / jnp.sqrt(d)
        params["time_proj"] = {
            "w": jax.random.normal(ks[7], (1, d), jnp.float32) * std,
            "b": jax.random.normal(ks[8], (d,), jnp.float32) * std,
        }
    elif cfg.embedding_module != "identity":
        raise ValueError(f"unknown embedding module {cfg.embedding_module!r}")
    return params


# ------------------------------------------------------------------ applies

def _mlp2(p1, p2, x, dropout_rng, dropout: float, train: bool, mxu=None):
    """fc2(drop(relu(fc1(x)))) — both diffusion transforms
    (reference embedding_module.py:320-328). ``mxu`` is the matmul input
    dtype (Config.mxu_dtype; None = f32)."""
    hidden = jax.nn.relu(matmul(x, p1["w"], mxu) + p1["b"])
    if train and dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, hidden.shape)
        hidden = jnp.where(keep, hidden / (1.0 - dropout), 0.0)
    return matmul(hidden, p2["w"], mxu) + p2["b"]


def cell_apply(cfg: Config, params: TgnParams, msgs, mem):
    _, apply = CELLS[cfg.memory_updater]
    return apply(params["cell"], msgs, mem, cfg.mxu_dtype)


def message_input(cfg: Config, params: TgnParams, mem_state, ids,
                  self_rows=None):
    """The updater-cell input for the pending messages of ``ids``, plus the
    pending flags, from ONE row gather (the flag lives in the last message
    column — models/memory.py): returns (cell_input [..., msg_dim],
    flag bool [...]). The input is the stored last message, or the mean over
    accumulated messages (aggregator='mean'); either passes through the MLP
    message function when configured (reference modules/message_function.py,
    message_aggregator.py — both are declared in the reference but have no
    runnable call sites).

    Under the compact layout (Config.compact_messages) the stored row omits
    the sender-memory part and it is re-attached here from ``self_rows`` —
    exact because a node's memory cannot change between a store and its
    commit. ``self_rows`` defaults to gathering ``memory[ids]``, but every
    hot caller already holds that gather (it is the updater cell's hidden
    state)."""
    g = lambda a: a[ids] if ids is not None else a
    rows = g(mem_state.messages)
    flag = rows[..., -1] != 0
    # keep the storage dtype on the fast path: a bf16 message/memory gather
    # feeds the updater-cell matmul directly at the MXU's bf16 rate
    # (models/cells.py:matmul) — upcasting the [.., msg_dim] gather to f32
    # costs more than it buys (the data was already bf16-quantized)
    raw = rows[..., :-1]
    if cfg.aggregator == "mean":
        cnt = g(mem_state.msg_count)
        raw = raw.astype(jnp.float32) / jnp.maximum(cnt, 1.0)[..., None]
    if cfg.compact_messages and self_rows is None:
        self_rows = g(mem_state.memory)
    return message_cell_input(cfg, params, raw, self_rows), flag


def message_cell_input(cfg: Config, params: TgnParams, raw, self_rows):
    """The tail of :func:`message_input` shared with the fused eval
    store+commit (train/step.py:eval_store_commit, which builds ``raw``
    directly instead of round-tripping it through the message table):
    re-attach the sender part under the compact layout, then the optional
    MLP message function."""
    if cfg.compact_messages:
        dt = jnp.promote_types(self_rows.dtype, raw.dtype)
        raw = jnp.concatenate(
            [self_rows.astype(dt), raw.astype(dt)], axis=-1
        )
    if cfg.message_function == "mlp":
        hidden = jax.nn.relu(_linear(params["msg_fc1"], raw.astype(jnp.float32)))
        raw = _linear(params["msg_fc2"], hidden)
    return raw


def diffusion_static_input(cfg: Config, edge_feats, eidx, dt) -> jnp.ndarray:
    """The parameter-independent part of the neighbor-tower input:
    ``[edge_feat; time_enc(Δt)]`` → [M, Q, k, De+Dt]. Computed inside the
    differentiated step: hoisting it out (saving it as a primal for the
    backward) was tried and measured SLOWER than letting remat recompute
    the gather + cosine chain under the matmuls (keeps the live set small)."""
    basis = time_basis(cfg.time_dim)
    # edge ids past the feature table (serving observe()s fresh events with
    # fresh ids) read the zero padding row instead of XLA's clamp-to-last
    # (row 0 is zero by the ml_{d}.npy format / the Trainer's fallback)
    safe = jnp.where(eidx < edge_feats.shape[0], eidx, 0)
    return jnp.concatenate([edge_feats[safe], time_encode(dt, basis)], axis=-1)


def diffusion_embed(
    cfg: Config,
    params: TgnParams,
    src_mem: jnp.ndarray,     # f32 [Q, d]      query nodes' (lazily updated) memory
    nbr_mem: jnp.ndarray,     # f32 [M, Q, k, d] selected neighbors' memory
    nbr_static: jnp.ndarray,  # f32 [M, Q, k, De+Dt] diffusion_static_input(...)
    w: jnp.ndarray,           # f32 [M, Q, k]   T-PPR weights (0 = empty slot)
    dropout_rng,
    train: bool,
) -> jnp.ndarray:
    """Ensemble diffusion embedding → [Q, d·(M+1)]
    (reference compute_embedding_tppr_ensemble, embedding_module.py:242-278)."""
    k_src, k_nbr = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )

    src_emb = _mlp2(params["fc1_src"], params["fc2_src"], src_mem, k_src,
                    cfg.dropout, train, cfg.mxu_dtype)

    nbr_in = jnp.concatenate([nbr_mem, nbr_static], axis=-1)
    nbr_emb = _mlp2(params["fc1"], params["fc2"], nbr_in, k_nbr,
                    cfg.dropout, train, cfg.mxu_dtype)       # [M, Q, k, d]

    # weight-normalize with the zero-sum guard (embedding_module.py:268-271)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)               # [M, Q, 1]
    w_n = jnp.where(w_sum > 0, w / jnp.where(w_sum > 0, w_sum, 1.0), 0.0)
    agg = jnp.sum(nbr_emb * w_n[..., None], axis=2)          # [M, Q, d]

    m = agg.shape[0]
    parts = [src_emb] + [agg[i] for i in range(m)]
    return jnp.concatenate(parts, axis=-1)                   # [Q, d·(M+1)]


def affinity_score(params: TgnParams, e1: jnp.ndarray, e2: jnp.ndarray,
                   mxu=None) -> jnp.ndarray:
    """MergeLayer link head → logits [B] (reference util.py:14-26; sigmoid is
    applied by the caller / folded into the loss)."""
    x = jnp.concatenate([e1, e2], axis=-1)
    hidden = jax.nn.relu(matmul(x, params["affinity_fc1"]["w"], mxu)
                         + params["affinity_fc1"]["b"])
    return (matmul(hidden, params["affinity_fc2"]["w"], mxu)
            + params["affinity_fc2"]["b"])[..., 0]
