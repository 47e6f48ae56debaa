"""Temporal multi-head attention layer (pure JAX).

Equivalent of the reference's ``TemporalAttentionLayer``
(reference model/temporal_attention.py:7-68), which wraps
``nn.MultiheadAttention(embed_dim=node+time, kdim=vdim=node+time+edge)``:

    query = [h_src ; time_enc(0)]
    key = value = [h_nbr ; edge_feat ; time_enc(Δt)]
    out = MergeLayer(attn_out, h_src)

with per-neighbor padding masks and the all-invalid guard (rows with no
valid neighbor attend to nothing and produce zero before the merge,
reference temporal_attention.py:57-64). Weights follow torch's layout
(packed in-projections with bias, out-projection) so numerics are
comparable with torch at identical parameters."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _xavier_uniform(rng, shape):
    fan_in, fan_out = shape[0], shape[1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def attention_layer_init(
    rng, node_dim: int, edge_dim: int, time_dim: int, n_head: int
) -> Dict:
    """Parameters for one temporal attention layer. query_dim = node+time,
    key_dim = node+edge+time; MergeLayer(query_dim+node → node → node)."""
    q_dim = node_dim + time_dim
    k_dim = node_dim + edge_dim + time_dim
    assert q_dim % n_head == 0, (q_dim, n_head)
    ks = jax.random.split(rng, 8)
    return {
        "w_q": _xavier_uniform(ks[0], (q_dim, q_dim)),
        "w_k": _xavier_uniform(ks[1], (k_dim, q_dim)),
        "w_v": _xavier_uniform(ks[2], (k_dim, q_dim)),
        "b_q": jnp.zeros((q_dim,)),
        "b_k": jnp.zeros((q_dim,)),
        "b_v": jnp.zeros((q_dim,)),
        "w_o": _xavier_uniform(ks[3], (q_dim, q_dim)),
        "b_o": jnp.zeros((q_dim,)),
        # MergeLayer(dim1=q_dim, dim2=node, dim3=node, dim4=node)
        "merge_fc1": {
            "w": jax.random.normal(ks[4], (q_dim + node_dim, node_dim))
            * jnp.sqrt(2.0 / (q_dim + 2 * node_dim)),
            "b": jnp.zeros((node_dim,)),
        },
        "merge_fc2": {
            "w": jax.random.normal(ks[5], (node_dim, node_dim))
            * jnp.sqrt(1.0 / node_dim),
            "b": jnp.zeros((node_dim,)),
        },
    }


def attention_layer_apply(
    p: Dict,
    src_feat: jnp.ndarray,   # f32 [B, D]
    src_te: jnp.ndarray,     # f32 [B, Dt]   time_enc(0)
    nbr_feat: jnp.ndarray,   # f32 [B, n, D]
    nbr_te: jnp.ndarray,     # f32 [B, n, Dt]
    edge_feat: jnp.ndarray,  # f32 [B, n, De]
    valid: jnp.ndarray,      # bool [B, n]
    n_head: int,
) -> jnp.ndarray:
    """→ [B, D] temporal-attention embedding."""
    b, n, _ = nbr_feat.shape
    query = jnp.concatenate([src_feat, src_te], axis=-1)          # [B, Q]
    keys = jnp.concatenate([nbr_feat, edge_feat, nbr_te], axis=-1)  # [B, n, K]

    q = query @ p["w_q"] + p["b_q"]                               # [B, Q]
    k = keys @ p["w_k"] + p["b_k"]                                # [B, n, Q]
    v = keys @ p["w_v"] + p["b_v"]

    hd = q.shape[-1] // n_head
    qh = q.reshape(b, n_head, hd)
    kh = k.reshape(b, n, n_head, hd)
    vh = v.reshape(b, n, n_head, hd)

    logits = jnp.einsum("bhd,bnhd->bhn", qh, kh) / jnp.sqrt(hd)   # [B, h, n]
    # all-invalid rows unmask slot 0 so softmax stays finite, then the
    # output is zeroed (reference temporal_attention.py:57-58, 64)
    any_valid = jnp.any(valid, axis=1)                            # [B]
    mask = valid.at[:, 0].set(valid[:, 0] | ~any_valid)
    logits = jnp.where(mask[:, None, :], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhn,bnhd->bhd", attn, vh).reshape(b, -1)    # [B, Q]
    out = out @ p["w_o"] + p["b_o"]
    out = jnp.where(any_valid[:, None], out, 0.0)

    # MergeLayer(attn_out, src_feat) (reference util.py:14-26)
    x = jnp.concatenate([out, src_feat], axis=-1)
    hidden = jax.nn.relu(x @ p["merge_fc1"]["w"] + p["merge_fc1"]["b"])
    return hidden @ p["merge_fc2"]["w"] + p["merge_fc2"]["b"]
