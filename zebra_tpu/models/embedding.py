"""Selectable embedding modules.

The reference declares five embedding modules (get_embedding_module,
reference modules/embedding_module.py:417-500) but only the diffusion path is
runnable — the recursive driver for the attention/sum towers was removed
upstream (the base ``compute_embedding`` is a stub, embedding_module.py:32-33,
and ``compute_temporal_embeddings`` only calls the diffusion ensemble,
tgn_model.py:149). Here every module works end to end:

- ``diffusion``       — T-PPR ensemble tower (models/tgn.py), the flagship.
- ``graph_attention`` — classic TGN recursive temporal attention over the
  ``n_degree`` most recent neighbors, ``n_layer`` hops (upstream-TGN
  semantics for the recursion; per-layer TemporalAttentionLayer as in
  reference model/temporal_attention.py).
- ``graph_sum``       — recursive sum aggregator (reference
  GraphSumEmbedding.aggregate, embedding_module.py:401-409). Padding
  neighbors are masked out of the sum (the reference's dead code would have
  summed zero-memory padding rows together with their nonzero time
  encodings; masking is the intended semantics).
- ``identity``        — raw memory rows (embedding_module.py:412-414).
- ``time``            — JODIE-style memory·(1 + w·Δt) projection
  (embedding_module.py:36-57) with Δt against the node's last update.

Train-time memory laziness: gathered rows with pending messages pass through
the updater cell on the fly (reference get_updated_memory,
memory_updater.py:61-90). The diffusion path gates query-node laziness on
selected-set membership exactly like the reference; the recursive paths apply
it to every gathered node (upstream TGN flushes all pending nodes before
embedding, which per-position lazy evaluation reproduces)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zebra_tpu.config import Config
from zebra_tpu.index.neighbor_finder import NeighborIndex, most_recent_neighbors
from zebra_tpu.models.attention import attention_layer_apply
from zebra_tpu.models.cells import CELLS
from zebra_tpu.models.time_encoding import time_basis, time_encode


def _lazy_rows(cfg: Config, params, mem, ids, train: bool, enable=None):
    """Memory rows for ``ids`` with the lazy differentiable cell update where
    a message is pending. ``enable`` optionally gates which positions may
    update (diffusion's selected-set rule); None = all (when train)."""
    from zebra_tpu.models.tgn import message_input

    rows = mem.memory[ids]
    if not train:
        return rows
    _, cell = CELLS[cfg.memory_updater]
    msg, flag = message_input(cfg, params, mem, ids, rows)
    upd = cell(params["cell"], msg, rows, cfg.mxu_dtype)
    gate = flag if enable is None else (flag & enable)
    return jnp.where(gate[..., None], upd, rows)


def _offset(ids, mem_off):
    """Memory-row ids for node ids: the seed-parallel flat tables carry seed
    s's rows at [s·N, (s+1)·N) (train/step.py flat-table note), so memory
    gathers add the lane's offset while ADJACENCY lookups keep the raw node
    ids — the index is shared across seeds. None = single-run tables."""
    return ids if mem_off is None else ids + mem_off


def recursive_embed(
    cfg: Config,
    params,
    mem,
    edge_feats: jnp.ndarray,
    nbr_index: NeighborIndex,
    nodes: jnp.ndarray,   # i32 [Q]
    times: jnp.ndarray,   # f32 [Q]
    train: bool,
    mem_off=None,         # i32 [] seed-lane row offset into flat tables
) -> jnp.ndarray:
    """graph_attention / graph_sum recursion over most-recent neighbors."""
    basis = time_basis(cfg.time_dim)
    n = cfg.n_degree
    variant = cfg.embedding_module

    def level(nodes, times, layer):
        feats = _lazy_rows(cfg, params, mem, _offset(nodes, mem_off), train)
        if layer == 0:
            return feats
        q = nodes.shape[0]
        nbr, eidx, nts, valid, _ = most_recent_neighbors(nbr_index, nodes, times, n)
        nbr_emb = level(nbr.reshape(-1), nts.reshape(-1), layer - 1).reshape(
            q, n, -1
        )
        te_src = time_encode(jnp.zeros_like(times), basis)          # [Q, Dt]
        te_nbr = time_encode(times[:, None] - nts, basis)           # [Q, n, Dt]
        ef = edge_feats[eidx]                                       # [Q, n, De]

        if variant == "graph_attention":
            return attention_layer_apply(
                params["attn"][layer - 1], feats, te_src, nbr_emb, te_nbr,
                ef, valid, cfg.n_head,
            )
        # graph_sum (reference embedding_module.py:401-409)
        p1 = params["sum_fc1"][layer - 1]
        p2 = params["sum_fc2"][layer - 1]
        nbr_in = jnp.concatenate([nbr_emb, te_nbr, ef], axis=-1)
        h = nbr_in @ p1["w"] + p1["b"]
        h = jnp.where(valid[..., None], h, 0.0)
        nbr_sum = jax.nn.relu(jnp.sum(h, axis=1))                   # [Q, D]
        src_in = jnp.concatenate([nbr_sum, feats, te_src], axis=-1)
        return src_in @ p2["w"] + p2["b"]

    return level(nodes, times, cfg.n_layer)


def time_embed(cfg: Config, params, mem, nodes, times, train: bool,
               mem_off=None):
    """JODIE time-projection embedding (reference embedding_module.py:36-57)."""
    ids = _offset(nodes, mem_off)
    rows = _lazy_rows(cfg, params, mem, ids, train)
    dt = times - mem.last_update[ids]
    p = params["time_proj"]
    return rows * (1.0 + dt[:, None] * p["w"][0][None, :] + p["b"][None, :])


def identity_embed(cfg: Config, params, mem, nodes, train: bool,
                   mem_off=None):
    return _lazy_rows(cfg, params, mem, _offset(nodes, mem_off), train)
