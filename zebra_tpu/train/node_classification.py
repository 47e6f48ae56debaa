"""Downstream node classification on temporal embeddings.

The reference ships an MLP decoder head (reference utils/util.py:28-42) and
an ``eval_node_classification`` that cannot run (it passes nonexistent
``reuse``/``cache_plan`` kwargs, evaluation/evaluation.py:74). This module
provides the working equivalent:

1. ``collect_source_embeddings`` — one fused eval-mode pass over a stream
   (same memory/index protocol as evaluation; destinations stand in for the
   negative role like the reference's call, evaluation.py:71) that emits the
   per-event source embedding.
2. ``MLP decoder`` — dim → 80 → 10 → 1 with dropout, the reference head.
3. ``train_node_classifier`` / ``eval_node_classification`` — fit the
   decoder with Adam + BCE on one stream's embeddings, report ROC-AUC.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from zebra_tpu.config import Config
from zebra_tpu.index.streaming import TpprParams
from zebra_tpu.train.phase import Stream, _index_queries
from zebra_tpu.train.step import _forward


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_batches"),
    donate_argnames=("mem", "index_state"),
)
def collect_source_embeddings(
    cfg: Config,
    n_batches: int,
    params,
    mem,
    index_state,
    edge_feats,
    nbr_index,
    stream: Stream,
):
    """Eval-mode pass emitting source embeddings [n_batches, b, H]; memory
    and index evolve exactly as in the evaluation protocol."""
    from zebra_tpu.train.step import _commit_pending, _store_messages

    b = stream.src.shape[0] // n_batches
    tppr_params = TpprParams.create(cfg.alpha_list, cfg.beta_list, cfg.topk)
    xs = jax.tree.map(lambda x: x.reshape(n_batches, b), stream)

    def body(carry, s: Stream):
        mem, index_state = carry
        b = s.src.shape[0]
        # the reference's node-classification call passes destinations in the
        # negative slot (evaluation.py:69-74); its extraction and embedding
        # are duplicates of the dst slot, so only the 2b (src‖dst) rows are
        # embedded — the index still advances edge-exactly
        if cfg.embedding_module == "diffusion":
            index_state, q = _index_queries(
                cfg, tppr_params, index_state, nbr_index,
                s.src, s.dst, s.dst, s.t, s.eidx, s.valid,
            )
            q = jax.tree.map(lambda x: x[:, : 2 * b], q)
        else:
            q = None
        nodes2 = jnp.concatenate([s.src, s.dst])
        times2 = jnp.concatenate([s.t, s.t])
        emb = _forward(cfg, params, mem, edge_feats, nodes2, times2, q,
                       nbr_index, None, train=False)
        need_emb = (cfg.use_source_embedding_in_message
                    or cfg.use_destination_embedding_in_message)
        src_emb, dst_emb = (
            (emb[:b], emb[b : 2 * b]) if need_emb else (None, None)
        )
        mem = _store_messages(cfg, params, mem, edge_feats, s.src, s.dst,
                              s.t, s.eidx, s.valid, src_emb, dst_emb)
        positives = jnp.concatenate([s.src, s.dst])
        valid2 = jnp.concatenate([s.valid, s.valid])
        mem = _commit_pending(cfg, params, mem, positives, valid2)
        return (mem, index_state), emb[:b]

    (mem, index_state), embs = jax.lax.scan(body, (mem, index_state), xs)
    return mem, index_state, embs


# ------------------------------------------------------------------ decoder

def init_decoder(rng, dim: int):
    """The reference MLP head: dim → 80 → 10 → 1 (utils/util.py:28-35)."""
    ks = jax.random.split(rng, 6)

    def lin(k, i, o):
        kw, kb = jax.random.split(k)
        bound = 1.0 / jnp.sqrt(i)
        return {
            "w": jax.random.uniform(kw, (i, o), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (o,), jnp.float32, -bound, bound),
        }

    return {"fc1": lin(ks[0], dim, 80), "fc2": lin(ks[1], 80, 10),
            "fc3": lin(ks[2], 10, 1)}


def decoder_apply(p, x, rng=None, dropout: float = 0.3, train: bool = False):
    def drop(h, k):
        if not train or dropout <= 0:
            return h
        keep = jax.random.bernoulli(k, 1.0 - dropout, h.shape)
        return jnp.where(keep, h / (1.0 - dropout), 0.0)

    k1, k2 = (jax.random.split(rng) if rng is not None else (None, None))
    h = drop(jax.nn.relu(x @ p["fc1"]["w"] + p["fc1"]["b"]), k1)
    h = drop(jax.nn.relu(h @ p["fc2"]["w"] + p["fc2"]["b"]), k2)
    return (h @ p["fc3"]["w"] + p["fc3"]["b"])[..., 0]


def train_node_classifier(
    embs: jnp.ndarray,   # [n, H]
    labels: jnp.ndarray, # [n] {0,1}
    rng,
    n_steps: int = 200,
    lr: float = 1e-3,
    batch: int = 1024,
):
    params = init_decoder(rng, embs.shape[-1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        rng, k_idx, k_drop = jax.random.split(rng, 3)
        idx = jax.random.randint(k_idx, (min(batch, embs.shape[0]),), 0,
                                 embs.shape[0])
        x, y = embs[idx], labels[idx]

        def loss_fn(p):
            logits = decoder_apply(p, x, k_drop, train=True)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rng, loss

    for _ in range(n_steps):
        params, opt_state, rng, loss = step(params, opt_state, rng)
    return params


def eval_node_classification(decoder_params, embs, labels) -> float:
    """ROC-AUC of decoder probabilities against event labels (reference
    evaluation.py:78 intent)."""
    logits = decoder_apply(decoder_params, embs, train=False)
    probs = jax.nn.sigmoid(logits)
    # pairwise AUC between positive- and negative-labeled events
    pos = probs[labels > 0.5]
    neg = probs[labels <= 0.5]
    if pos.size == 0 or neg.size == 0:
        return float("nan")
    gt = (pos[:, None] > neg[None, :]).mean()
    eq = (pos[:, None] == neg[None, :]).mean()
    return float(gt + 0.5 * eq)


def run_node_classification(trainer, n_steps: int = 500, lr: float = 1e-3,
                            seed: int = 0) -> dict:
    """The full downstream protocol over a link-trained ``Trainer`` (the CLI's
    ``--task node``): one fresh chronological replay of train→val→test with
    the trained model under eval semantics, emitting per-event source
    embeddings; the reference MLP head is fit on the train-stream embeddings
    vs event labels and scored by ROC-AUC on all three streams.

    This is the working equivalent of the reference's unrunnable
    ``eval_node_classification`` (evaluation/evaluation.py:51-78 — it passes
    nonexistent ``reuse``/``cache_plan`` kwargs); the decoder-on-source-
    embedding protocol follows the reference head (utils/util.py:28-42) and
    the upstream-TGN supervised recipe the reference inherited it from."""
    import numpy as np

    cfg = trainer.cfg
    if getattr(trainer, "_n_seeds", 1) > 1:
        raise ValueError(
            "node classification runs on a single-seed Trainer — slice one "
            "seed first (serve.LinkPredictor.from_checkpoint(run_index=...) "
            "semantics)"
        )
    from zebra_tpu.train.loop import _fresh_epoch_state

    mem, index_state = _fresh_epoch_state(cfg)
    mem = jax.tree.map(jnp.asarray, mem)

    split_of = {"train": trainer.splits.train, "val": trainer.splits.val,
                "test": trainer.splits.test}
    nbr_of = {"train": trainer.train_nbr_index,
              "val": trainer.full_nbr_index,
              "test": trainer.full_nbr_index}
    embs, labels = {}, {}
    for name in ("train", "val", "test"):
        ps = trainer._streams[name]
        stream = ps.stream
        use_nbr = (
            () if (cfg.embedding_module == "diffusion"
                   and cfg.tppr_strategy == "streaming")
            else nbr_of[name]
        )
        mem, index_state, e = collect_source_embeddings(
            cfg, ps.n_batches, trainer.params, mem, index_state,
            trainer.edge_feats, use_nbr, stream,
        )
        valid = np.asarray(trainer._host_streams[name]["valid"])
        embs[name] = np.asarray(e).reshape(-1, cfg.hidden_dim)[valid]
        labels[name] = np.asarray(split_of[name].labels, np.float32)

    decoder = train_node_classifier(
        jnp.asarray(embs["train"]), jnp.asarray(labels["train"]),
        jax.random.PRNGKey(seed), n_steps=n_steps, lr=lr,
    )
    return {
        f"node_{name}_auc": eval_node_classification(
            decoder, jnp.asarray(embs[name]), jnp.asarray(labels[name])
        )
        for name in ("train", "val", "test")
    }
