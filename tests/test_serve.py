"""Serving wrapper: scores agree with training-side evaluation and observe()
keeps state current."""

import numpy as np

from tests.test_train_loop import _make_trainer
from zebra_tpu.serve import LinkPredictor


def test_score_and_observe():
    trainer = _make_trainer("streaming")
    trainer.fit(n_epoch=3)

    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    b = 32
    src, dst, t = test.sources[:b], test.destinations[:b], test.timestamps[:b]

    probs = predictor.score(src, dst, t)
    assert probs.shape == (b,)
    assert np.all((probs >= 0) & (probs <= 1))

    # real continuations should outscore random pairs on average
    rng = np.random.RandomState(0)
    rand_dst = rng.choice(np.unique(trainer.splits.full.destinations), b)
    rand_probs = predictor.score(src, rand_dst, t)
    assert probs.mean() > rand_probs.mean(), (probs.mean(), rand_probs.mean())

    # ingesting events mutates memory/index without breaking scoring
    predictor.observe(src, dst, t, test.edge_idxs[:b])
    probs2 = predictor.score(
        test.sources[b : 2 * b],
        test.destinations[b : 2 * b],
        test.timestamps[b : 2 * b],
    )
    assert np.all(np.isfinite(probs2))


def test_score_read_only():
    trainer = _make_trainer("streaming")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    before = np.asarray(predictor.index_state.data).copy()
    mem_before = np.asarray(predictor.mem.memory).copy()

    test = trainer.splits.test
    predictor.score(test.sources[:16], test.destinations[:16],
                    test.timestamps[:16])

    np.testing.assert_array_equal(np.asarray(predictor.index_state.data), before)
    np.testing.assert_array_equal(np.asarray(predictor.mem.memory), mem_before)


def test_read_topk_matches_scan_extraction():
    """The serving fast path (gather-only read_topk) must emit exactly what
    the sequential scan's pre-edge extraction would for the same queries."""
    import jax
    import jax.numpy as jnp

    from zebra_tpu.index.streaming import read_topk, streaming_scan

    trainer = _make_trainer("streaming")
    trainer.train_epoch()
    state = trainer.index_state
    cfg = trainer.cfg
    test = trainer.splits.test
    b = 24
    src = np.asarray(test.sources[:b], np.int32)
    dst = np.asarray(test.destinations[:b], np.int32)
    t = np.asarray(test.timestamps[:b], np.float32)

    q_fast = read_topk(
        state, jnp.stack([jnp.asarray(src), jnp.asarray(dst),
                          jnp.asarray(dst)], axis=1),
        jnp.asarray(t), cfg.n_tppr, cfg.topk,
    )
    # oracle: zero-validity scan emits pre-edge rows without mutating state
    _, q_scan = streaming_scan(
        jax.tree.map(jnp.copy, state),
        trainer._tppr_params, src, dst, dst, t,
        np.zeros(b, np.int32), np.zeros(b, bool),
    )
    for a, b_ in zip(q_fast, q_scan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_observe_with_embedding_messages():
    trainer = _make_trainer(
        "streaming",
        use_source_embedding_in_message=True,
        use_destination_embedding_in_message=True,
    )
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    b = 16
    predictor.observe(test.sources[:b], test.destinations[:b],
                      test.timestamps[:b], test.edge_idxs[:b])
    probs = predictor.score(test.sources[b : 2 * b],
                            test.destinations[b : 2 * b],
                            test.timestamps[b : 2 * b])
    assert np.all(np.isfinite(probs))


def test_score_with_pruning_strategy():
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)
    test = trainer.splits.test
    probs = predictor.score(test.sources[:16], test.destinations[:16],
                            test.timestamps[:16])
    assert probs.shape == (16,)
    assert np.all(np.isfinite(probs))


def test_pruning_observe_folds_into_adjacency():
    """observe() must extend the adjacency index for stateless strategies
    (pruning): a brand-new interaction becomes visible to later pruned
    queries instead of silently going stale."""
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer)  # rebuild_every=1

    full = trainer.splits.full
    t_new = float(full.timestamps[-1]) + 100.0
    eidx_new = int(full.edge_idxs.max()) + 1
    # a (src, dst) pair given a fresh interaction at t_new
    src, dst = int(full.sources[0]), int(full.destinations[1])

    before = predictor.score([src], [dst], [t_new + 1.0])
    predictor.observe([src], [dst], [t_new], [eidx_new])
    assert predictor._pending_n == 0  # folded immediately at rebuild_every=1

    # the new edge is in the adjacency: a pruned query from src after t_new
    # must now include dst among its top-k neighborhood
    q = predictor._queries([src], [dst], [t_new + 1.0], with_neg=False)
    nbrs = np.asarray(q.nbr)[:, 0, :]  # [M, k] for the src row
    assert (nbrs == dst).any(), (nbrs, dst)
    after = predictor.score([src], [dst], [t_new + 1.0])
    assert np.isfinite(after).all() and np.isfinite(before).all()


def test_pruning_observe_batched_rebuild():
    """rebuild_every > 1 defers the fold; flush_index() forces it."""
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    predictor = LinkPredictor.from_trainer(trainer, rebuild_every=1000)
    full = trainer.splits.full
    t_new = float(full.timestamps[-1]) + 100.0
    predictor.observe([1], [2], [t_new], [int(full.edge_idxs.max()) + 1])
    assert predictor._pending_n == 1
    predictor.flush_index()
    assert predictor._pending_n == 0
    q = predictor._queries([1], [2], [t_new + 1.0], with_neg=False)
    assert (np.asarray(q.nbr)[:, 0, :] == 2).any()


def test_predictor_without_events_warns(caplog):
    import logging

    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    p = LinkPredictor(trainer.cfg, trainer.params, trainer.mem,
                      trainer.index_state, trainer.edge_feats,
                      trainer.full_nbr_index)  # no events=
    full = trainer.splits.full
    with caplog.at_level(logging.WARNING, logger="zebra_tpu"):
        p.observe([1], [2], [float(full.timestamps[-1]) + 1.0],
                  [int(full.edge_idxs.max()) + 1])
    assert any("NOT the adjacency" in r.message for r in caplog.records)


def test_sharded_mesh_predictor_matches_single_device():
    """A LinkPredictor over a row-sharded (8-device mesh) trainer state must
    score and observe identically to the single-device one."""
    a = _make_trainer("streaming")
    b = _make_trainer("streaming", n_devices=8)
    ra = a.train_epoch()
    rb = b.train_epoch()
    assert np.isclose(ra.loss, rb.loss, rtol=1e-4), (ra.loss, rb.loss)

    pa = LinkPredictor.from_trainer(a)
    pb = LinkPredictor.from_trainer(b)
    test = a.splits.test
    s, d, t = (test.sources[:16], test.destinations[:16],
               test.timestamps[:16])
    np.testing.assert_allclose(
        pa.score(s, d, t), pb.score(s, d, t), rtol=2e-4, atol=2e-5
    )
    e = test.edge_idxs[:16]
    pa.observe(s, d, t, e)
    pb.observe(s, d, t, e)
    np.testing.assert_allclose(
        np.asarray(pa.mem.memory), np.asarray(pb.mem.memory),
        rtol=2e-4, atol=2e-5,
    )
    s2, d2, t2 = (test.sources[16:32], test.destinations[16:32],
                  test.timestamps[16:32])
    np.testing.assert_allclose(
        pa.score(s2, d2, t2), pb.score(s2, d2, t2), rtol=2e-4, atol=2e-5
    )


def test_from_checkpoint_matches_from_trainer(tmp_path):
    """The deployment path: a predictor rebuilt from a save_state file alone
    scores identically to one taken from the live Trainer."""
    trainer = _make_trainer("streaming")
    trainer.fit(n_epoch=2)
    path = str(tmp_path / "serve.ckpt")
    trainer.save_state(path)

    p_live = LinkPredictor.from_trainer(trainer)
    p_file = LinkPredictor.from_checkpoint(
        path, edge_feats=np.asarray(trainer.edge_feats)
    )
    test = trainer.splits.test
    s, d, t = test.sources[:16], test.destinations[:16], test.timestamps[:16]
    np.testing.assert_allclose(
        p_live.score(s, d, t), p_file.score(s, d, t), rtol=1e-6, atol=1e-7
    )

    # pruning strategy needs the event stream for its adjacency index
    tr2 = _make_trainer("pruning")
    tr2.train_epoch()
    path2 = str(tmp_path / "serve2.ckpt")
    tr2.save_state(path2)
    fu = tr2.splits.full
    p2_live = LinkPredictor.from_trainer(tr2)
    p2_file = LinkPredictor.from_checkpoint(
        path2, edge_feats=np.asarray(tr2.edge_feats),
        events=(fu.sources, fu.destinations, fu.timestamps, fu.edge_idxs),
    )
    np.testing.assert_allclose(
        p2_live.score(s, d, t), p2_file.score(s, d, t), rtol=1e-6, atol=1e-7
    )
    import pytest

    with pytest.raises(ValueError, match="adjacency"):
        LinkPredictor.from_checkpoint(
            path2, edge_feats=np.asarray(tr2.edge_feats)
        )


def test_from_checkpoint_requires_real_edge_feats(tmp_path):
    """A checkpoint trained WITH real edge features must refuse to serve
    with silently-zeroed ones."""
    import pytest

    trainer = _make_trainer("streaming")  # edge_dim=4 real features
    trainer.train_epoch()
    path = str(tmp_path / "ef.ckpt")
    trainer.save_state(path)
    with pytest.raises(ValueError, match="edge features"):
        LinkPredictor.from_checkpoint(path)


def test_observe_fresh_edge_ids_use_zero_features():
    """Edge ids beyond the training feature table (fresh serving events)
    must read the zero row, not clamp to the last trained edge's features."""
    import jax.numpy as jnp

    from zebra_tpu.models.tgn import diffusion_static_input

    trainer = _make_trainer("streaming")
    cfg = trainer.cfg
    ef = np.zeros((cfg.n_edges, cfg.edge_dim), np.float32)
    ef[1:] = 1.0  # every real edge row nonzero; row 0 is the zero row
    eidx = jnp.asarray([[[1, cfg.n_edges - 1, cfg.n_edges, cfg.n_edges + 7]]])
    dt = jnp.zeros(eidx.shape, jnp.float32)
    out = np.asarray(
        diffusion_static_input(cfg, jnp.asarray(ef), eidx, dt)
    )[0, 0, :, : cfg.edge_dim]
    assert out[0].max() == 1.0 and out[1].max() == 1.0   # in-table rows
    assert out[2].max() == 0.0 and out[3].max() == 0.0   # fresh ids -> zero


def test_flush_index_keeps_static_arena_shape():
    """Successive adjacency folds must keep one bucketed arena shape so the
    jitted consumers don't recompile per observe->score cycle."""
    trainer = _make_trainer("pruning")
    trainer.train_epoch()
    p = LinkPredictor.from_trainer(trainer)
    # the INITIAL arena is pre-padded to the fold bucket, so the very first
    # flush keeps the shape too (no one-off recompile of jitted consumers)
    shape0 = p.nbr_index.nbr.shape
    assert shape0[0] % 65536 == 0
    full = trainer.splits.full
    t0, e0 = float(full.timestamps[-1]), int(full.edge_idxs.max())
    p.observe([1], [2], [t0 + 1.0], [e0 + 1])
    shape1 = p.nbr_index.nbr.shape
    assert shape1 == shape0
    p.observe([3], [4], [t0 + 2.0], [e0 + 2])
    assert p.nbr_index.nbr.shape == shape1
    # padded and unpadded indices answer queries identically
    from zebra_tpu.index.neighbor_finder import build_neighbor_index
    from zebra_tpu.index.pruning import pruned_topk
    import jax.numpy as jnp

    ev = p._events
    exact = build_neighbor_index(ev[0], ev[1], ev[2], ev[3],
                                 trainer.cfg.n_nodes)
    nodes = jnp.asarray(full.sources[:8].astype(np.int32))
    ts = jnp.asarray(np.full(8, t0 + 3.0, np.float32))
    al = jnp.asarray(trainer.cfg.alpha_list, jnp.float32)
    be = jnp.asarray(trainer.cfg.beta_list, jnp.float32)
    qa = pruned_topk(p.nbr_index, al, be, nodes, ts, 5, 2, 5)
    qb = pruned_topk(exact, al, be, nodes, ts, 5, 2, 5)
    for a, b in zip(qa, qb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_from_checkpoint_refuses_real_1dim_edge_feats(tmp_path):
    """edge_dim alone cannot tell a genuine 1-dim feature matrix from the
    zero placeholder; the Config's real_edge_feats provenance flag must carry
    the distinction into checkpoints (ADVICE r3)."""
    import pytest

    trainer = _make_trainer("streaming", edge_dim=1)
    assert trainer.cfg.real_edge_feats is True
    trainer.train_epoch()
    path = str(tmp_path / "ef1.ckpt")
    trainer.save_state(path)
    with pytest.raises(ValueError, match="edge features"):
        LinkPredictor.from_checkpoint(path)


def test_from_checkpoint_zero_feats_serves_without_matrix(tmp_path):
    """ignore_edge_feats training (SNAP-style) must serve from the checkpoint
    alone — no edge_feats argument, no warning-worthy ambiguity."""
    trainer = _make_trainer("streaming", ignore_edge_feats=True)
    assert trainer.cfg.real_edge_feats is False
    trainer.train_epoch()
    path = str(tmp_path / "ef0.ckpt")
    trainer.save_state(path)
    p = LinkPredictor.from_checkpoint(path)
    test = trainer.splits.test
    probs = p.score(test.sources[:8], test.destinations[:8],
                    test.timestamps[:8])
    assert np.all(np.isfinite(probs))


def test_ensemble_predictor_scores_are_member_mean(tmp_path):
    """EnsemblePredictor over a seed-parallel checkpoint: score() equals the
    mean of the per-seed predictors' scores, member_scores matches them, and
    observe() keeps the equivalence (shared index scan, per-member memory)."""
    from zebra_tpu.serve import EnsemblePredictor

    trainer = _make_trainer("streaming", parallel_runs=2)
    trainer.train_epoch()
    path = str(tmp_path / "seedpar.ckpt")
    trainer.save_state(path)
    ef = np.asarray(trainer.edge_feats)

    ens = LinkPredictor.from_checkpoint(path, edge_feats=ef, ensemble=True)
    assert isinstance(ens, EnsemblePredictor) and ens.n_models == 2
    members = [
        LinkPredictor.from_checkpoint(path, edge_feats=ef, run_index=s)
        for s in range(2)
    ]

    test = trainer.splits.test
    s, d, t = test.sources[:16], test.destinations[:16], test.timestamps[:16]
    per = np.stack([m.score(s, d, t) for m in members])
    np.testing.assert_allclose(ens.score(s, d, t), per.mean(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ens.member_scores(s, d, t), per,
                               rtol=1e-5, atol=1e-6)

    # stream a few observed interactions through everyone, re-score
    val = trainer.splits.val
    so, do_, to, eo = (val.sources[:20], val.destinations[:20],
                       val.timestamps[:20], val.edge_idxs[:20])
    ens.observe(so, do_, to, eo)
    for m in members:
        m.observe(so, do_, to, eo)
    per2 = np.stack([m.score(s, d, t) for m in members])
    np.testing.assert_allclose(ens.score(s, d, t), per2.mean(0),
                               rtol=1e-5, atol=1e-6)


def test_ensemble_predictor_guards(tmp_path):
    import pytest

    from zebra_tpu.serve import EnsemblePredictor

    single = _make_trainer("streaming")
    single.train_epoch()
    p1 = str(tmp_path / "one.ckpt")
    single.save_state(p1)
    ef = np.asarray(single.edge_feats)
    with pytest.raises(ValueError, match="seed-parallel"):
        LinkPredictor.from_checkpoint(p1, edge_feats=ef, ensemble=True)
    with pytest.raises(ValueError, match="seed-parallel"):
        EnsemblePredictor.from_trainer(single)

    par = _make_trainer("streaming", parallel_runs=2)
    par.train_epoch()
    p2 = str(tmp_path / "two.ckpt")
    par.save_state(p2)
    efp = np.asarray(par.edge_feats)
    with pytest.raises(ValueError, match="not both"):
        LinkPredictor.from_checkpoint(p2, edge_feats=efp, run_index=1,
                                      ensemble=True)
    with pytest.raises(ValueError, match="EnsemblePredictor"):
        LinkPredictor.from_trainer(par)
    ens = EnsemblePredictor.from_trainer(par)
    assert ens.n_models == 2


def test_from_checkpoint_rejects_run_index_on_single_seed(tmp_path):
    import pytest

    trainer = _make_trainer("streaming")
    trainer.train_epoch()
    path = str(tmp_path / "one.ckpt")
    trainer.save_state(path)
    with pytest.raises(ValueError, match="single-seed"):
        LinkPredictor.from_checkpoint(
            path, edge_feats=np.asarray(trainer.edge_feats), run_index=2
        )
