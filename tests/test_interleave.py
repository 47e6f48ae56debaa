"""Node-id interleaving for owner-aligned sharding
(--interleave_node_ids / Config.interleave_shards).

JODIE-style bipartite numbering puts every src in one contiguous id block,
so at n_shards=2 the owner-aligned scheduler lands EVERY edge in shard 0's
lane block — 2.00× wave inflation (docs/SCALING.md). The round-robin
relabeling (parallel/sharding.py:interleave_permutation) spreads the src set
uniformly; the model is permutation-equivariant in node ids, so results are
unchanged up to top-k tie-break order."""

import numpy as np
import pytest

import jax

from tests.test_train_loop import _make_trainer
from zebra_tpu.parallel import interleave_permutation


def test_permutation_properties():
    for n, s in [(128, 2), (256, 4), (1024, 8), (640, 5)]:
        p = interleave_permutation(n, s)
        assert p[0] == 0, "padding id must stay fixed"
        assert sorted(p.tolist()) == list(range(n)), "must be a bijection"
        rows = n // s
        # old id i lands in shard i % s under contiguous-row ownership
        np.testing.assert_array_equal(p // rows, np.arange(n) % s)
    with pytest.raises(ValueError, match="multiple"):
        interleave_permutation(130, 4)


def test_interleave_removes_bipartite_wave_inflation():
    """The measurable claim: on a bipartite (JODIE-numbered) stream the
    aligned schedule at n_shards=2 inflates ~2× without interleaving and
    goes back near the unaligned wave count with it."""
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.native.ingest import wave_schedule

    data, _ = synthetic_stream(
        n_events=20_000, n_users=2_000, n_items=2_000, edge_dim=0, seed=0
    )
    src = data.sources.astype(np.int32)
    dst = data.destinations.astype(np.int32)
    n_raw = int(max(src.max(), dst.max())) + 1
    n_nodes = -(-n_raw // 128) * 128  # Trainer's padding rule
    rs = np.random.RandomState(0)
    neg = rs.randint(1, n_raw, len(src)).astype(np.int32)

    _, _, w_base = wave_schedule(src, dst, neg, n_nodes, 64, 1)
    _, _, w_aligned = wave_schedule(src, dst, neg, n_nodes, 64, 2)
    # bipartite pathology: every src is a "user" id < n_users + 1 → all in
    # shard 0's 32-lane block → big inflation (2.00× on the bench stream,
    # docs/SCALING.md; ≥1.5× at this smaller scale where dependency chains
    # also bound the wave count)
    assert w_aligned >= 1.5 * w_base, (w_base, w_aligned)

    perm = interleave_permutation(n_nodes, 2)
    _, _, w_perm = wave_schedule(
        perm[src], perm[dst], perm[neg], n_nodes, 64, 2
    )
    assert w_perm <= 1.25 * w_base, (w_base, w_aligned, w_perm)


@pytest.mark.parametrize("tower_kw", [
    {},                                        # flagship diffusion
    {"embedding_module": "graph_attention"},   # adjacency-querying tower:
                                               # the neighbor index must be
                                               # built in the PERMUTED id
                                               # space (regression: it was
                                               # built from the raw-id
                                               # sampler splits)
])
def test_trainer_interleaved_matches_plain(tmp_path, tower_kw):
    """An owner-aligned 2-device trainer with interleaving reproduces the
    plain trainer's metrics: relabeling is equivalence up to top-k tie-break
    order (ties break by neighbor id), so APs agree to small tolerance."""
    kw = dict(n_epoch=1, n_events=1200, prng_impl="threefry2x32",
              memory_dtype="float32", n_devices=2, owner_aligned_waves=True,
              **tower_kw)
    plain = _make_trainer("streaming", checkpoint_dir=str(tmp_path / "a"),
                          interleave_node_ids=False, **kw)
    inter = _make_trainer("streaming", checkpoint_dir=str(tmp_path / "b"),
                          **kw)
    # auto policy resolved interleaving ON (owner-aligned + 2 shards);
    # both trainers run the same sharded mesh path so the ONLY difference
    # is the relabeling
    assert plain.cfg.interleave_shards == 0
    assert inter.cfg.interleave_shards == 2
    assert inter._id_perm is not None

    r_p = plain.train_epoch()
    r_i = inter.train_epoch()
    np.testing.assert_allclose(r_i.ap, r_p.ap, rtol=0, atol=5e-3)
    tp, ip_ = plain.validate()
    ti, ii = inter.validate()
    np.testing.assert_allclose(ti.ap, tp.ap, rtol=0, atol=5e-3)
    np.testing.assert_allclose(ii.ap, ip_.ap, rtol=0, atol=5e-3)


def test_seed_sharded_keeps_dense_schedule(tmp_path):
    """Seed-SHARDED runs replicate the index (each device scans all rows),
    so owner alignment has no locality to buy: the wave scheduler must stay
    dense (n_shards=1) and auto-interleave must stay off even when
    --owner_aligned_waves is set."""
    from tests.test_seed_parallel import _seed_trainer

    kw = dict(n_epoch=1, parallel_runs=2, owner_aligned_waves=True)
    sharded = _seed_trainer(tmp_path / "m", n_devices=2, **kw)
    single = _seed_trainer(tmp_path / "s", **kw)
    assert sharded.cfg.interleave_shards == 0
    assert sharded._id_perm is None
    sharded.train_epoch()
    single.train_epoch()
    # identical (dense) schedules → identical wave high-water marks
    assert sharded._wave_hwm == single._wave_hwm


def test_serving_maps_external_ids(tmp_path):
    """Serving an interleave-trained snapshot with EXTERNAL ids: scores
    equal the plain-trained predictor's for the same external queries, and
    a from_checkpoint round trip reconstructs the permutation from
    cfg.interleave_shards alone."""
    from zebra_tpu.serve import LinkPredictor

    kw = dict(n_epoch=1, n_events=1200, prng_impl="threefry2x32",
              memory_dtype="float32")
    plain = _make_trainer("streaming", checkpoint_dir=str(tmp_path / "a"),
                          interleave_node_ids=False, **kw)
    inter = _make_trainer("streaming", checkpoint_dir=str(tmp_path / "b"),
                          n_devices=2, owner_aligned_waves=True, **kw)
    plain.train_epoch()
    inter.train_epoch()

    rs = np.random.RandomState(1)
    n_ext = plain.splits.n_nodes
    src = rs.randint(1, n_ext // 2, 16).astype(np.int32)
    dst = rs.randint(n_ext // 2, n_ext, 16).astype(np.int32)
    t = np.full(16, float(plain.splits.full.timestamps.max()) + 1.0,
                np.float32)

    p_plain = LinkPredictor.from_trainer(plain)
    p_inter = LinkPredictor.from_trainer(inter)
    s_plain = p_plain.score(src, dst, t)
    s_inter = p_inter.score(src, dst, t)
    np.testing.assert_allclose(s_inter, s_plain, rtol=0, atol=2e-2)

    # checkpoint round trip: the permutation is rebuilt from the cfg
    path = str(tmp_path / "inter.ckpt")
    inter.save_state(path)
    p_ck = LinkPredictor.from_checkpoint(
        path, edge_feats=np.asarray(inter.edge_feats)
    )
    np.testing.assert_allclose(p_ck.score(src, dst, t), s_inter,
                               rtol=0, atol=1e-5)

    # observe keeps working in external-id space
    p_ck.observe(src[:4], dst[:4], t[:4],
                 np.arange(1, 5, dtype=np.int32))
    assert np.isfinite(p_ck.score(src, dst, t + 1.0)).all()
