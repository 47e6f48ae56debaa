"""End-to-end training on a small synthetic stream: losses decrease, AP beats
chance, the val/test protocol runs with bit-exact backup/restore, and both
index strategies drive the same loop."""

import numpy as np
import pytest

import jax

from zebra_tpu.config import Config
from zebra_tpu.data.dataset import split_data
from zebra_tpu.data.synthetic import synthetic_stream
from zebra_tpu.train.loop import Trainer


def _make_trainer(strategy="streaming", edge_dim=4, n_events=1200, **cfg_kw):
    data, edge_feats = synthetic_stream(
        n_events=n_events, n_users=40, n_items=40, edge_dim=edge_dim, seed=0
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs, data.labels
    )
    kw = dict(
        data="synthetic",
        bs=50,
        index_chunk=200,
        node_dim=16,
        time_dim=16,
        memory_dim=16,
        topk=5,
        alpha_list=(0.1,),
        beta_list=(0.9,),
        tppr_strategy=strategy,
        n_degree=5,
        n_layer=2,
        lr=3e-3,
        n_epoch=2,
        checkpoint_dir="/tmp/zebra_test_ckpt",
    )
    kw.update(cfg_kw)
    cfg = Config(**kw)
    return Trainer(cfg, splits, edge_feats)


@pytest.mark.parametrize("strategy", ["streaming", "pruning"])
def test_smoke_epoch(strategy):
    trainer = _make_trainer(strategy)
    r1 = trainer.train_epoch()
    trainer.train_epoch()
    r3 = trainer.train_epoch()
    assert np.isfinite(r1.loss) and np.isfinite(r3.loss)
    assert r3.loss < r1.loss, (r1.loss, r3.loss)
    assert r3.ap > 0.55, r3.ap  # well above the 0.5 chance level

    trans, induct = trainer.validate()
    assert 0.0 < trans.ap <= 1.0 and 0.0 < induct.ap <= 1.0
    t_trans, t_induct = trainer.test()
    assert 0.0 < t_trans.ap <= 1.0 and 0.0 < t_induct.ap <= 1.0


def test_fit_runs_and_improves():
    trainer = _make_trainer("streaming")
    out = trainer.fit(n_epoch=5)
    assert out["test_ap"] > 0.55, out


def test_validation_restore_is_exact():
    """After validate(), (mem, index) must be exactly the transductive
    val-end state: rerunning validate from retained train-end state twice
    gives identical metrics (deterministic eval, seeded sampler)."""
    trainer = _make_trainer("streaming")
    trainer.train_epoch()

    import copy

    mem_before = jax.tree.map(np.asarray, trainer.mem)
    idx_before = jax.tree.map(np.asarray, trainer.index_state)

    trans1, induct1 = trainer.validate()
    mem_after1 = jax.tree.map(np.asarray, trainer.mem)

    # restore train-end state and re-validate: results must be identical
    import jax.numpy as jnp

    trainer.mem = jax.tree.map(jnp.asarray, mem_before)
    trainer.index_state = type(trainer.index_state)(
        *(jnp.asarray(x) for x in idx_before)
    )
    trans2, induct2 = trainer.validate()
    mem_after2 = jax.tree.map(np.asarray, trainer.mem)

    assert trans1.ap == trans2.ap and induct1.ap == induct2.ap
    for a, b in zip(jax.tree.leaves(mem_after1), jax.tree.leaves(mem_after2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("index_chunk", [120, 30])
def test_superchunk_geometry_off_boundary(index_chunk):
    """Superchunk sizes that don't divide the padded stream evenly (and
    index_chunk < bs) must still split on whole-batch boundaries; the phase
    reuses the chunk count the upload padded for instead of re-deriving it
    (regression: reshape crash when ceil(real_batches/n_chunks)*bs >
    index_chunk)."""
    trainer = _make_trainer("streaming", index_chunk=index_chunk)
    ps = trainer._streams["train"]
    chunk = ps.stream.src.shape[0] // ps.n_chunks
    assert chunk % trainer.cfg.bs == 0
    assert chunk * ps.n_chunks == ps.stream.src.shape[0]
    r = trainer.train_epoch()
    assert np.isfinite(r.loss)


def test_eval_negatives_match_reference_draw_order():
    """sample_eval_negatives consumes the seeded RandomState in the
    reference's per-batch interleaved (src, dst) order (evaluation.py:30-31),
    so seeded eval negatives are bit-identical to reference runs."""
    from zebra_tpu.data.sampler import RandEdgeSampler

    src_pop = np.arange(1, 40)
    dst_pop = np.arange(40, 95)
    sampler = RandEdgeSampler(src_pop, dst_pop, seed=0)
    n, bs = 137, 25
    got = sampler.sample_eval_negatives(n, bs)

    # reference draw loop, verbatim semantics
    rs = np.random.RandomState(0)
    src_list, dst_list = np.unique(src_pop), np.unique(dst_pop)
    want = []
    for lo in range(0, n, bs):
        size = min(bs, n - lo)
        rs.randint(0, len(src_list), size)  # src draw (discarded)
        want.append(dst_list[rs.randint(0, len(dst_list), size)])
    np.testing.assert_array_equal(got, np.concatenate(want))


def test_synthetic_stream_small_item_population():
    """Empty hard-coded communities at small n_items fall back to the global
    item distribution instead of crashing (regression)."""
    data, _ = synthetic_stream(n_events=64, n_users=8, n_items=16, seed=0)
    assert data.n_interactions == 64
    assert data.destinations.min() >= 9  # items offset past users


def test_no_edge_features_path():
    trainer = _make_trainer("streaming", edge_dim=0)
    assert trainer.cfg.edge_dim == 1  # zero placeholder column
    r = trainer.train_epoch()
    assert np.isfinite(r.loss)


def test_tiny_dataset_with_empty_splits():
    """Degenerate streams (empty inductive splits) must not crash or NaN."""
    import jax.numpy as jnp
    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import Data, DatasetSplits

    # 30 events, every node seen in training → new-node splits are empty
    n = 30
    src = np.arange(1, n + 1, dtype=np.int32) % 5 + 1
    dst = np.arange(1, n + 1, dtype=np.int32) % 7 + 6
    ts = np.arange(n, dtype=np.float64)
    eidx = np.arange(1, n + 1, dtype=np.int32)
    lab = np.zeros(n)
    full = Data(src, dst, ts, eidx, lab)
    empty = Data(src[:0], dst[:0], ts[:0], eidx[:0], lab[:0])
    splits = DatasetSplits(
        full=full, train=full.slice(0, 20), val=full.slice(20, 25),
        test=full.slice(25, 30), new_node_val=empty, new_node_test=empty,
        n_nodes=13, n_edges=n,
    )
    cfg = Config(
        data="tiny", bs=8, node_dim=8, time_dim=8, memory_dim=8, topk=3,
        alpha_list=(0.1,), beta_list=(0.9,), tppr_strategy="streaming",
        checkpoint_dir="/tmp/zebra_tiny_ckpt", lr=1e-3,
    )
    trainer = Trainer(cfg, splits, None)
    r = trainer.train_epoch()
    assert np.isfinite(r.loss)
    trans, induct = trainer.validate()
    assert np.isfinite(trans.ap)
    assert induct.ap == 0.0  # empty split scores nothing, no NaN
    t_trans, t_induct = trainer.test()
    assert np.isfinite(t_trans.ap) and t_induct.ap == 0.0

def test_lazy_dedup_matches_per_position():
    """The unique-compacted lazy-update path (Config.lazy_unique_cap) is
    numerically equivalent to the per-position path, including when a tiny
    cap forces the lax.cond overflow fallback every batch."""
    results = {}
    # auto cap (dedup active), per-position, and a cap of 2 (always
    # overflows with topk=5 -> every batch takes the fallback branch).
    # f32 storage pins the updater-cell math to f32 so the comparison is
    # tight: with the bf16 table defaults, compacted-vs-per-position matmul
    # tiling differences are amplified by bf16 weight rounding and drift
    # visibly over two training epochs (chaotic, not wrong).
    for name, cap in [("auto", -1), ("off", 0), ("overflow", 2)]:
        trainer = _make_trainer("streaming", lazy_unique_cap=cap,
                                message_dtype="float32",
                                memory_dtype="float32")
        r = trainer.train_epoch()
        r2 = trainer.train_epoch()
        val, _ = trainer.validate()
        results[name] = (float(r.loss), float(r2.loss), float(val.ap))
    off = np.array(results["off"])
    for name in ("auto", "overflow"):
        got = np.array(results[name])
        np.testing.assert_allclose(got, off, rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_fused_chunk_matches_two_dispatch():
    """The fused wave-scan+phase program (--fused_dispatch) must match the
    default two-dispatch split: same math, only the program boundary moves.
    (The split is the default because it measured ~15% faster on v5e —
    RESULTS.md round 3.)"""
    a = _make_trainer("streaming", fused_dispatch=True)
    b = _make_trainer("streaming")
    ra = [a.train_epoch() for _ in range(2)]
    rb = [b.train_epoch() for _ in range(2)]
    for xa, xb in zip(ra, rb):
        assert np.isclose(xa.loss, xb.loss, rtol=1e-5), (xa.loss, xb.loss)
        assert np.isclose(xa.ap, xb.ap, rtol=1e-5)
    la = jax.tree.leaves(a.params)
    lb = jax.tree.leaves(b.params)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(a.mem.memory), np.asarray(b.mem.memory),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(a.index_state.data), np.asarray(b.index_state.data)
    )


def test_owner_aligned_auto_policy():
    """Auto (None) enables owner-aligned waves only under multi-process
    execution; explicit flags win (docs/SCALING.md study)."""
    from zebra_tpu.config import Config
    from zebra_tpu.train.loop import resolve_owner_aligned

    assert Config().owner_aligned_waves is None
    # single-process test environment: auto resolves off
    assert resolve_owner_aligned(Config()) is False
    assert resolve_owner_aligned(Config(owner_aligned_waves=True)) is True
    assert resolve_owner_aligned(Config(owner_aligned_waves=False)) is False
    # CLI tri-state
    assert Config.from_args(["-d", "x"]).owner_aligned_waves is None
    assert Config.from_args(
        ["-d", "x", "--owner_aligned_waves"]
    ).owner_aligned_waves is True
    assert Config.from_args(
        ["-d", "x", "--no_owner_aligned_waves"]
    ).owner_aligned_waves is False
