"""Capture a device profile of one bench-scale train epoch and print the
op-level time breakdown (the re-profiling harness behind NOTES.md's tower
budget numbers).

    python scripts/profile_epoch.py               # trace + top-30 ops
    python scripts/profile_epoch.py logdir=/tmp/p  top=50

Parses the .xplane.pb directly (TensorFlow's xplane proto ships in the
container); aggregates self-time by event name on the TPU device plane.
"""
import glob
import os
import sys
import time

sys.path.insert(0, ".")


def capture(logdir, overrides=None):
    import jax

    from zebra_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache(jax)

    from zebra_tpu.config import Config
    from zebra_tpu.data.dataset import split_data
    from zebra_tpu.data.synthetic import synthetic_stream
    from zebra_tpu.train.loop import Trainer

    data, edge_feats = synthetic_stream(
        n_events=120_000, n_users=20_000, n_items=20_000, edge_dim=172,
        seed=0,
    )
    splits = split_data(
        data.sources, data.destinations, data.timestamps, data.edge_idxs,
        data.labels,
    )
    base = dict(
        data="bench", bs=200, node_dim=100, time_dim=100, memory_dim=100,
        topk=20, alpha_list=(0.1, 0.1), beta_list=(0.05, 0.95),
        tppr_strategy="streaming", checkpoint_dir="/tmp/zebra_bench_ckpt",
    )
    base.update(overrides or {})
    cfg = Config(**base)
    trainer = Trainer(cfg, splits, edge_feats)
    trainer.train_epoch()  # warm
    t0 = time.time()
    with jax.profiler.trace(logdir):
        trainer.train_epoch()
        jax.block_until_ready(trainer.params)
    print(f"traced epoch: {time.time() - t0:.3f}s "
          f"({splits.train.n_interactions / (time.time() - t0):.0f} ev/s)")


def report(logdir, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        # per-line totals; XLA op lines nest, so take the busiest line
        lines = []
        for line in plane.lines:
            agg = {}
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                agg[name] = agg.get(name, 0) + ev.duration_ps
            total = sum(agg.values())
            lines.append((total, line.name, agg))
        if not lines:
            continue
        lines.sort(key=lambda x: -x[0])
        print(f"\n== plane {plane.name!r} ==")
        for total, lname, _ in lines:
            print(f"  line {lname!r}: busy {total / 1e12:.3f}s")
        # op breakdown of the two busiest lines (typically the compute line
        # and the async-copy line; both matter for the roofline story)
        for total, lname, agg in lines[:2]:
            if not total:
                continue
            print(f"\n-- top ops, line {lname!r} --")
            for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ps / 1e9:10.1f}ms  {100 * ps / total:5.1f}%  "
                      f"{name[:110]}")


def main():
    logdir, top, overrides = "/tmp/zebra_prof", 30, {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        if k == "logdir":
            logdir = v
        elif k == "top":
            top = int(v)
        else:
            # config override parsed against the dataclass default; bool and
            # sequence fields need explicit handling (bool('False') is True,
            # type(default)(v) would silently invert 'off' arms — same rule
            # as train_microbench's convert)
            from zebra_tpu.config import Config

            default = Config.__dataclass_fields__[k].default
            if isinstance(default, bool):
                if v.lower() in ("1", "true", "yes", "on"):
                    overrides[k] = True
                elif v.lower() in ("0", "false", "no", "off"):
                    overrides[k] = False
                else:
                    raise ValueError(
                        f"boolean override needs true/false, got {v!r}"
                    )
            elif isinstance(default, (tuple, list)):
                elem = type(default[0]) if len(default) else float
                overrides[k] = tuple(elem(x) for x in v.split(","))
            elif default is None or isinstance(default, str):
                overrides[k] = v
            else:
                overrides[k] = type(default)(v)
    capture(logdir, overrides)
    report(logdir, top)


if __name__ == "__main__":
    main()
