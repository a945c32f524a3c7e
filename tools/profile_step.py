#!/usr/bin/env python
"""Capture a device trace of the fused step and print the top HLO ops by
self time (tensorboard_plugin_profile does the xplane->tool conversion).

Usage: PYTHONPATH=. python tools/profile_step.py [--top 40]
Writes the raw trace under /tmp/ust_trace and prints a table used for
the BENCH methodology (MFU / per-op breakdown).
"""

import argparse
import glob
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/ust_trace")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    import numpy as np

    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams, create_train_state
    from ust_run_tpu.semisup.step import make_train_step

    cfg = TrainConfig(dataset="fundus").resolve()
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, hp, 0)
    step = make_train_step(model, hp)
    rng = np.random.RandomState(0)
    s = hp.patch
    data = {
        "lb_img": rng.randint(0, 256, (64, s, s, 3)).astype(np.uint8),
        "lb_lab": rng.choice([0, 128, 255], (64, s, s, 1)).astype(np.uint8),
        "ulb_img": rng.randint(0, 256, (64, s, s, 3)).astype(np.uint8),
        "ulb_lab": rng.choice([0, 128, 255], (64, s, s, 1)
                              ).astype(np.uint8),
        "ulb_dc": np.ones(64, np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data.items()}
    idx = {"lb_idx": np.arange(4, dtype=np.int32),
           "ulb_idx": np.arange(4, dtype=np.int32)}

    state, m = step(state, data, idx)
    np.asarray(m)
    jax.profiler.start_trace(args.out)
    for _ in range(10):
        state, m = step(state, data, idx)
    np.asarray(m)
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        raise SystemExit("no xplane.pb captured")
    xplane = xplanes[-1]

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    params = {"tqx": "out:json"}
    data_out, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats", params)
    table = json.loads(data_out) if isinstance(data_out, str) else data_out
    # framework_op_stats json: gviz table with rows of op stats
    try:
        cols = [c["label"] for c in table["table"]["cols"]]
        rows = table["table"]["rows"]
    except (KeyError, TypeError):
        print(json.dumps(table)[:2000])
        raise
    idx_of = {c: i for i, c in enumerate(cols)}

    def cell(r, name):
        return r["c"][idx_of[name]]["v"]

    items = []
    for r in rows:
        try:
            items.append((cell(r, "Type"),
                          float(cell(r, "Total self-time (us)")),
                          float(cell(r, "TFLOPs")) if "TFLOPs" in idx_of
                          else 0.0))
        except (KeyError, TypeError, ValueError):
            continue
    agg = {}
    for typ, t_us, fl in items:
        a = agg.setdefault(typ, [0.0, 0.0])
        a[0] += t_us
        a[1] += fl
    total = sum(a[0] for a in agg.values())
    print(f"{'op type':<32}{'self ms':>10}{'%':>7}")
    for typ, (t_us, fl) in sorted(agg.items(), key=lambda kv: -kv[1][0]
                                  )[:args.top]:
        print(f"{typ:<32}{t_us / 1000:>10.2f}{100 * t_us / total:>6.1f}%")
    print(f"{'TOTAL':<32}{total / 1000:>10.2f}  (10 steps)")


if __name__ == "__main__":
    main()
