#!/usr/bin/env python
"""Capture a device trace of the fused step and print the top HLO ops by
self time (xplane parsed directly via tools/xplane_tools.py; the
tensorboard_plugin_profile converter is broken by a protobuf/tf skew in
this environment).

Usage: PYTHONPATH=. python tools/profile_step.py [--top 40]
Writes the raw trace under /tmp/ust_trace and prints a table used for
the BENCH methodology (MFU / per-op breakdown).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/ust_trace")
    ap.add_argument("--dataset", default="fundus",
                    choices=["fundus", "prostate", "BUSI", "MNMS"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    import numpy as np

    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams, create_train_state
    from ust_run_tpu.semisup.step import make_train_step

    cfg = TrainConfig(dataset=args.dataset).resolve()
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, hp, 0)
    step = make_train_step(model, hp)
    rng = np.random.RandomState(0)
    s = hp.patch
    C = cfg.profile().num_channels
    K = 3 if args.dataset == "MNMS" else 1
    data = {
        "lb_img": rng.randint(0, 256, (64, s, s, C)).astype(np.uint8),
        "lb_lab": rng.choice([0, 128, 255], (64, s, s, K)).astype(np.uint8),
        "ulb_img": rng.randint(0, 256, (64, s, s, C)).astype(np.uint8),
        "ulb_lab": rng.choice([0, 128, 255], (64, s, s, K)
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

    from xplane_tools import print_table
    print_table(xplane, steps=10, top=args.top)


if __name__ == "__main__":
    main()
