#!/usr/bin/env python
"""Headline benchmark: SSL training throughput (images/sec/chip).

Measures the steady-state pipelined rate of the fused train step on the
fundus U-Net config (256x256, batch 4 labeled + 4 unlabeled — the
reference's effective batch, train.py:56-57,404-414), on whatever chip(s)
JAX exposes, and prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md). The
denominator is derived in BASELINE_METHOD.md from (a) the XLA-counted
6.91 TFLOP/iteration of the identical algorithm, (b) V100 fp16 MFU
scenarios for unfused research PyTorch, and (c) the reference's
mandatory per-iteration host work measured by running its actual code
(FDA numpy FFT, host dice — tools/ref_cpu_launch.py makes the unmodified
reference runnable here). Point estimate 20 img/s, range [13, 31];
`vs_baseline_range` reports both endpoints.
"""

import json
import os
import threading
import time

# BASELINE_METHOD.md: V100 "typical" scenario point estimate + range
REFERENCE_GPU_IMG_PER_SEC = 20.0
REFERENCE_RANGE = (13.0, 31.0)

# Device-acquisition watchdog: if the TPU tunnel is down, jax.devices()
# blocks forever inside C plugin init (SIGALRM handlers never run —
# the main thread never returns to the interpreter), so a daemon
# thread emits a diagnosable JSON line and hard-exits instead of
# hanging whatever harness invoked us.
WATCHDOG_SECS = int(os.environ.get("UST_BENCH_WATCHDOG", "900"))
_done = threading.Event()


def _watchdog():
    if _done.wait(WATCHDOG_SECS):
        return
    print(json.dumps({
        "metric": "ssl_train_images_per_sec_per_chip",
        "value": 0.0,
        "unit": "images/s",
        "vs_baseline": 0.0,
        "error": f"device acquisition/benchmark exceeded {WATCHDOG_SECS}s "
                 "(TPU tunnel down?); see PERF.md for the last measured "
                 "on-chip headline",
    }), flush=True)
    os._exit(3)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # NOTE: jax_default_prng_impl 'rbg' faults the TPU worker on this
    # platform (kernel crash observed twice); threefry is stable.
    import numpy as np

    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams, create_train_state
    from ust_run_tpu.semisup.step import make_train_multi_step

    # secondary datapoints: UST_BENCH_DATASET=MNMS|prostate|BUSI measures
    # the same fused step at that dataset's shapes (288²/384²/256²,
    # grayscale); the headline metric stays the default (fundus).
    ds = os.environ.get("UST_BENCH_DATASET", "fundus")
    cfg = TrainConfig(dataset=ds).resolve()
    cfg.unroll_steps = int(os.environ.get("UST_BENCH_UNROLL",
                                          cfg.unroll_steps))
    # secondary datapoints (e.g. the DeepLabV2 backbone-swap config):
    # UST_BENCH_MODEL=deeplabv2_r50 measures the same fused step on that
    # model; the headline metric stays the default (unet).
    cfg.model = os.environ.get("UST_BENCH_MODEL", cfg.model)
    # batch-scaling datapoint: UST_BENCH_BATCH=8 runs the same fused step
    # at 8 labeled + 8 unlabeled. The headline stays the reference's 4+4
    # (train.py:56-57) — this knob measures how throughput scales when a
    # framework user raises the batch beyond the reference's operating
    # point (the per-image fixed costs amortize; see PERF.md).
    bench_bs = int(os.environ.get("UST_BENCH_BATCH", "0"))
    if bench_bs:
        cfg.label_bs = cfg.unlabel_bs = bench_bs
    # A/B knob: UST_BENCH_PACK=0 benches the plain NHWC level-1 layout
    # (models/unet.py pack_l1). The headline default is the packed layout
    # (cfg.pack_l1=1), the shipping configuration.
    cfg.pack_l1 = int(os.environ.get("UST_BENCH_PACK", cfg.pack_l1))
    # A/B knob: UST_BENCH_SPLIT=0 benches the concat form of the Up-path
    # first convs (models/layers.SplitConv3x3 off).
    cfg.split_up = int(os.environ.get("UST_BENCH_SPLIT", cfg.split_up))
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, hp, 0)
    unroll = cfg.unroll_steps
    step = make_train_multi_step(model, hp)

    # synthetic corpus of a realistic size (fundus: 789 train images),
    # resident in device HBM; steps receive only sampled indices.
    rng = np.random.RandomState(0)
    n_corpus = 256
    s = hp.patch
    C = cfg.profile().num_channels
    K = 3 if ds == "MNMS" else 1      # label channels in the corpus
    data = {
        "lb_img": rng.randint(0, 256, (n_corpus, s, s, C)
                              ).astype(np.uint8),
        "lb_lab": rng.choice([0, 128, 255], (n_corpus, s, s, K)
                             ).astype(np.uint8),
        "ulb_img": rng.randint(0, 256, (n_corpus, s, s, C)
                               ).astype(np.uint8),
        "ulb_lab": rng.choice([0, 128, 255], (n_corpus, s, s, K)
                              ).astype(np.uint8),
        "ulb_dc": np.ones(n_corpus, np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data.items()}

    def idx_batch():
        return {"lb_idx": rng.randint(0, n_corpus, (unroll, cfg.label_bs)
                                      ).astype(np.int32),
                "ulb_idx": rng.randint(0, n_corpus, (unroll, cfg.unlabel_bs)
                                       ).astype(np.int32)}

    # compile + warmup
    state, m = step(state, data, idx_batch())
    float(np.asarray(m)[0, 0])
    for _ in range(2):
        state, m = step(state, data, idx_batch())
    float(np.asarray(m)[0, 0])

    # steady state with one-dispatch-lag metric fetch (production pattern)
    n_calls = 8
    pending = None
    t0 = time.time()
    for _ in range(n_calls):
        state, m = step(state, data, idx_batch())
        if pending is not None:
            np.asarray(pending)
        pending = m
    np.asarray(pending)
    dt = (time.time() - t0) / (n_calls * unroll)

    _done.set()
    imgs_per_sec = (cfg.label_bs + cfg.unlabel_bs) / dt
    metric = "ssl_train_images_per_sec_per_chip"
    if ds != "fundus":
        metric += f"_{ds}"
    if cfg.model != "unet":
        metric += f"_{cfg.model}"
    if bench_bs:
        metric += f"_b{bench_bs}"
    # BASELINE_METHOD.md derives the 20 img/s denominator at the fundus
    # 256² patch; the per-iteration cost model is FLOPs-dominated, so for
    # other patches the reference denominator scales by pixel count.
    px_scale = (s / 256.0) ** 2
    base = REFERENCE_GPU_IMG_PER_SEC / px_scale
    base_range = (REFERENCE_RANGE[0] / px_scale, REFERENCE_RANGE[1] / px_scale)
    out = {
        "metric": metric,
        "value": round(imgs_per_sec, 2),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_sec / base, 2),
        "vs_baseline_range": [
            round(imgs_per_sec / base_range[1], 2),
            round(imgs_per_sec / base_range[0], 2)],
        "baseline_img_per_sec": round(base, 2),
        "baseline_basis": "BASELINE_METHOD.md (flops model + measured "
                          "host overheads; ref publishes no numbers)",
    }
    if bench_bs:
        # The 20 img/s denominator is derived at the reference's own 4+4
        # operating point; a batched datapoint has no like-for-like
        # baseline, so don't emit a speedup ratio for it.
        out["vs_baseline"] = None
        out["vs_baseline_range"] = None
        out["baseline_basis"] = (
            "raw img/s only: baseline denominator is defined at the "
            "reference 4+4 batch (BASELINE_METHOD.md), not at bs=%d" %
            bench_bs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
