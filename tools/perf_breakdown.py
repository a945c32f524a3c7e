#!/usr/bin/env python
"""Per-stage device timing of the fused SSL step.

Times each major stage as its own jitted program on the real chip:
weak/strong augmentation, FDA, teacher 3-group forward, student 5-group
value_and_grad, EMA/optimizer update. The sum roughly brackets the fused
step (fusion across stages can only help). Prints a JSON breakdown used
for the BENCH methodology and optimization targeting.

--dataset picks the config profile (default fundus; MNMS probes the
288px 4-class step); --skip-full skips the full-step timing (whose
compile is the expensive part) for quick stage-only bisection.
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def checksummed(fn):
    """Wrap fn to return a scalar checksum over ALL output leaves.

    On this tunneled platform jax.block_until_ready does NOT wait
    (async dispatch, experimental plugin); the only reliable sync is a
    host fetch. A scalar checksum makes that fetch one RTT. Summing every
    leaf (not just the first) keeps XLA from dead-code-eliminating the
    outputs that don't feed the checksum — the r2 version summed only
    leaf 0 of (loss, grads) and thus timed a forward pass labelled as a
    gradient."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(jnp.asarray(leaf, jnp.float32))
                   for leaf in jax.tree.leaves(out))
    return jax.jit(wrapped)


def timeit(fn, *args, n=20):
    import numpy as np
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(out))          # device queue is serial: last done
    return (time.perf_counter() - t0) / n * 1000  # ms


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="fundus")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-step timing (expensive compile)")
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.ops import augment, cutmix, fda
    from ust_run_tpu.semisup import HyperParams, create_train_state
    from ust_run_tpu.semisup.state import make_optimizer
    from ust_run_tpu.semisup.step import make_train_step
    from ust_run_tpu.utils import losses as L

    cfg = TrainConfig(dataset=args.dataset).resolve()
    prof = cfg.profile()
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, hp, 0)
    s = hp.patch
    C = prof.num_channels
    K = 3 if args.dataset == "MNMS" else 1   # label channels in the corpus
    nc = prof.num_classes
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    img8 = jnp.asarray(rng.randint(0, 256, (8, s, s, C)), jnp.float32)
    lab8 = jnp.asarray(rng.choice([0, 128, 255], (8, s, s, K)), jnp.float32)
    img4 = img8[:4]
    x12 = jnp.asarray(rng.randn(12, s, s, C), jnp.float32)
    x20 = jnp.asarray(rng.randn(20, s, s, C), jnp.float32)
    x1 = x12[:1]
    if prof.multilabel:
        pl2 = jnp.asarray(rng.rand(4, s, s, nc) > 0.5, jnp.float32)
        mask2 = jnp.ones((4, s, s, nc), jnp.float32)
    else:
        pl2 = jnp.asarray(rng.randint(0, nc, (4, s, s)), jnp.int32)
        mask2 = jnp.ones((4, s, s, 1), jnp.float32)

    res = {}

    weak = checksummed(lambda k, i, l: augment.weak_augment_batch(
        k, i, l, s, hp.fillcolor))
    res["weak_aug_8img"] = timeit(weak, key, img8, lab8)

    strong = checksummed(lambda k, i: augment.strong_augment_batch(
        k, i, hp.min_v, hp.max_v, hp.blur_radius))
    res["strong_aug_4img"] = timeit(strong, key, img4)

    fda_f = checksummed(lambda k, a, b: fda.fda_batch(k, a, b, 0.5, hp.LB))
    res["fda_4img"] = timeit(fda_f, key, img4, img4)

    box_f = checksummed(lambda k: cutmix.cutmix_boxes(k, 4, s, 1.0))
    res["cutmix_boxes"] = timeit(box_f, key)

    tea = checksummed(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=True, groups=3,
        mutable=["batch_stats"]))
    res["teacher_fwd_12img"] = timeit(tea, state.ema_params,
                                      state.ema_batch_stats, x12)

    def loss_fn(params, bs, x20, x1):
        # the fused 6-group (5x4 + 1 LQ) student call of semisup/step.py
        logits, upd = model.apply(
            {"params": params, "batch_stats": bs},
            jnp.concatenate([x20, x1]), train=True,
            group_sizes=(4, 4, 4, 4, 4, 1),
            group_valid=jnp.ones((6,), jnp.bool_),
            mutable=["batch_stats"])
        parts = jnp.split(logits, [4, 8, 12, 16, 20])
        total = 0.0
        for lg in parts[1:5]:
            total += L.ce_plus_dice(lg, pl2, multilabel=prof.multilabel,
                                    n_classes=nc, mask=mask2)
        return total + 0.0 * jnp.sum(parts[5])

    grad_f0 = jax.jit(jax.value_and_grad(loss_fn))
    grad_f = checksummed(jax.value_and_grad(loss_fn))
    res["student_grad_21img"] = timeit(grad_f, state.params,
                                       state.batch_stats, x20, x1)

    tx = make_optimizer(hp.base_lr, hp.max_iterations)
    opt_state = tx.init(state.params)

    def upd(params, ema, grads, opt_state):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_p = optax.apply_updates(params, updates)
        new_e = jax.tree.map(lambda e, p: 0.99 * e + 0.01 * p, ema, new_p)
        return new_p, new_e, new_opt

    _, grads = grad_f0(state.params, state.batch_stats, x20, x1)
    upd_f = checksummed(upd)
    res["optimizer_ema"] = timeit(upd_f, state.params, state.ema_params,
                                  grads, opt_state)

    if not args.skip_full:
        step = make_train_step(model, hp)
        data = {
            "lb_img": jnp.asarray(rng.randint(0, 256, (64, s, s, C)),
                                  jnp.uint8),
            "lb_lab": jnp.asarray(rng.choice([0, 128, 255], (64, s, s, K)),
                                  jnp.uint8),
            "ulb_img": jnp.asarray(rng.randint(0, 256, (64, s, s, C)),
                                   jnp.uint8),
            "ulb_lab": jnp.asarray(rng.choice([0, 128, 255], (64, s, s, K)),
                                   jnp.uint8),
            "ulb_dc": jnp.ones((64,), jnp.int32),
        }
        idx = {"lb_idx": jnp.arange(4, dtype=jnp.int32),
               "ulb_idx": jnp.arange(4, dtype=jnp.int32)}

        st = state
        st, m = step(st, data, idx)
        np.asarray(m)
        t0 = time.perf_counter()
        n = args.n
        for _ in range(n):
            st, m = step(st, data, idx)
        np.asarray(m)
        res["full_step"] = (time.perf_counter() - t0) / n * 1000

    res["stage_sum"] = sum(v for k, v in res.items()
                           if k not in ("full_step",))
    print(json.dumps({k: round(v, 2) for k, v in res.items()}, indent=1))
