#!/usr/bin/env python
"""Replay a UST_NAN_DEBUG dump to localize a non-finite training loss.

The trainer's failure-detection mode (engine/trainer.py, UST_NAN_DEBUG)
dumps the last healthy TrainState plus every index batch applied after
it. This tool re-runs those steps ONE at a time (the dump may come from
an unrolled run), printing per-step loss terms and state-health probes,
then dissects the first failing step: augmented-input ranges, teacher /
student logit statistics, per-term losses, and per-leaf gradient norms.

Usage:
  python tools/nan_replay.py --dump /tmp/nan_debug -- <original train.py args>
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tree_absmax(tree):
    leaves = [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return float(jnp.max(jnp.stack(leaves)))


def tree_nan_leaves(tree):
    out = []
    for path, a in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(a)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            out.append(jax.tree_util.keystr(path))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/nan_debug")
    ap.add_argument("--health-every", type=int, default=10)
    ap.add_argument("train_args", nargs="*")
    args = ap.parse_args()

    from ust_run_tpu.cli import config_from_args
    from ust_run_tpu.config import build_parser
    cfg = config_from_args(
        build_parser().parse_args(args.train_args)).resolve()
    from ust_run_tpu.data.datasets import SegmentationDataset
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams
    from ust_run_tpu.semisup.step import make_step_fn, unpack_metrics

    with open(os.path.join(args.dump, "state.pkl"), "rb") as f:
        snap = pickle.load(f)
    with open(os.path.join(args.dump, "batches.pkl"), "rb") as f:
        bdump = pickle.load(f)
    it0, state = snap["iter"], snap["state"]
    unroll = bdump["unroll"]
    # flatten multi-step dispatch batches to single-step batches
    batches = []
    for b in bdump["batches"]:
        if unroll > 1:
            for j in range(unroll):
                batches.append({k: v[j] for k, v in b.items()})
        else:
            batches.append(b)
    print(f"snapshot at iter {it0}, {len(batches)} single steps to replay")

    p = cfg.profile()
    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    lb_num = cfg.labeled_count()
    data_num = p.domain_len[cfg.lb_domain - 1]
    domains = list(range(1, cfg.domain_num + 1))
    lb_ds = SegmentationDataset(cfg.dataset, p, cfg.data_root, "train",
                                cfg.lb_domain, [cfg.lb_domain],
                                list(range(lb_num)))
    ulb_ds = SegmentationDataset(cfg.dataset, p, cfg.data_root, "train",
                                 cfg.lb_domain, domains,
                                 list(range(lb_num, data_num)))
    data = {k: jax.device_put(v) for k, v in {
        "lb_img": lb_ds.images, "lb_lab": lb_ds.labels,
        "ulb_img": ulb_ds.images, "ulb_lab": ulb_ds.labels,
        "ulb_dc": ulb_ds.dc}.items()}

    step_raw = make_step_fn(model, hp, mesh=None)
    step = jax.jit(step_raw)
    state = jax.device_put(state)

    terms = ("loss", "sup_loss", "unsup_loss_ul", "unsup_loss_lu",
             "unsup_loss_s")
    prev_state = state
    for i, batch in enumerate(batches):
        it = it0 + i + 1
        prev_state = state
        state, metrics = step(state, data, batch)
        m = unpack_metrics(np.asarray(metrics), hp)
        bad = [k for k in terms if not np.isfinite(m[k])]
        if i % args.health_every == 0 or bad:
            pmax = tree_absmax(state.params)
            bmax = tree_absmax(state.batch_stats)
            print(f"iter {it}: loss={m['loss']:.4f} sup={m['sup_loss']:.4f} "
                  f"ul={m['unsup_loss_ul']:.4f} lu={m['unsup_loss_lu']:.4f} "
                  f"s={m['unsup_loss_s']:.4f} mask={m['mask_ratio']:.3f} "
                  f"|param|max={pmax:.3e} |bn|max={bmax:.3e}")
        if bad:
            print(f"\n=== first non-finite at iter {it}: {bad} ===")
            out = os.path.join(args.dump, "prefail.pkl")
            with open(out, "wb") as f:
                pickle.dump({"iter": it - 1,
                             "state": jax.device_get(prev_state),
                             "batch": batch}, f)
            print("pre-fail state written to", out)
            dissect(model, hp, prev_state, data, batch)
            # localize the exact primitive: re-run the failing step with
            # the NaN checker on. jit de-optimizes to op-by-op replay on
            # the first NaN and raises with the producing op's traceback.
            print("\n=== re-running failing step under jax_debug_nans ===",
                  flush=True)
            jax.config.update("jax_debug_nans", True)
            try:
                st, mets = jax.jit(step_raw)(prev_state, data, batch)
                jax.block_until_ready(mets)
                np.asarray(mets)
                print("debug_nans: no NaN raised (non-finite was inf-only?)")
            except FloatingPointError as e:
                print("debug_nans traceback:\n", e)
            finally:
                jax.config.update("jax_debug_nans", False)
            return 1
    print("replay finished with no non-finite loss (divergence is "
          "snapshot-timing sensitive; rerun with a smaller UST_NAN_SNAP)")
    return 0


def dissect(model, hp, state, data, batch):
    """Recompute the failing step with intermediate probes (mirrors
    semisup/step.py stage by stage, read-only)."""
    from ust_run_tpu.ops import augment, cutmix, fda
    from ust_run_tpu.semisup.step import decode_mask, _pseudo_from_logits
    from ust_run_tpu.utils import losses as L

    b_lb, b_ulb, s = hp.label_bs, hp.unlabel_bs, hp.patch
    rngs = jax.random.split(state.rng, 10)
    (rng_next, k_weak_lb, k_weak_ulb, k_strong, k_choice, k_fda, k_box,
     k_lq, k_perm, k_misc) = rngs
    lb_idx = jnp.asarray(batch["lb_idx"])
    ulb_idx = jnp.asarray(batch["ulb_idx"])
    lb_img, lb_lab = data["lb_img"][lb_idx], data["lb_lab"][lb_idx]
    ulb_img, ulb_lab = data["ulb_img"][ulb_idx], data["ulb_lab"][ulb_idx]

    def stat(name, x):
        x = np.asarray(x, np.float32)
        fin = np.isfinite(x)
        print(f"  {name}: shape={x.shape} max|.|="
              f"{np.abs(x[fin]).max() if fin.any() else float('nan'):.4e} "
              f"nonfinite={int((~fin).sum())}")

    all_img255, all_lab = augment.weak_augment_batch(
        k_weak_lb, jnp.concatenate([lb_img, ulb_img]),
        jnp.concatenate([lb_lab, ulb_lab]), s, hp.fillcolor)
    lb_img255, ulb_img255 = all_img255[:b_lb], all_img255[b_lb:]
    ulb_s255 = augment.strong_augment_batch(
        k_strong, ulb_img255, hp.min_v, hp.max_v, hp.blur_radius)
    lb_x_w = augment.normalize(lb_img255)
    ulb_x_w = augment.normalize(ulb_img255)
    ulb_x_s = augment.normalize(ulb_s255)
    stat("lb_x_w", lb_x_w)
    stat("ulb_x_w", ulb_x_w)
    stat("ulb_x_s", ulb_x_s)

    # teacher forward health
    tea_logits, _ = model.apply(
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
        ulb_x_w, train=True, groups=1, mutable=["batch_stats"])
    stat("teacher logits(ulb_x_w)", tea_logits)

    # student forward health, group by group input
    stu_logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        ulb_x_w, train=True, groups=1, mutable=["batch_stats"])
    stat("student logits(ulb_x_w)", stu_logits)
    stu_s, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        ulb_x_s, train=True, groups=1, mutable=["batch_stats"])
    stat("student logits(ulb_x_s)", stu_s)

    print("  param leaves nonfinite:", tree_nan_leaves(state.params) or "none")
    print("  bn leaves nonfinite:",
          tree_nan_leaves(state.batch_stats) or "none")
    print("  lq.valid:", np.asarray(state.lq.valid),
          " lq.img:", end="")
    stat("", state.lq.img)

    # queue health (the cut pool mixes queue.img into student inputs)
    stat("queue.img", state.queue.img)
    stat("queue.conf", state.queue.conf)
    stat("queue.hardness", state.queue.hardness)
    print("  queue.count:", int(np.asarray(state.queue.count)),
          " choice_th:", float(np.asarray(state.choice_th)))


if __name__ == "__main__":
    sys.exit(main())
