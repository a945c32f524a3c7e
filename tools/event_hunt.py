#!/usr/bin/env python
"""Hunt the first weight-growth event in a training run and name its cause.

Context: at the reference's full-budget operating point (max_iterations
30k/60k, so the poly LR stays ~base_lr for thousands of iterations) the
student's INPUT block (inc: Conv->BN->Conv) can enter runaway norm growth
— a BN-scale-invariance pathology that ends, thousands of iterations
later, in overflow (see tools/nan_replay.py and the r3 forensics). This
tool drives the fused step one iteration at a time from scratch,
watches max|inc.Conv_0| every step, and on the first growth event:

  * dumps the pre-event state + the index batches of the event window;
  * replays the window decomposing the parameter gradient BY LOSS TERM
    (sup, cons_w*ul, cons_w*lu, cons_w^2*s — the exact weights of
    train.py:838), reporting for each term its l2 norm on the inc leaves
    and its RADIAL component  dot(g, p)/|p|^2  (negative = the update
    grows the weight norm).

Usage:
  python tools/event_hunt.py [--trigger 1.3] [--window 50] [--max-iters N]
      -- <train.py args>
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trigger", type=float, default=1.3,
                    help="growth ratio over --window steps that fires")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--max-iters", type=int, default=4000)
    ap.add_argument("--snap-every", type=int, default=25)
    ap.add_argument("--dump", default="/tmp/event_debug")
    ap.add_argument("--replay-ahead", type=int, default=15,
                    help="steps decomposed after the trigger")
    ap.add_argument("train_args", nargs="*")
    args = ap.parse_args()

    from ust_run_tpu.cli import config_from_args
    from ust_run_tpu.config import build_parser
    cfg = config_from_args(
        build_parser().parse_args(args.train_args)).resolve()
    from ust_run_tpu.data.datasets import SegmentationDataset
    from ust_run_tpu.data.pipeline import BatchPipeline
    from ust_run_tpu.engine.trainer import build_model
    from ust_run_tpu.semisup import HyperParams, create_train_state
    from ust_run_tpu.semisup.step import (make_step_parts, unpack_metrics)

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
    lb_pipe = BatchPipeline(lb_ds, cfg.label_bs, seed=cfg.seed)
    ulb_pipe = BatchPipeline(ulb_ds, cfg.unlabel_bs, seed=cfg.seed + 1)

    step_fn, build_inputs, loss_terms = make_step_parts(model, hp, mesh=None)

    def probed_step(state, data, idx):
        new_state, metrics = step_fn(state, data, idx)
        pr = new_state.params["inc"]
        probes = jnp.stack([
            jnp.max(jnp.abs(pr["Conv_0"]["kernel"])),
            jnp.max(jnp.abs(pr["Conv_1"]["kernel"])),
            jnp.max(jnp.abs(pr["GroupedBatchNorm_0"]["scale"])),
        ])
        return new_state, metrics, probes

    step = jax.jit(probed_step, donate_argnums=(0,))

    TERMS = ("sup", "ul", "lu", "s")

    def _term_grads(state, data, idx):
        """Per-term gradients at the weights of `state` for this batch,
        weighted exactly as they enter the total (train.py:838)."""
        inp = build_inputs(state, data, idx)

        def weighted(params, w_sup, w_ul, w_lu, w_s):
            total, aux = loss_terms(params, state, inp)
            return (w_sup * aux["sup_loss"] + w_ul * aux["unsup_ul"]
                    + w_lu * aux["unsup_lu"] + w_s * aux["unsup_s"])

        cw = inp["cons_w"]
        weights = {"sup": (1.0, 0.0, 0.0, 0.0),
                   "ul": (0.0, cw, 0.0, 0.0),
                   "lu": (0.0, 0.0, cw, 0.0),
                   "s": (0.0, 0.0, 0.0, cw * cw)}
        out = {}
        for name in TERMS:
            g = jax.grad(weighted)(state.params, *weights[name])
            leaves = jax.tree.leaves(g)
            gsq = sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves)
            ginc = g["inc"]
            pinc = state.params["inc"]
            inc_sq = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                         for x in jax.tree.leaves(ginc))
            # radial component per inc leaf group: dot(g,p)/|p|^2
            rad = {}
            for mod, leaf in (("Conv_0", "kernel"), ("Conv_1", "kernel"),
                              ("GroupedBatchNorm_0", "scale")):
                gg = ginc[mod][leaf].astype(jnp.float32)
                pp = pinc[mod][leaf].astype(jnp.float32)
                rad[f"{mod}.{leaf}"] = (
                    jnp.sum(gg * pp) / jnp.maximum(jnp.sum(pp * pp), 1e-20),
                    jnp.sqrt(jnp.sum(gg * gg)))
            out[name] = dict(gnorm=jnp.sqrt(gsq), inc_norm=jnp.sqrt(inc_sq),
                             radial=rad)
        out["cons_w"] = cw
        return out

    term_grads = jax.jit(_term_grads)

    ring = []          # [(iter, host_state)]
    batches_since = {}  # iter -> [batches]
    state = create_train_state(model, hp, cfg.seed)
    hist = []
    print(f"hunting events: trigger x{args.trigger} over {args.window} "
          f"steps, config lr={cfg.base_lr} max_iter={hp.max_iterations}",
          flush=True)

    def snapshot(it):
        ring.append((it, jax.device_get(state)))
        batches_since[it] = []
        while len(ring) > 3:
            old = ring.pop(0)
            del batches_since[old[0]]

    trigger_iter = None
    for it in range(args.max_iters):
        if it % args.snap_every == 0:
            snapshot(it)
        batch = {"lb_idx": lb_pipe.next_indices().astype(np.int32),
                 "ulb_idx": ulb_pipe.next_indices().astype(np.int32)}
        for k in batches_since:
            batches_since[k].append(batch)
        # epoch boundary: trainer resets LQ each num_eval_iter steps
        if it % cfg.num_eval_iter == 0:
            from ust_run_tpu.semisup.state import reset_epoch
            state = reset_epoch(state, it // cfg.num_eval_iter)
        state, metrics, probes = step(state, data, batch)
        pv = np.asarray(probes)
        m = unpack_metrics(np.asarray(metrics), hp)
        hist.append((pv[0], float(m["loss"])))
        if it % 100 == 0:
            print(f"iter {it}: inc.conv0={pv[0]:.4f} conv1={pv[1]:.4f} "
                  f"bn0={pv[2]:.4f} loss={m['loss']:.4f} "
                  f"consw={m['consistency_weight']:.3f}", flush=True)
        if it < args.warmup or len(hist) <= args.window:
            continue
        base = hist[-1 - args.window][0]
        if pv[0] > args.trigger * base or not np.isfinite(m["loss"]):
            trigger_iter = it
            print(f"\n=== EVENT at iter {it}: inc.conv0 {base:.4f} -> "
                  f"{pv[0]:.4f} over {args.window} steps ===", flush=True)
            break

    if trigger_iter is None:
        print(f"no event in {args.max_iters} iters "
              f"(final inc.conv0={hist[-1][0]:.4f})")
        return 0

    # pick the snapshot that covers the window start
    snap_it, snap_state = None, None
    for it0, st in ring:
        if it0 <= trigger_iter - args.window:
            snap_it, snap_state = it0, st
    if snap_state is None:
        snap_it, snap_state = ring[0]
    os.makedirs(args.dump, exist_ok=True)
    with open(os.path.join(args.dump, "event.pkl"), "wb") as f:
        pickle.dump({"iter": snap_it, "state": snap_state,
                     "batches": batches_since[snap_it],
                     "trigger_iter": trigger_iter}, f)
    print(f"window dumped to {args.dump}/event.pkl (snapshot iter "
          f"{snap_it}, {len(batches_since[snap_it])} batches)")

    # ---- replay the window with per-term decomposition ----
    print("\nper-term gradient decomposition "
          "(radial<0 grows the norm; update dir = -grad):")
    st = jax.device_put(snap_state)
    hdr = ("iter  " + "".join(
        f"|g_{t}| inc_{t} radC0_{t}   " for t in TERMS) + "consw  conv0")
    print(hdr, flush=True)
    replay_batches = batches_since[snap_it]
    end = min(len(replay_batches),
              trigger_iter - snap_it + args.replay_ahead)
    for j in range(end):
        it = snap_it + j
        if it % cfg.num_eval_iter == 0:
            from ust_run_tpu.semisup.state import reset_epoch
            st = reset_epoch(st, it // cfg.num_eval_iter)
        batch = replay_batches[j]
        interesting = it >= trigger_iter - args.window
        if interesting:
            tg = jax.device_get(term_grads(st, data, batch))
            row = f"{it:5d} "
            for t in TERMS:
                d = tg[t]
                rc0 = d["radial"]["Conv_0.kernel"][0]
                row += (f"{float(d['gnorm']):8.3f} "
                        f"{float(d['inc_norm']):8.3f} "
                        f"{float(rc0):+9.2e}  ")
            st2, metrics, probes = step(st, data, batch)
            pv = np.asarray(probes)
            row += f"{float(tg['cons_w']):.3f} {pv[0]:8.4f}"
            print(row, flush=True)
            st = st2
        else:
            st, metrics, probes = step(st, data, batch)
    return 1


if __name__ == "__main__":
    sys.exit(main())
