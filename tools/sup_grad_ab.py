#!/usr/bin/env python
"""A/B the SUPERVISED training path against the reference's torch stack.

Why: the 30k-schedule instability (see tools/event_hunt.py) is driven by
the sup term while the consistency weight is still ~0.007, so the
divergent system reduces to: UNet + train-mode BN + (BCE.mean + masked
dice) + SGD(0.03, 0.9, wd 1e-4, poly-30k) on augmented labeled batches.
This tool runs that closed system twice from the SAME init on the SAME
recorded batches:

  phase jax:   our Flax UNet + optax chain, recording every batch
               (our on-device aug stream), per-step stats, and the first
               K full gradients of the inc block;
  phase torch: the reference's networks/unet_model.UNet +
               utils.losses.DiceLossWithMask + torch.optim.SGD on the
               recorded batches (init transferred bit-exactly).

If per-step grads match and BOTH trajectories grow -> the instability is
intrinsic to the system (data stream included); if torch stays flat on
our batches -> our math differs somewhere (the step-0..K grad diff
localizes it).

Usage:
  python tools/sup_grad_ab.py jax   --out /tmp/supab --steps 400
  python tools/sup_grad_ab.py torch --out /tmp/supab --steps 400
  python tools/sup_grad_ab.py compare --out /tmp/supab
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K_GRADS = 8          # steps whose inc grads are compared exactly
SEED = 1337
BASE_LR, MAX_ITER = 0.03, 30000


def phase_jax(out, steps, data_root, key_seed=SEED + 777):
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    from ust_run_tpu.config import TrainConfig
    from ust_run_tpu.data.datasets import SegmentationDataset
    from ust_run_tpu.data.pipeline import BatchPipeline
    from ust_run_tpu.models import UNet
    from ust_run_tpu.ops import augment
    from ust_run_tpu.semisup.state import make_optimizer
    from ust_run_tpu.semisup.step import decode_mask
    from ust_run_tpu.utils import losses as L
    from ust_run_tpu.utils.torch_import import unet_from_torch_state_dict

    os.makedirs(out, exist_ok=True)
    cfg = TrainConfig(dataset="fundus", lb_domain=1, lb_num=8,
                      save_name="supab", data_root=data_root)
    p = cfg.profile()
    ds = SegmentationDataset("fundus", p, data_root, "train", 1, [1],
                             list(range(8)))
    pipe = BatchPipeline(ds, 4, seed=SEED)
    imgs = jax.device_put(ds.images)
    labs = jax.device_put(ds.labels)

    # torch-side init, converted through the tested import path
    sys.path.insert(0, "/root/reference")
    torch.manual_seed(0)
    from networks.unet_model import UNet as TorchUNet
    tmodel = TorchUNet(n_channels=3, n_classes=2)
    torch.save(tmodel.state_dict(), os.path.join(out, "init.pth"))
    variables = unet_from_torch_state_dict(tmodel.state_dict())

    model = UNet(n_channels=3, n_classes=2, dtype=None)   # f32
    tx = make_optimizer(BASE_LR, MAX_ITER)
    params, bstats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    def aug_batch(key, idx):
        img255, lab = augment.weak_augment_batch(
            key, imgs[idx], labs[idx], p.patch_size, p.fillcolor)
        return augment.normalize(img255), decode_mask(lab, "fundus")

    def sup_loss_fn(params, bstats, x, m):
        logits, upd = model.apply(
            {"params": params, "batch_stats": bstats}, x, train=True,
            groups=1, mutable=["batch_stats"])
        loss = L.ce_plus_dice(logits, m, multilabel=True, n_classes=2)
        return loss, upd["batch_stats"]

    @jax.jit
    def train_step(params, bstats, opt_state, x, m):
        (loss, new_bs), g = jax.value_and_grad(
            sup_loss_fn, has_aux=True)(params, bstats, x, m)
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gnorm = jnp.sqrt(sum(jnp.sum(v.astype(jnp.float32) ** 2)
                             for v in jax.tree.leaves(g)))
        k0 = new_params["inc"]["Conv_0"]["kernel"]
        probes = jnp.stack([
            gnorm, jnp.max(jnp.abs(k0)), jnp.linalg.norm(k0),
            jnp.max(jnp.stack([jnp.max(jnp.abs(v)) for v in
                               jax.tree.leaves(new_params["inc"])])),
        ])
        return new_params, new_bs, new_opt, loss, probes, g["inc"]

    aug_jit = jax.jit(aug_batch)
    key = jax.random.PRNGKey(key_seed)
    rows, xs, ms = [], [], []
    for t in range(steps):
        key, k = jax.random.split(key)
        idx = jnp.asarray(pipe.next_indices().astype(np.int32))
        x, m = aug_jit(k, idx)
        params, bstats, opt_state, loss, probes, g_inc = train_step(
            params, bstats, opt_state, x, m)
        xs.append(np.asarray(x, np.float16))
        ms.append(np.asarray(m, np.uint8))
        pv = np.asarray(probes)
        row = dict(step=t, loss=float(loss), gnorm=float(pv[0]),
                   conv0_max=float(pv[1]), conv0_l2=float(pv[2]),
                   inc_max=float(pv[3]))
        rows.append(row)
        if t < K_GRADS:
            np.savez(os.path.join(out, f"jax_grad_{t}.npz"),
                     **{f"{m_}_{l}": np.asarray(g_inc[m_][l])
                        for m_ in g_inc for l in g_inc[m_]})
        if t % 25 == 0:
            print(f"jax t={t} loss={row['loss']:.4f} "
                  f"conv0={row['conv0_max']:.4f} inc={row['inc_max']:.4f}",
                  flush=True)
    np.savez_compressed(os.path.join(out, "batches.npz"),
                        x=np.stack(xs), m=np.stack(ms))
    with open(os.path.join(out, "jax_rows.json"), "w") as f:
        json.dump(rows, f)
    print("jax phase done ->", out)


def phase_torch(out, steps):
    import torch
    sys.path.insert(0, "/root/reference")
    from networks.unet_model import UNet as TorchUNet
    from utils.losses import DiceLossWithMask

    d = np.load(os.path.join(out, "batches.npz"))
    xs, ms = d["x"], d["m"]
    steps = min(steps, xs.shape[0])
    model = TorchUNet(n_channels=3, n_classes=2)
    model.load_state_dict(torch.load(os.path.join(out, "init.pth"),
                                     weights_only=True))
    model.train()
    opt = torch.optim.SGD(model.parameters(), lr=BASE_LR, momentum=0.9,
                          weight_decay=1e-4)
    ce = torch.nn.BCEWithLogitsLoss(reduction="none")
    dice = DiceLossWithMask(2)
    rows = []
    for t in range(steps):
        x = torch.tensor(xs[t], dtype=torch.float32).permute(0, 3, 1, 2)
        m = torch.tensor(ms[t], dtype=torch.float32).permute(0, 3, 1, 2)
        opt.zero_grad()
        logits = model(x)
        loss = ce(logits, m).mean() + dice(logits, m.unsqueeze(1),
                                           softmax=False, sigmoid=True,
                                           multi=True)
        loss.backward()
        if t < K_GRADS:
            gz = {}
            name_map = {"Conv_0_kernel": "inc.double_conv.0.weight",
                  "GroupedBatchNorm_0_scale": "inc.double_conv.1.weight",
                  "GroupedBatchNorm_0_bias": "inc.double_conv.1.bias",
                  "Conv_1_kernel": "inc.double_conv.3.weight",
                  "GroupedBatchNorm_1_scale": "inc.double_conv.4.weight",
                  "GroupedBatchNorm_1_bias": "inc.double_conv.4.bias"}
            sd = {k: v.grad for k, v in model.named_parameters()}
            for ours, theirs in name_map.items():
                g = sd[theirs].detach().numpy()
                if g.ndim == 4:
                    g = g.transpose(2, 3, 1, 0)   # OIHW -> HWIO
                gz[ours] = g
            np.savez(os.path.join(out, f"torch_grad_{t}.npz"), **gz)
        opt.step()
        # reference poly LR, applied after the step (train.py:854-856)
        it = t + 1
        for gparam in opt.param_groups:
            gparam["lr"] = BASE_LR * (1 - it / MAX_ITER) ** 0.9
        k0 = model.inc.double_conv[0].weight.detach()
        incmax = max(float(v.detach().abs().max())
                     for n, v in model.named_parameters()
                     if n.startswith("inc."))
        gn = float(torch.sqrt(sum((p.grad.double() ** 2).sum()
                                  for p in model.parameters())))
        rows.append(dict(step=t, loss=float(loss), gnorm=gn,
                         conv0_max=float(k0.abs().max()),
                         conv0_l2=float(k0.norm()), inc_max=incmax))
        if t % 25 == 0:
            print(f"torch t={t} loss={rows[-1]['loss']:.4f} "
                  f"conv0={rows[-1]['conv0_max']:.4f} "
                  f"inc={rows[-1]['inc_max']:.4f}", flush=True)
    with open(os.path.join(out, "torch_rows.json"), "w") as f:
        json.dump(rows, f)
    print("torch phase done")


def compare(out):
    with open(os.path.join(out, "jax_rows.json")) as f:
        ja = json.load(f)
    with open(os.path.join(out, "torch_rows.json")) as f:
        to = json.load(f)
    print("step |   loss (jax/torch)   |  gnorm (jax/torch)  | "
          "conv0max (jax/torch) | incmax (jax/torch)")
    n = min(len(ja), len(to))
    idxs = sorted(set(list(range(0, n, max(1, n // 20))) + [n - 1]))
    for i in idxs:
        a, b = ja[i], to[i]
        print(f"{i:4d} | {a['loss']:8.4f} {b['loss']:8.4f} | "
              f"{a['gnorm']:8.3f} {b['gnorm']:8.3f} | "
              f"{a['conv0_max']:8.4f} {b['conv0_max']:8.4f} | "
              f"{a['inc_max']:9.4f} {b['inc_max']:9.4f}")
    print("\nfirst-step gradient agreement (inc leaves):")
    for t in range(K_GRADS):
        fa = os.path.join(out, f"jax_grad_{t}.npz")
        fb = os.path.join(out, f"torch_grad_{t}.npz")
        if not (os.path.exists(fa) and os.path.exists(fb)):
            break
        A, B = np.load(fa), np.load(fb)
        descr = []
        for kk in A.files:
            a, b = A[kk].astype(np.float64), B[kk].astype(np.float64)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            descr.append(f"{kk}:{rel:.2e}")
        print(f"  t={t}: " + " ".join(descr))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["jax", "torch", "compare"])
    ap.add_argument("--out", default="/tmp/supab")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--data_root", default="/tmp/data/Fundus")
    ap.add_argument("--key-seed", type=int, default=SEED + 777)
    a = ap.parse_args()
    if a.phase == "jax":
        phase_jax(a.out, a.steps, a.data_root, a.key_seed)
    elif a.phase == "torch":
        phase_torch(a.out, a.steps)
    else:
        compare(a.out)


if __name__ == "__main__":
    main()
