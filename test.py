#!/usr/bin/env python
"""Standalone evaluation entry point.

CLI-compatible with the reference test.py:19-32 (fundus/prostate/MNMS):
rebuilds the per-domain test loaders, loads
`<model_root>/<dataset>/<save_name>/unet_avg_dice_best_model.pth`
(reference test.py:242 derives the path the same way — the `--load_path`
flag is ignored there too), runs the evaluation pass, and optionally dumps
prediction overlays with --save_img.
"""

import argparse
import logging
import os
import sys

import numpy as np

from ust_run_tpu.config import (DEFAULT_DATA_ROOTS, PROFILES, TrainConfig)
from ust_run_tpu.data.datasets import SegmentationDataset
from ust_run_tpu.data.pipeline import TestLoader
from ust_run_tpu.engine import checkpoint as ckpt
from ust_run_tpu.engine.evaluator import Evaluator
from ust_run_tpu.engine.trainer import build_model
from ust_run_tpu.semisup import HyperParams
from ust_run_tpu.utils import visualize


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="prostate",
                        choices=["fundus", "prostate", "MNMS", "BUSI"])
    parser.add_argument("--save_name", type=str, default="debug")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--model", type=str, default="unet")
    parser.add_argument("--gpu", type=str, default="0")
    parser.add_argument("--eval", type=bool, default=True)
    parser.add_argument("--test_bs", type=int, default=1)
    parser.add_argument("--domain_num", type=int, default=6)
    parser.add_argument("--lb_domain", type=int, default=1)
    parser.add_argument("--save_img", action="store_true")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--model_root", type=str, default="../model")
    parser.add_argument("--eval_batch", type=int, default=8)
    args = parser.parse_args()

    cfg = TrainConfig(dataset=args.dataset, save_name=args.save_name,
                      model=args.model, domain_num=args.domain_num,
                      data_root=args.data_root, model_root=args.model_root,
                      eval_batch=args.eval_batch).resolve()
    profile = cfg.profile()
    snapshot_path = os.path.join(cfg.model_root, cfg.dataset,
                                 cfg.save_name) + "/"
    os.makedirs(snapshot_path, exist_ok=True)
    logging.basicConfig(filename=snapshot_path + "/test_log.txt",
                        level=logging.INFO,
                        format="[%(asctime)s.%(msecs)03d] %(message)s",
                        datefmt="%H:%M:%S")
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    logging.info(" ".join(["python"] + sys.argv))

    test_loaders = []
    test_datasets = []
    for i in range(1, cfg.domain_num + 1):
        ds = SegmentationDataset(cfg.dataset, profile, cfg.data_root,
                                 "test", -1, [i])
        test_datasets.append(ds)
        test_loaders.append(TestLoader(ds, cfg.eval_batch))

    hp = HyperParams.from_config(cfg)
    model = build_model(cfg)
    best_path = os.path.join(snapshot_path,
                             f"{cfg.model}_avg_dice_best_model.pth")
    payload = ckpt.load_best_model(best_path, model=cfg.model)
    params, batch_stats = payload["params"], payload["batch_stats"]

    import jax
    mesh = None
    if len(jax.devices()) > 1:
        from ust_run_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.num_devices)
    evaluator = Evaluator(model, hp, test_loaders, list(profile.parts),
                          mesh=mesh)
    evaluator.run(params, batch_stats, 1, writer=None, ema=True)

    if args.save_img:
        out_dir = os.path.join(snapshot_path, "pred_images")
        for ds, loader in zip(test_datasets, test_loaders):
            for batch in loader:
                dice, loss, pred_parts, mask_parts = evaluator._fwd(
                    params, batch_stats, batch["image"], batch["label"])
                pp = np.asarray(pred_parts)
                mp = np.asarray(mask_parts)
                for j, name in enumerate(batch["names"]):
                    visualize.draw_mask_and_save(
                        batch["image"][j], pp[j], mp[j], out_dir, name)
        logging.info("saved overlays to %s", out_dir)


if __name__ == "__main__":
    main()
