#!/usr/bin/env python
"""Training entry point (fundus / prostate / BUSI).

CLI-compatible with the reference train.py:38-79; runs the TPU-native
rebuild: fused jitted SSL step over a jax.sharding.Mesh.
"""

from ust_run_tpu.cli import bootstrap
from ust_run_tpu.config import build_parser
from ust_run_tpu.engine.trainer import Trainer


def main():
    args = build_parser().parse_args()
    cfg, snapshot_path = bootstrap(args, __file__)
    trainer = Trainer(cfg, snapshot_path)
    if cfg.eval:
        trainer._evaluate_and_checkpoint(-1, 0, list(cfg.profile().parts),
                                         save=False)
        return
    trainer.train()


if __name__ == "__main__":
    main()
