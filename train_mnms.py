#!/usr/bin/env python
"""M&Ms (4-vendor cardiac, 4-class) training entry point.

CLI-compatible with the reference train_mnms.py:38-78; same engine as
train.py with the MNMS dataset profile (288px, 3-part dice).
"""

from ust_run_tpu.cli import bootstrap
from ust_run_tpu.config import build_parser
from ust_run_tpu.engine.trainer import Trainer


def main():
    args = build_parser(mnms=True).parse_args()
    args.dataset = "MNMS"
    cfg, snapshot_path = bootstrap(args, __file__)
    trainer = Trainer(cfg, snapshot_path)
    if cfg.eval:
        trainer._evaluate_and_checkpoint(-1, 0, list(cfg.profile().parts),
                                         save=False)
        return
    trainer.train()


if __name__ == "__main__":
    main()
