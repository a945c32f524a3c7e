"""Shared CLI bootstrap for the train/test entry points.

Reproduces the reference __main__ blocks (train.py:964-999,
test.py:247-269): snapshot directory `<model_root>/<dataset>/<save_name>/`
with an overwrite guard, the entry script copied into the snapshot,
logging to `log.txt` + stdout, and deterministic seeding.
"""

import logging
import os
import random
import shutil
import sys

import numpy as np

from ust_run_tpu.config import TrainConfig, config_from_args


def enable_compilation_cache():
    """Persistent XLA compilation cache — repeat CLI invocations skip the
    (substantial) first-compile cost of the fused train step."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bootstrap(args, script_path, require_fresh=True) -> tuple:
    enable_compilation_cache()
    cfg = config_from_args(args).resolve()
    snapshot_path = os.path.join(cfg.model_root, cfg.dataset,
                                 cfg.save_name) + "/"

    if cfg.deterministic:
        random.seed(cfg.seed)
        np.random.seed(cfg.seed)

    if not os.path.exists(snapshot_path):
        os.makedirs(snapshot_path)
    elif require_fresh and not cfg.overwrite and not cfg.load:
        raise Exception(f"file {snapshot_path} is exist!")
    if os.path.exists(snapshot_path + "/code"):
        shutil.rmtree(snapshot_path + "/code")
    try:
        shutil.copy(script_path,
                    os.path.join(snapshot_path,
                                 os.path.basename(script_path)))
    except (shutil.SameFileError, FileNotFoundError):
        pass

    logging.basicConfig(filename=snapshot_path + "/log.txt",
                        level=logging.INFO,
                        format="[%(asctime)s.%(msecs)03d] %(message)s",
                        datefmt="%H:%M:%S")
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    logging.info(" ".join(["python"] + sys.argv))
    logging.info(str(args))
    return cfg, snapshot_path
