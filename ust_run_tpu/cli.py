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


def maybe_init_distributed():
    """Multi-host (DCN) initialization, env-gated (SURVEY sections 5/7.5).

    Single-controller JAX needs one `jax.distributed.initialize()` call
    per process before any backend use; afterwards the same mesh code
    scales over ICI+DCN unchanged. Gated on UST_MULTIHOST=1 so
    single-host runs (the reference's only topology, train.py:973) pay
    nothing. On TPU pods `initialize()` auto-discovers the coordinator;
    elsewhere set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID (+ optionally JAX_LOCAL_DEVICE_IDS).

    Returns True when distributed mode was initialized."""
    if os.environ.get("UST_MULTIHOST", "0") != "1":
        return False
    import jax
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)
    logging.info("jax.distributed initialized: process %d/%d, %d local / "
                 "%d global devices", jax.process_index(),
                 jax.process_count(), jax.local_device_count(),
                 jax.device_count())
    return True


def bootstrap(args, script_path, require_fresh=True) -> tuple:
    maybe_init_distributed()
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
