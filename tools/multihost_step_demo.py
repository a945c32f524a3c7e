#!/usr/bin/env python
"""2-process CPU run of the REAL fused SSL train step over a global mesh.

Extends multihost_cpu_demo (psum smoke) to the production code path: two
processes each contribute UST_MH_DEVS virtual CPU devices (default 4);
the full `semisup.step` executable runs once over the global `data` mesh with
replicated state/corpus built via `jax.make_array_from_callback` (the
multi-host equivalent of device_put). Both processes must report the
same finite loss — proving the single-controller step works across
process boundaries (DCN) unchanged, as SURVEY §5/§7.5 claims.

Usage: python tools/multihost_step_demo.py   (exits 0 on success)
"""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker():
    import jax
    sys.path.insert(0, ROOT)
    jax.config.update("jax_platforms", "cpu")
    from ust_run_tpu.cli import maybe_init_distributed
    assert maybe_init_distributed()
    import numpy as np

    from ust_run_tpu.models import UNet
    from ust_run_tpu.parallel import replicated_sharding
    from ust_run_tpu.parallel.mesh import make_mesh
    from ust_run_tpu.semisup import (HyperParams, create_train_state,
                                     make_train_step)

    devs = int(os.environ.get("UST_MH_DEVS", "4"))  # per process
    assert jax.device_count() == 2 * devs, jax.device_count()
    mesh = make_mesh(2 * devs, spatial=1)
    repl = replicated_sharding(mesh)

    hp = HyperParams(
        dataset="prostate", patch=16, channels=1, num_classes=2,
        multilabel=False, n_part=1, label_bs=8, unlabel_bs=8,
        queue_len=4, domain_num=2, threshold=0.95, cutmix_prob=1.0,
        LB=0.01, increase=1.0005, consistency=1.0,
        consistency_rampup=200.0, max_iterations=100, ema_decay=0.99,
        base_lr=0.03, min_v=0.1, max_v=2.0, fillcolor=255, blur_radius=1)
    model = UNet(n_channels=1, n_classes=2)
    state = create_train_state(model, hp, seed=0)

    def replicate(tree):
        """Per-process full values -> global replicated jax.Arrays."""
        def put(x):
            x = np.asarray(x)
            if x.ndim == 0:
                x = x[None]

                def cb(idx):
                    return x[idx]
                return jax.make_array_from_callback(
                    (1,), repl, cb).reshape(())
            return jax.make_array_from_callback(
                x.shape, repl, lambda idx: x[idx])
        return jax.tree.map(put, tree)

    # identical seeds on both processes => identical replicated values
    state = replicate(state)
    rng = np.random.RandomState(0)
    n = 16
    data = replicate({
        "lb_img": rng.randint(0, 256, (n, 16, 16, 1)).astype(np.uint8),
        "lb_lab": rng.choice([0, 255], (n, 16, 16, 1)).astype(np.uint8),
        "ulb_img": rng.randint(0, 256, (n, 16, 16, 1)).astype(np.uint8),
        "ulb_lab": rng.choice([0, 255], (n, 16, 16, 1)).astype(np.uint8),
        "ulb_dc": np.ones(n, np.int32),
    })
    idx = replicate({
        "lb_idx": rng.randint(0, n, 8).astype(np.int32),
        "ulb_idx": rng.randint(0, n, 8).astype(np.int32),
    })

    step = make_train_step(model, hp, mesh=mesh, repl_sharding=repl)

    # Align the processes before the first collective executes: Gloo's
    # context init runs under a hardcoded 30 s rendezvous deadline that
    # starts when the FIRST process arrives, and on a loaded single-core
    # host the state-replication/compile skew between workers can exceed
    # it. The coordination-service barrier (plain TCP to the coordinator,
    # no Gloo involved) collapses that skew to milliseconds.
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("pre_step", 600_000)

    new_state, metrics = step(state, data, idx)
    # metrics is replicated: read the local shard, then allgather the
    # host scalar across processes to assert bitwise agreement
    loss = float(np.asarray(metrics.addressable_data(0))[0])
    from jax.experimental import multihost_utils
    losses = np.asarray(multihost_utils.process_allgather(
        np.asarray([loss], np.float32))).ravel()
    assert np.isfinite(loss), loss
    assert np.allclose(losses, losses[0]), losses
    print(f"process {jax.process_index()}: fused step over "
          f"{jax.process_count()}x{jax.local_device_count()} devices, "
          f"loss={loss:.4f} OK", flush=True)


def main():
    port = int(os.environ.get('UST_MH_PORT', 12791))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "UST_MULTIHOST": "1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            # strip any inherited device-count flag (e.g. from the
            # test conftest) before pinning 4 per process
            "XLA_FLAGS": (re.sub(
                r"--xla_force_host_platform_device_count=\d+", "",
                env.get("XLA_FLAGS", ""))
                + " --xla_force_host_platform_device_count="
                + os.environ.get("UST_MH_DEVS", "4")).strip(),
            "JAX_COMPILATION_CACHE_DIR": os.path.expanduser(
                "~/.cache/jax_comp"),
            "UST_MULTIHOST_STEP_WORKER": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env))
    rcs = [p.wait(timeout=1800) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker failures: {rcs}")
    print("multihost_step_demo: fused step across 2 processes OK")


if __name__ == "__main__":
    if os.environ.get("UST_MULTIHOST_STEP_WORKER"):
        worker()
    else:
        main()
