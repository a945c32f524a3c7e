#!/usr/bin/env python
"""2-process CPU demonstration of the multi-host (DCN) path.

Spawns itself twice with UST_MULTIHOST=1 + coordinator env; each process
initializes `jax.distributed`, contributes 4 virtual CPU devices to a
global 8-device mesh, and runs one data-parallel psum through pjit —
the exact code path a TPU pod slice would take (cli.maybe_init_distributed
-> parallel.make_mesh -> sharded step). Exits 0 on success.

Usage: python tools/multihost_cpu_demo.py
"""

import os
import re
import subprocess
import sys


def worker():
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ust_run_tpu.cli import maybe_init_distributed

    jax.config.update("jax_platforms", "cpu")
    assert maybe_init_distributed()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ust_run_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(spatial=1)       # all global devices
    assert jax.device_count() == 8, jax.device_count()
    bsh = NamedSharding(mesh, P("data"))

    @jax.jit
    def f(x):
        return jnp.sum(x * 2.0)

    local = (jnp.arange(4, dtype=jnp.float32).reshape(4, 1)
             + 4 * jax.process_index())
    x = jax.make_array_from_process_local_data(bsh, local, (8, 1))
    out = float(f(x))
    assert out == 2.0 * sum(range(8)), out
    print(f"process {jax.process_index()}: global psum ok ({out})")


def main():
    port = 12733
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
                + " --xla_force_host_platform_device_count=4").strip(),
            "UST_MULTIHOST_WORKER": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env))
    rcs = [p.wait(timeout=300) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker failures: {rcs}")
    print("multihost_cpu_demo: 2 processes x 4 devices OK")


if __name__ == "__main__":
    if os.environ.get("UST_MULTIHOST_WORKER"):
        worker()
    else:
        main()
