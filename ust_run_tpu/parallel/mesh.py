"""Device mesh + sharding layout.

The reference is single-process single-GPU (train.py:973 picks a device
via CUDA_VISIBLE_DEVICES; the NCCL helper at utils/util.py:242-247 is dead
code). The TPU-native scaling story is a `jax.sharding.Mesh`:

  * axis "data": batches are sharded on their leading axis; parameters,
    EMA weights, optimizer and curriculum state are replicated. XLA emits
    the gradient all-reduce (and the gathers the replicated curriculum
    update needs) over ICI automatically.
  * axis "space" (optional): spatial model parallelism for very large
    images — activations inside the U-Net are additionally sharded over H,
    and XLA's spatial partitioner inserts halo exchanges for the convs.

Grouped BatchNorm statistics are means over the (sharded) batch axis, so
under data parallelism they become cross-replica (sync-BN) automatically —
the multi-chip generalization of the reference's single-device semantics.

Multi-host (DCN) needs only `jax.distributed.initialize()` before mesh
construction; nothing else changes.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, spatial: int = 1) -> Mesh:
    devs = jax.devices()
    n = len(devs) if num_devices is None else num_devices
    if n <= 0:
        raise ValueError(f"num_devices must be positive, got {n}")
    if n > len(devs):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} device(s) "
            f"are visible ({[str(d) for d in devs[:4]]}...). Lower "
            "--num_devices or launch with more chips.")
    if spatial <= 0 or n % spatial != 0:
        raise ValueError(
            f"spatial axis size {spatial} must be a positive divisor of "
            f"the mesh size {n}")
    arr = np.asarray(devs[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "space"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for host batches."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return {k: (jax.device_put(v, sh) if hasattr(v, "shape") else v)
            for k, v in batch.items()}


def spatial_constraint(mesh: Optional[Mesh]):
    """Returns a function that constrains (B,H,W,C) activations to
    P('data','space') when a spatial axis exists, else identity."""
    if mesh is None or mesh.shape.get("space", 1) == 1:
        return lambda x: x
    sh = NamedSharding(mesh, P("data", "space"))
    return lambda x: jax.lax.with_sharding_constraint(x, sh)
