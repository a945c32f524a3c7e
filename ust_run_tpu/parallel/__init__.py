from ust_run_tpu.parallel.mesh import (batch_sharding, make_mesh,  # noqa: F401
                                       replicated_sharding, shard_batch)
