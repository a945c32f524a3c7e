from ust_run_tpu.utils import ramps, metrics, losses, meters  # noqa: F401
