from ust_run_tpu.ops import augment, cutmix, fda, resample  # noqa: F401
