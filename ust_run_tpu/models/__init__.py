from ust_run_tpu.models.unet import UNet  # noqa: F401
