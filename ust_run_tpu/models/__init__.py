from ust_run_tpu.models.deeplab import DeepLabV2  # noqa: F401
from ust_run_tpu.models.dsbn import DomainSpecificBatchNorm2d  # noqa: F401
from ust_run_tpu.models.unet import UNet  # noqa: F401
from ust_run_tpu.models.unet2d import (Decoder, Discriminator, Encoder,  # noqa: F401
                                       RecDecoder, Unet2D, Unet2D_DS,
                                       Unet2D_MS, Unet2D_MT)
from ust_run_tpu.models.wrn import WideResNet, build_WideResNet  # noqa: F401
