"""DeepLabV2 head on the dilated ResNet backbone
(reference networks/deeplabv2.py:9-33 + networks/backbone/base.py:8-45).

Head = four parallel dilated 3x3 convs (rates 6/12/18/24) summed, then
bilinear upsample to input size. `tta=True` reproduces BaseNet's
multi-scale + horizontal-flip test-time augmentation (base.py:23-45).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models import resnet as resnet_lib


def _head_init(key, shape, dtype=jnp.float32):
    # classifier weights ~ N(0, 0.01) (deeplabv2.py:18-19)
    return jax.random.normal(key, shape, dtype) * 0.01


class DeepLabV2(nn.Module):
    backbone: str = "resnet101"
    nclass: int = 2

    def setup(self):
        zoo = {"resnet50": resnet_lib.resnet50,
               "resnet101": resnet_lib.resnet101}
        self.backbone_net = zoo[self.backbone](pretrained=True)
        self.classifier = [
            nn.Conv(self.nclass, (3, 3), padding=d, kernel_dilation=(d, d),
                    use_bias=True, kernel_init=_head_init,
                    param_dtype=jnp.float32, name=f"aspp_{d}")
            for d in (6, 12, 18, 24)]

    def base_forward(self, x, *, train: bool):
        h, w = x.shape[1:3]
        c4 = self.backbone_net(x, train=train)[-1]
        out = self.classifier[0](c4)
        for conv in self.classifier[1:]:
            out = out + conv(c4)
        return jax.image.resize(out, (x.shape[0], h, w, self.nclass),
                                "bilinear")

    def __call__(self, x, *, train: bool = True, tta: bool = False):
        if not tta:
            return self.base_forward(x, train=train)
        h, w = x.shape[1:3]
        result = jnp.zeros((x.shape[0], h, w, self.nclass), jnp.float32)
        for scale in (0.5, 0.75, 1.0, 1.5, 2.0):
            ch, cw = int(h * scale), int(w * scale)
            cx = jax.image.resize(x, (x.shape[0], ch, cw, x.shape[-1]),
                                  "bilinear")
            out = jax.nn.softmax(self.base_forward(cx, train=train), -1)
            result = result + jax.image.resize(
                out, (x.shape[0], h, w, self.nclass), "bilinear")
            flipped = cx[:, :, ::-1, :]
            out = jax.nn.softmax(self.base_forward(flipped, train=train),
                                 -1)[:, :, ::-1, :]
            result = result + jax.image.resize(
                out, (x.shape[0], h, w, self.nclass), "bilinear")
        return result
