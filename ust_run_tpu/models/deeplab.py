"""DeepLabV2 head on the dilated ResNet backbone
(reference networks/deeplabv2.py:9-33 + networks/backbone/base.py:8-45).

Head = four parallel dilated 3x3 convs (rates 6/12/18/24) summed, then
bilinear upsample to input size. `tta=True` reproduces BaseNet's
multi-scale + horizontal-flip test-time augmentation (base.py:23-45).

The reference upsamples with `F.interpolate(..., align_corners=True)`
(deeplabv2.py:30, base.py:18,34-43) whose sampling grid differs from
jax.image.resize (half-pixel centers): align_corners maps output pixel i
to input position i*(H1-1)/(H2-1). `resize_align_corners` reproduces it
exactly as two interpolation-matrix matmuls (MXU-friendly: a dense
(H2,H1) by (B,H1,W,C) contraction instead of gathers).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ust_run_tpu.models import resnet as resnet_lib


def _interp_matrix(n_out, n_in):
    """(n_out, n_in) align-corners linear interpolation weights."""
    if n_out == 1 or n_in == 1:
        m = np.zeros((n_out, n_in), np.float32)
        m[:, 0] = 1.0
        return m
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] = 1.0 - frac
    m[np.arange(n_out), lo + 1] = frac
    return m


def resize_align_corners(x, h2, w2):
    """NHWC bilinear resize with torch align_corners=True semantics."""
    b, h1, w1, c = x.shape
    if (h1, w1) == (h2, w2):
        return x
    my = jnp.asarray(_interp_matrix(h2, h1), x.dtype)
    mw = jnp.asarray(_interp_matrix(w2, w1), x.dtype)
    x = jnp.einsum("ih,bhwc->biwc", my, x)
    return jnp.einsum("jw,bhwc->bhjc", mw, x)


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

    def base_forward(self, x, *, train: bool, groups: int = 1,
                     group_sizes=None, group_valid=None):
        h, w = x.shape[1:3]
        c4 = self.backbone_net(x, train=train, groups=groups,
                               group_sizes=group_sizes,
                               group_valid=group_valid)[-1]
        out = self.classifier[0](c4)
        for conv in self.classifier[1:]:
            out = out + conv(c4)
        return resize_align_corners(out, h, w)       # deeplabv2.py:30

    def __call__(self, x, *, train: bool = True, tta: bool = False,
                 groups: int = 1, group_sizes=None, group_valid=None):
        if not tta:
            return self.base_forward(x, train=train, groups=groups,
                                     group_sizes=group_sizes,
                                     group_valid=group_valid)
        # multi-scale + hflip TTA (base.py:23-45), align_corners resizes
        h, w = x.shape[1:3]
        result = jnp.zeros((x.shape[0], h, w, self.nclass), jnp.float32)
        for scale in (0.5, 0.75, 1.0, 1.5, 2.0):
            ch, cw = int(h * scale), int(w * scale)
            cx = resize_align_corners(x, ch, cw)
            out = jax.nn.softmax(self.base_forward(cx, train=train), -1)
            result = result + resize_align_corners(out, h, w)
            flipped = cx[:, :, ::-1, :]
            out = jax.nn.softmax(self.base_forward(flipped, train=train),
                                 -1)[:, :, ::-1, :]
            result = result + resize_align_corners(out, h, w)
        return result
