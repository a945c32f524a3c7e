"""The primary U-Net (the model actually trained by every reference entry
point; reference networks/unet_model.py:6-38 + networks/unet_parts.py).

Architecture: classic 5-level U-Net, widths 64->1024, DoubleConv =
(3x3 conv no-bias -> BN -> ReLU) x2, down = 2x2 maxpool + DoubleConv,
up = 2x2 stride-2 transpose conv + skip concat + DoubleConv, 1x1 out conv.
~31M params for (3 ch, 2 cls). NHWC layout, bf16-capable compute with
fp32 params and fp32 BN statistics.

The `groups` argument threads through to `GroupedBatchNorm` so several
logical forward passes can share one physical batched call (see
models/layers.py docstring).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models.layers import (GroupedBatchNorm, conv3x3,
                                       max_pool_2x2, torch_bias_init,
                                       torch_conv_kernel_init,
                                       torch_convT_kernel_init)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 (reference unet_parts.py:8-25)."""
    out_ch: int
    mid_ch: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        mid = self.mid_ch or self.out_ch
        x = conv3x3(mid, dtype=self.dtype)(x)
        x = GroupedBatchNorm()(x, train=train, groups=groups,
                               group_sizes=group_sizes, group_valid=group_valid)
        x = nn.relu(x)
        x = conv3x3(self.out_ch, dtype=self.dtype)(x)
        x = GroupedBatchNorm()(x, train=train, groups=groups,
                               group_sizes=group_sizes, group_valid=group_valid)
        x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool 2x2 + DoubleConv (reference unet_parts.py:28-39)."""
    out_ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        x = max_pool_2x2(x)
        return DoubleConv(self.out_ch, dtype=self.dtype)(
            x, train=train, groups=groups, group_sizes=group_sizes,
            group_valid=group_valid)


class Up(nn.Module):
    """2x2 stride-2 transpose conv, pad-to-match, skip concat, DoubleConv
    (reference unet_parts.py:42-68). Concat order is [skip, upsampled],
    matching torch.cat([x2, x1], dim=1)."""
    out_ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        in_ch = x1.shape[-1]
        x1 = nn.ConvTranspose(
            in_ch // 2, (2, 2), strides=(2, 2), padding="VALID",
            kernel_init=torch_convT_kernel_init,
            bias_init=torch_bias_init(in_ch),
            dtype=self.dtype, param_dtype=jnp.float32)(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, dtype=self.dtype)(
            x, train=train, groups=groups, group_sizes=group_sizes,
            group_valid=group_valid)


class UNet(nn.Module):
    """Reference networks/unet_model.py:6-38 with bilinear=False."""
    n_channels: int
    n_classes: int
    bilinear: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, groups: int = 1,
                 feature: bool = False, group_sizes=None, group_valid=None):
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x
        factor = 2 if self.bilinear else 1
        gkw = dict(train=train, groups=groups, group_sizes=group_sizes,
                   group_valid=group_valid)
        x1 = DoubleConv(64, dtype=dt, name="inc")(x, **gkw)
        x2 = Down(128, dtype=dt, name="down1")(x1, **gkw)
        x3 = Down(256, dtype=dt, name="down2")(x2, **gkw)
        x4 = Down(512, dtype=dt, name="down3")(x3, **gkw)
        x5 = Down(1024 // factor, dtype=dt, name="down4")(x4, **gkw)
        y = Up(512 // factor, dtype=dt, name="up1")(x5, x4, **gkw)
        y = Up(256 // factor, dtype=dt, name="up2")(y, x3, **gkw)
        y = Up(128 // factor, dtype=dt, name="up3")(y, x2, **gkw)
        y = Up(64, dtype=dt, name="up4")(y, x1, **gkw)
        logits = nn.Conv(
            self.n_classes, (1, 1), use_bias=True,
            kernel_init=torch_conv_kernel_init, bias_init=torch_bias_init(64),
            dtype=dt, param_dtype=jnp.float32, name="outc")(y)
        logits = logits.astype(jnp.float32)
        if feature:
            return logits, y
        return logits
