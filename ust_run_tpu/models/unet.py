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

`pack_l1`: run the 64-channel level-1 stage (stem DoubleConv, the
level-1 skip, the last Up, and the out conv) in W-packed layout — two
spatial columns folded into the channel dim so the MXU contracts at its
full 128-lane width (ops/packing.py). Exact (same contractions, banded
weights), parameter-tree-identical (packed modules create the unpacked
parameter and transform it in-trace), measured 1.4-1.6x on the level-1
convs fwd+bwd. Checkpoints are interchangeable between the two layouts.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models.layers import (GroupedBatchNorm, PackedConv3x3,
                                       PackedConvTranspose2x2, PackedOutConv,
                                       PackedStemConv3x3, conv3x3,
                                       max_pool_2x2, packed_pool_entry,
                                       torch_bias_init,
                                       torch_conv_kernel_init,
                                       torch_convT_kernel_init, unpack2)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 (reference unet_parts.py:8-25).

    `packed`: "none" (plain NHWC), "stem" (unpacked input, W-packed
    output), or "packed" (W-packed input and output; `in_splits` gives
    the original channel widths of a packed concat input)."""
    out_ch: int
    mid_ch: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    packed: str = "none"
    in_splits: tuple = None

    @nn.compact
    def __call__(self, x, x_b=None, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        mid = self.mid_ch or self.out_ch
        if x_b is not None:
            # two-piece input (skip, upsampled): first conv computed as
            # summed sliced convs, skipping the concat (see SplitConv3x3)
            from ust_run_tpu.models.layers import SplitConv3x3
            assert self.packed in ("none", "packed")
            splits = self.in_splits or (x.shape[-1], x_b.shape[-1])
            x = SplitConv3x3(mid, splits=splits,
                             packed=self.packed == "packed",
                             dtype=self.dtype, name="Conv_0")(x, x_b)
        elif self.packed == "stem":
            x = PackedStemConv3x3(mid, dtype=self.dtype, name="Conv_0")(x)
        elif self.packed == "packed":
            x = PackedConv3x3(mid, in_splits=self.in_splits,
                              dtype=self.dtype, name="Conv_0")(x)
        else:
            x = conv3x3(mid, dtype=self.dtype, name="Conv_0")(x)
        is_packed = self.packed != "none"
        x = GroupedBatchNorm()(x, train=train, groups=groups,
                               group_sizes=group_sizes,
                               group_valid=group_valid, packed=is_packed)
        x = nn.relu(x)
        if is_packed:
            x = PackedConv3x3(self.out_ch, dtype=self.dtype,
                              name="Conv_1")(x)
        else:
            x = conv3x3(self.out_ch, dtype=self.dtype, name="Conv_1")(x)
        x = GroupedBatchNorm()(x, train=train, groups=groups,
                               group_sizes=group_sizes,
                               group_valid=group_valid, packed=is_packed)
        x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool 2x2 + DoubleConv (reference unet_parts.py:28-39).

    `packed_in`: the incoming tensor is W-packed; the pool consumes it
    and emits the unpacked half-resolution tensor."""
    out_ch: int
    dtype: Optional[jnp.dtype] = None
    packed_in: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        x = packed_pool_entry(x) if self.packed_in else max_pool_2x2(x)
        return DoubleConv(self.out_ch, dtype=self.dtype)(
            x, train=train, groups=groups, group_sizes=group_sizes,
            group_valid=group_valid)


class Up(nn.Module):
    """2x2 stride-2 transpose conv, pad-to-match, skip concat, DoubleConv
    (reference unet_parts.py:42-68). Concat order is [skip, upsampled],
    matching torch.cat([x2, x1], dim=1).

    `packed`: emit the upsample W-packed, take the skip W-packed, and
    run the DoubleConv packed (the level-1 decoder stage). Requires the
    even spatial sizes every dataset profile has (256/288/384), so the
    pad-to-match branch cannot trigger."""
    out_ch: int
    dtype: Optional[jnp.dtype] = None
    packed: bool = False
    split_first: bool = False

    @nn.compact
    def __call__(self, x1, x2, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        in_ch = x1.shape[-1]
        if self.packed:
            skip_c = x2.shape[-1] // 2
            x1 = PackedConvTranspose2x2(in_ch // 2, dtype=self.dtype,
                                        name="ConvTranspose_0")(x1)
            assert x1.shape[1] == x2.shape[1] and x1.shape[2] == x2.shape[2]
            dc = DoubleConv(self.out_ch, dtype=self.dtype, packed="packed",
                            in_splits=(skip_c, in_ch // 2))
            if self.split_first:
                return dc(x2, x1, train=train, groups=groups,
                          group_sizes=group_sizes, group_valid=group_valid)
            x = jnp.concatenate([x2, x1], axis=-1)
            return dc(x, train=train, groups=groups, group_sizes=group_sizes,
                      group_valid=group_valid)
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
        if self.split_first:
            return DoubleConv(self.out_ch, dtype=self.dtype)(
                x2, x1, train=train, groups=groups,
                group_sizes=group_sizes, group_valid=group_valid)
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
    pack_l1: bool = False
    split_up: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True, groups: int = 1,
                 feature: bool = False, group_sizes=None, group_valid=None):
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x
        factor = 2 if self.bilinear else 1
        pk = self.pack_l1 and not self.bilinear and x.shape[2] % 2 == 0
        gkw = dict(train=train, groups=groups, group_sizes=group_sizes,
                   group_valid=group_valid)
        x1 = DoubleConv(64, dtype=dt, packed="stem" if pk else "none",
                        name="inc")(x, **gkw)
        x2 = Down(128, dtype=dt, packed_in=pk, name="down1")(x1, **gkw)
        x3 = Down(256, dtype=dt, name="down2")(x2, **gkw)
        x4 = Down(512, dtype=dt, name="down3")(x3, **gkw)
        x5 = Down(1024 // factor, dtype=dt, name="down4")(x4, **gkw)
        sp = self.split_up
        y = Up(512 // factor, dtype=dt, split_first=sp, name="up1")(
            x5, x4, **gkw)
        y = Up(256 // factor, dtype=dt, split_first=sp, name="up2")(
            y, x3, **gkw)
        y = Up(128 // factor, dtype=dt, split_first=sp, name="up3")(
            y, x2, **gkw)
        y = Up(64, dtype=dt, packed=pk, split_first=sp, name="up4")(
            y, x1, **gkw)
        if pk:
            logits = PackedOutConv(self.n_classes, dtype=dt, name="outc")(y)
        else:
            logits = nn.Conv(
                self.n_classes, (1, 1), use_bias=True,
                kernel_init=torch_conv_kernel_init,
                bias_init=torch_bias_init(64),
                dtype=dt, param_dtype=jnp.float32, name="outc")(y)
        logits = logits.astype(jnp.float32)
        if feature:
            return logits, unpack2(y) if pk else y
        return logits
