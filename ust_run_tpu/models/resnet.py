"""Dilated ResNet backbone (reference networks/backbone/resnet.py).

resnet50/101 with the last two stages converted to dilation (output
stride 8), as used by the DeepLabV2 head. NHWC, GroupedBatchNorm,
kaiming_normal(fan_out) conv init. The reference loads ImageNet weights
from a local .pth (resnet.py:185-190); the same torch checkpoint is
imported at train time by `Trainer._load_pretrained_backbone`
(engine/trainer.py), which mirrors the reference's layer layout — the
`pretrained` flag here only records the request on the module.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models.layers import GroupedBatchNorm
from ust_run_tpu.models.unet2d import kaiming_normal_out


def _conv(features, ksize, stride=1, dilation=1, name=None):
    pad = dilation * (ksize // 2)
    return nn.Conv(features, (ksize, ksize), strides=(stride, stride),
                   padding=pad, use_bias=False,
                   kernel_dilation=(dilation, dilation),
                   kernel_init=kaiming_normal_out, param_dtype=jnp.float32,
                   name=name)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
        gkw = dict(train=train, groups=groups, group_sizes=group_sizes,
                   group_valid=group_valid)
        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = nn.relu(GroupedBatchNorm(name="bn1")(out, **gkw))
        out = _conv(self.planes, 3, self.stride, self.dilation,
                    name="conv2")(out)
        out = nn.relu(GroupedBatchNorm(name="bn2")(out, **gkw))
        out = _conv(self.planes * self.expansion, 1, name="conv3")(out)
        out = GroupedBatchNorm(name="bn3")(out, **gkw)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             name="ds_conv")(x)
            identity = GroupedBatchNorm(name="ds_bn")(identity, **gkw)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    layers: Sequence[int]
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)

    @nn.compact
    def __call__(self, x, *, train: bool = True, groups: int = 1,
                 group_sizes=None, group_valid=None):
        gkw = dict(train=train, groups=groups, group_sizes=group_sizes,
                   group_valid=group_valid)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=kaiming_normal_out,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(GroupedBatchNorm(name="bn1")(x, **gkw))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        inflate = [False] + list(self.replace_stride_with_dilation)
        dilation = 1
        planes = [64, 128, 256, 512]
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            stride = 1 if stage == 0 else 2
            prev_dilation = dilation
            if inflate[stage]:
                dilation *= stride
                stride = 1
            x = Bottleneck(p, stride, prev_dilation, downsample=True,
                           name=f"layer{stage + 1}_0")(x, **gkw)
            for i in range(1, n):
                x = Bottleneck(p, 1, dilation,
                               name=f"layer{stage + 1}_{i}")(x, **gkw)
            feats.append(x)
        return feats  # c1..c4 (resnet.py:173-183)


def resnet50(pretrained=False):
    # Flax modules are weight-free; ImageNet weights are overlaid onto
    # the initialized variables by Trainer._load_pretrained_backbone /
    # utils.torch_import.overlay_pretrained_backbone (matching the
    # reference's load at resnet.py:185-190).
    del pretrained
    return ResNet(layers=(3, 4, 6, 3))


def resnet101(pretrained=False):
    del pretrained
    return ResNet(layers=(3, 4, 23, 3))
