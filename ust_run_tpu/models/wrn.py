"""WideResNet classifier (reference networks/wrn.py:8-119).

Imported-but-unused by the reference SSL flow (train.py:26); part of the
model zoo for the backbone-swap configurations. Pre-activation residual
blocks, leaky-ReLU, global average pool + linear head. NHWC.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models.layers import GroupedBatchNorm, torch_bias_init


def _msra_conv_init(key, shape, dtype=jnp.float32):
    """weight ~ N(0, sqrt(2/(k*k*out_ch))) (wrn.py:82-84 computes fan on
    OUT channels)."""
    import jax
    fan = shape[0] * shape[1] * shape[3]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan)


def _conv(features, ksize, stride, name):
    return nn.Conv(features, (ksize, ksize), strides=(stride, stride),
                   padding=ksize // 2, use_bias=False,
                   kernel_init=_msra_conv_init, param_dtype=jnp.float32,
                   name=name)


class BasicBlock(nn.Module):
    out_planes: int
    stride: int
    bn_momentum: float = 0.1
    leaky_slope: float = 0.0
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool, deterministic: bool = True):
        in_planes = x.shape[-1]
        equal = in_planes == self.out_planes

        def act(t):
            return nn.leaky_relu(t, self.leaky_slope)

        pre = act(GroupedBatchNorm(momentum=self.bn_momentum, name="bn1")(
            x, train=train))
        if not equal:
            x = pre
        out = pre if equal else x
        out = _conv(self.out_planes, 3, self.stride, "conv1")(out)
        out = act(GroupedBatchNorm(momentum=self.bn_momentum, name="bn2")(
            out, train=train))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate)(
                out, deterministic=deterministic or not train)
        out = _conv(self.out_planes, 3, 1, "conv2")(out)
        if not equal:
            short = _conv(self.out_planes, 1, self.stride, "convShortcut")(x)
            return short + out
        return x + out


class WideResNet(nn.Module):
    in_channel: int
    depth: int
    num_classes: int
    widen_factor: int = 1
    bn_momentum: float = 0.1
    leaky_slope: float = 0.0
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True, ood_test: bool = False):
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen_factor, 32 * self.widen_factor,
                  64 * self.widen_factor]
        out = _conv(widths[0], 3, 1, "conv1")(x)
        for b, (w, stride) in enumerate(zip(widths[1:], (1, 2, 2))):
            for i in range(n):
                out = BasicBlock(w, stride if i == 0 else 1,
                                 self.bn_momentum, self.leaky_slope,
                                 self.drop_rate,
                                 name=f"block{b + 1}_{i}")(out, train=train)
        out = nn.leaky_relu(
            GroupedBatchNorm(momentum=self.bn_momentum, name="bn1")(
                out, train=train), self.leaky_slope)
        feat = jnp.mean(out, axis=(1, 2))
        logits = nn.Dense(self.num_classes,
                          bias_init=nn.initializers.zeros,
                          param_dtype=jnp.float32, name="fc")(feat)
        if ood_test:
            return logits, feat
        return logits


class build_WideResNet:
    """Builder matching wrn.py:107-119."""

    def __init__(self, depth=28, widen_factor=2, bn_momentum=0.01,
                 leaky_slope=0.0, dropRate=0.0):
        self.depth = depth
        self.widen_factor = widen_factor
        self.bn_momentum = bn_momentum
        self.leaky_slope = leaky_slope
        self.dropRate = dropRate

    def build(self, num_classes, in_channel):
        return WideResNet(in_channel=in_channel, depth=self.depth,
                          num_classes=num_classes,
                          widen_factor=self.widen_factor,
                          bn_momentum=self.bn_momentum,
                          leaky_slope=self.leaky_slope,
                          drop_rate=self.dropRate)
