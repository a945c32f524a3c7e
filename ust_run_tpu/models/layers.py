"""Shared Flax layers and initializers.

Everything is NHWC (TPU-native conv layout). Initializers reproduce the
statistics of torch defaults so that training dynamics match the
reference:

  * torch Conv2d kernel: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in), fan_in = in_ch * kh * kw;
  * torch ConvTranspose2d kernel: same formula but torch computes fan_in
    on weight dim 1 which is OUT channels: fan_in = out_ch * kh * kw;
  * biases: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

The load-bearing layer is `GroupedBatchNorm`. The reference runs 7-8
separate U-Net forward passes per training step, each with train-mode
BatchNorm computing statistics over its own 4-image batch
(train.py:643-702, 740). A literal translation would launch 8 small conv
stacks; instead we batch the passes into a few large calls and make BN
normalize each contiguous `group` of the batch independently — exactly
equivalent to the separate passes, while the convs see one big
MXU-friendly batch. Running statistics are folded sequentially
group-by-group in call order, matching torch's momentum-0.1 EMA update.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Kernel shape (kh, kw, in_ch, out_ch) — torch Conv2d default init."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """Kernel shape (kh, kw, in_ch, out_ch) — torch ConvTranspose2d init
    (fan computed over out channels, see torch nn.init._calculate_fan)."""
    fan_in = shape[0] * shape[1] * shape[3]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GroupedBatchNorm(nn.Module):
    """BatchNorm2d with per-group train-mode statistics.

    Semantics match torch nn.BatchNorm2d (reference unet_parts.py:17,20):
      * train: normalize with biased batch stats computed independently
        over each of `groups` contiguous slices of the batch axis; update
        running stats with momentum 0.1 using UNBIASED variance,
        sequentially in group order.
      * eval: normalize with running stats.

    Stats are computed in float32 regardless of the compute dtype.
    """
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        out_dtype = self.dtype or x.dtype
        if not train:
            mean = ra_mean.value
            var = ra_var.value
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = (x.astype(jnp.float32) - mean) * inv + bias
            return y.astype(out_dtype)

        n, h, w, _ = x.shape
        g = groups
        assert n % g == 0, f"batch {n} not divisible by groups {g}"
        # Stats in two stages: per-sample (h,w) reductions on the big
        # tensor in its NATIVE rank-4 layout, then the tiny (n,c)->(g,c)
        # group average. Reshaping the activation itself to rank-5 forces
        # XLA into a slow layout for the fused reduce (profiled at ~40%
        # of step time); this form reduces the same values in the same
        # f32 accumulation at full bandwidth.
        xf = x.astype(jnp.float32)
        m1 = jnp.mean(xf, axis=(1, 2))                            # (n, c)
        m2 = jnp.mean(jnp.square(xf), axis=(1, 2))
        mean = jnp.mean(m1.reshape(g, n // g, c), axis=1)         # (g, c)
        mean2 = jnp.mean(m2.reshape(g, n // g, c), axis=1)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)          # biased

        inv = jax.lax.rsqrt(var + self.eps) * scale               # (g, c)
        mean_n = jnp.repeat(mean, n // g, axis=0)                 # (n, c)
        inv_n = jnp.repeat(inv, n // g, axis=0)
        bias_n = jnp.broadcast_to(bias, (n, c))
        y = (xf - mean_n[:, None, None, :]) * inv_n[:, None, None, :] \
            + bias_n[:, None, None, :]
        y = y.astype(out_dtype)

        if self.is_mutable_collection("batch_stats"):
            cnt = (n // g) * h * w
            unbiased = var * (cnt / max(cnt - 1, 1))
            m = self.momentum
            # sequential EMA over groups in order:
            #   r_G = (1-m)^G r_0 + m * sum_g (1-m)^(G-1-g) stat_g
            wts = m * (1.0 - m) ** jnp.arange(g - 1, -1, -1, dtype=jnp.float32)
            decay = (1.0 - m) ** g
            ra_mean.value = decay * ra_mean.value + wts @ mean
            ra_var.value = decay * ra_var.value + wts @ unbiased
        return y


def conv3x3(features, dtype=None, name=None):
    """3x3 stride-1 same-padding conv, no bias (reference unet_parts.py:16)."""
    return nn.Conv(features, (3, 3), padding=1, use_bias=False,
                   kernel_init=torch_conv_kernel_init, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))
