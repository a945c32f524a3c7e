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

    `group_sizes` (static tuple summing to the batch) allows UNEQUAL
    groups — used to fold the reference's B=1 LQ forward (train.py:740)
    into the same physical call as the five B=4 student passes.
    `group_valid` (traced (g,) bool) masks groups out of the RUNNING-stat
    fold: an invalid group still normalizes with its own batch stats
    (its outputs are discarded by the caller) but leaves running
    mean/var exactly as if its forward never happened.

    Stats are computed in float32 regardless of the compute dtype.
    """
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool, groups: int = 1,
                 group_sizes=None, group_valid=None):
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
        if group_sizes is None:
            g = groups
            assert n % g == 0, f"batch {n} not divisible by groups {g}"
            group_sizes = (n // g,) * g
        else:
            group_sizes = tuple(group_sizes)
            g = len(group_sizes)
            assert sum(group_sizes) == n, (group_sizes, n)

        equal = len(set(group_sizes)) == 1
        # Stats in two stages: per-sample (h,w) reductions on the big
        # tensor in its NATIVE rank-4 layout, then the tiny (n,c)->(g,c)
        # group average. Reshaping the activation itself to rank-5 forces
        # XLA into a slow layout for the fused reduce (profiled at ~40%
        # of step time); this form reduces the same values in the same
        # f32 accumulation at full bandwidth. The per-sample moments are
        # accumulated in f32 straight off the (possibly bf16) input —
        # no f32 copy of the activation is materialized.
        m1 = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)          # (n, c)
        m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
        if equal:
            mean = jnp.mean(m1.reshape(g, n // g, c), axis=1)
            mean2 = jnp.mean(m2.reshape(g, n // g, c), axis=1)
        else:
            # static averaging matrix: tiny (g,n)x(n,c) contraction
            import numpy as np
            seg = np.repeat(np.arange(g), group_sizes)
            avg = np.zeros((g, n), np.float32)
            avg[seg, np.arange(n)] = 1.0 / np.asarray(group_sizes)[seg]
            avg = jnp.asarray(avg)
            mean = avg @ m1                                       # (g, c)
            mean2 = avg @ m2
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)          # biased

        inv = jax.lax.rsqrt(var + self.eps) * scale               # (g, c)
        if equal:
            mean_n = jnp.repeat(mean, n // g, axis=0)             # (n, c)
            inv_n = jnp.repeat(inv, n // g, axis=0)
        else:
            mean_n = mean[seg]
            inv_n = inv[seg]
        bias_n = jnp.broadcast_to(bias, (n, c))
        # normalize in the compute dtype (bf16 under amp): the affine is
        # folded as x*inv - (mean*inv - bias) so the bf16 tensor is
        # touched by one fused multiply-add; statistics stay f32.
        shift = mean_n * inv_n - bias_n                           # (n, c) f32
        y = x.astype(out_dtype) * inv_n[:, None, None, :].astype(out_dtype) \
            - shift[:, None, None, :].astype(out_dtype)

        if self.is_mutable_collection("batch_stats"):
            cnt = jnp.asarray([s * h * w for s in group_sizes], jnp.float32)
            unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))[:, None]
            m = self.momentum
            # sequential EMA over groups in order:
            #   r_G = (1-m)^G r_0 + m * sum_g (1-m)^(#valid after g) stat_g
            if group_valid is None:
                wts = m * (1.0 - m) ** jnp.arange(g - 1, -1, -1,
                                                  dtype=jnp.float32)
                decay = jnp.float32((1.0 - m) ** g)
            else:
                v = jnp.asarray(group_valid, jnp.float32)
                after = jnp.cumsum(v[::-1])[::-1] - v   # valid groups after g
                wts = m * (1.0 - m) ** after * v
                decay = (1.0 - m) ** jnp.sum(v)
            ra_mean.value = decay * ra_mean.value + wts @ mean
            ra_var.value = decay * ra_var.value + wts @ unbiased
        return y


def conv3x3(features, dtype=None, name=None):
    """3x3 stride-1 same-padding conv, no bias (reference unet_parts.py:16)."""
    return nn.Conv(features, (3, 3), padding=1, use_bias=False,
                   kernel_init=torch_conv_kernel_init, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def max_pool_2x2(x):
    """2x2 stride-2 max pool (reduce_window).

    Perf note (r3): strided-slice and reshape-max formulations were both
    measured SLOWER in the fused step (110.9 / 104.8 vs 97.7 ms) despite
    select-and-scatter's reputation — the window form fuses better with
    the surrounding conv/BN graph on this compiler. Keep reduce_window.
    """
    return nn.max_pool(x, (2, 2), strides=(2, 2))
