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
                 group_sizes=None, group_valid=None, packed: bool = False):
        # `packed`: x is in W-packed layout (n, h, w/2, 2c) — logical
        # channel k lives in lanes k and k+c (ops/packing.py). Stats fold
        # the two lane blocks (an exact resummation of the same pixels);
        # params and running stats stay (c,), so checkpoints are
        # layout-independent.
        c = x.shape[-1] // 2 if packed else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        def lanes(v):       # (..., c) -> per-lane view of the x layout
            return jnp.concatenate([v, v], axis=-1) if packed else v

        out_dtype = self.dtype or x.dtype
        if not train:
            mean = ra_mean.value
            var = ra_var.value
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = (x.astype(jnp.float32) - lanes(mean)) * lanes(inv) \
                + lanes(bias)
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
        if packed:          # fold the two lane blocks of each channel
            m1 = 0.5 * (m1[:, :c] + m1[:, c:])
            m2 = 0.5 * (m2[:, :c] + m2[:, c:])
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
        y = x.astype(out_dtype) \
            * lanes(inv_n)[:, None, None, :].astype(out_dtype) \
            - lanes(shift)[:, None, None, :].astype(out_dtype)

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


# ---------------------------------------------------------------------------
# W-packed (P=2) variants of the level-1 layers.
#
# 64-channel tensors leave the 128-wide MXU contracting at half width;
# at the U-Net level-1 shape the packed conv measures 1.4-1.6x faster
# fwd+bwd despite its banded weights carrying structural zeros (2x dense
# FLOPs). Each module creates EXACTLY the same parameter (name, shape,
# init) as the unpacked layer it replaces and transforms it in-trace
# (ops/packing.py), so checkpoints, init statistics, and torch-oracle
# parity are layout-independent. Give them the unpacked layer's
# auto-name (name="Conv_0", ...) when swapping in.
# ---------------------------------------------------------------------------


class PackedConv3x3(nn.Module):
    """conv3x3 on a P=2 W-packed input (banded packed weights).

    `in_splits`: original channel widths of the concatenated packed
    inputs (e.g. (64, 64) after a skip concat of two packed tensors)."""
    features: int
    in_splits: tuple = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ust_run_tpu.ops.packing import pack2_weights_split
        cin = x.shape[-1] // 2
        splits = self.in_splits or (cin,)
        assert sum(splits) == cin, (splits, cin)
        w = self.param("kernel", torch_conv_kernel_init,
                       (3, 3, cin, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        wp = pack2_weights_split(w, splits).astype(dt)
        return jax.lax.conv_general_dilated(
            x.astype(dt), wp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SplitConv3x3(nn.Module):
    """conv3x3 over a TWO-PIECE input without materializing the concat.

    conv(concat([a, b]), W) == conv(a, W[:, :, :ka]) + conv(b, W[:, :, ka:])
    (the contraction splits along the input-channel reduction dim; the
    f32 accumulation order changes, so results are tolerance-equal, not
    bit-equal). Creates EXACTLY the parameter of the conv3x3/
    PackedConv3x3 it replaces (name it "Conv_0" when swapping in).
    Motivation: the Up-path first convs consume a skip concat whose
    forward materialization and backward split showed up as discrete
    multi-ms ops in the r5 fundus trace (PERF.md). `packed`: both
    pieces are P=2 W-packed; kernel slices are packed per piece
    (ops/packing.pack2_weights_split semantics)."""
    features: int
    splits: tuple
    packed: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, a, b):
        from ust_run_tpu.ops.packing import pack_weights
        ka, kb = self.splits
        w = self.param("kernel", torch_conv_kernel_init,
                       (3, 3, ka + kb, self.features), jnp.float32)
        dt = self.dtype or a.dtype
        if self.packed:
            wa = pack_weights(w[:, :, :ka], 2).astype(dt)
            wb = pack_weights(w[:, :, ka:], 2).astype(dt)
        else:
            wa = w[:, :, :ka].astype(dt)
            wb = w[:, :, ka:].astype(dt)

        def cv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_.astype(dt), w_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return cv(a, wa) + cv(b, wb)


class PackedStemConv3x3(nn.Module):
    """conv3x3 from an UNPACKED input to a P=2 W-packed output:
    stride-(1,2) kernel-(3,4) conv, padding ((1,1),(1,2))."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ust_run_tpu.ops.packing import pack2_stem_weights
        cin = x.shape[-1]
        w = self.param("kernel", torch_conv_kernel_init,
                       (3, 3, cin, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        wp = pack2_stem_weights(w).astype(dt)
        return jax.lax.conv_general_dilated(
            x.astype(dt), wp, (1, 2), ((1, 1), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PackedConvTranspose2x2(nn.Module):
    """2x2 stride-2 VALID ConvTranspose producing a P=2 W-packed output:
    H-only (2,1)-stride transpose conv with the W taps folded into the
    output blocks (ops/packing.py:pack2_convT_weights)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ust_run_tpu.ops.packing import pack2_convT_weights
        cin = x.shape[-1]
        w = self.param("kernel", torch_convT_kernel_init,
                       (2, 2, cin, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(cin), (self.features,),
                       jnp.float32)
        dt = self.dtype or x.dtype
        wp = pack2_convT_weights(w).astype(dt)
        y = jax.lax.conv_transpose(
            x.astype(dt), wp, (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.concatenate([b, b]).astype(dt)


class PackedOutConv(nn.Module):
    """1x1 out conv on a P=2 W-packed input; returns UNPACKED logits
    (the unpack of the tiny class-channel tensor is the only layout
    conversion on the packed path)."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ust_run_tpu.ops.packing import pack2_pointwise_weights
        n, h, w2, cin2 = x.shape
        cin = cin2 // 2
        w = self.param("kernel", torch_conv_kernel_init,
                       (1, 1, cin, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(cin), (self.features,),
                       jnp.float32)
        dt = self.dtype or x.dtype
        wp = pack2_pointwise_weights(w).astype(dt)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), wp, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.concatenate([b, b]).astype(dt)
        return jnp.reshape(y, (n, h, 2 * w2, self.features))


def packed_pool_entry(x):
    """2x2 stride-2 max pool consuming a P=2 W-packed tensor, emitting
    the UNPACKED pooled tensor for the next (wider) level. The W max is
    an elementwise max of the two lane blocks; the H max is a (2,1)
    window pool. Tie note: jnp.maximum splits the gradient 0.5/0.5 at
    exact ties where reduce_window routes it all to the first element;
    ties here are ReLU zeros, whose upstream gradient ReLU's backward
    kills either way."""
    n, h, w2, c2 = x.shape
    c = c2 // 2
    y = jnp.maximum(x[..., :c], x[..., c:])
    return nn.max_pool(y, (2, 1), strides=(2, 1))


def unpack2(x):
    """(n, h, w/2, 2c) W-packed -> (n, h, w, c); contiguous reshape."""
    n, h, w2, c2 = x.shape
    return jnp.reshape(x, (n, h, 2 * w2, c2 // 2))


def max_pool_2x2(x):
    """2x2 stride-2 max pool (reduce_window).

    Perf note (r3): strided-slice and reshape-max formulations were both
    measured SLOWER in the fused step (110.9 / 104.8 vs 97.7 ms) despite
    select-and-scatter's reputation — the window form fuses better with
    the surrounding conv/BN graph on this compiler. Keep reduce_window.
    """
    return nn.max_pool(x, (2, 2), strides=(2, 2))
