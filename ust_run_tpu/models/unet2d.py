"""The alternative Unet2D family (reference networks/unet.py, 500 LoC).

Not used by the reference entry points but part of its model zoo:
ConvD/ConvU blocks with pluggable normalization (bn/gn/in/dsbn),
`Unet2D`, `Unet2D_MT` (seg + reconstruction heads), `Encoder`/`Decoder`,
`Rec_Decoder` (DSBN-conditioned), `Unet2D_DS` (deep supervision),
`Unet2D_MS` (multi-scale heads), and a PatchGAN-style `Discriminator`
(unet.py:473-501). Init matches kaiming_normal(fan_out) for convs
(unet.py:314-319). NHWC throughout; bilinear upsampling uses
jax.image.resize (align_corners=False semantics, like
nn.Upsample(align_corners=False), unet.py:85).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ust_run_tpu.models.dsbn import DomainSpecificBatchNorm2d
from ust_run_tpu.models.layers import GroupedBatchNorm, torch_bias_init

kaiming_normal_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


def _conv(features, ksize, name=None, stride=1, padding=None):
    if padding is None:
        padding = ksize // 2
    return nn.Conv(features, (ksize, ksize), strides=(stride, stride),
                   padding=padding, use_bias=True,
                   kernel_init=kaiming_normal_out,
                   bias_init=torch_bias_init(features * ksize * ksize),
                   param_dtype=jnp.float32, name=name)


class Norm(nn.Module):
    """normalization() factory (unet.py:17-28)."""
    kind: str  # 'bn' | 'gn' | 'in' | 'dsbn'
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool, domain_label=None, groups: int = 1,
                 group_sizes=None, group_valid=None):
        if self.kind == "bn":
            return GroupedBatchNorm()(x, train=train, groups=groups,
                                      group_sizes=group_sizes,
                                      group_valid=group_valid)
        if self.kind == "gn":
            # GroupNorm(1, C) == LayerNorm over (H,W,C) with affine per C
            return nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
        if self.kind == "in":
            # torch InstanceNorm2d default: no affine, no running stats
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.kind == "dsbn":
            assert domain_label is not None
            return DomainSpecificBatchNorm2d(self.num_domains)(
                x, domain_label, train=train)
        raise ValueError(self.kind)


def _act(name):
    if name == "relu":
        return nn.relu
    return lambda x: nn.leaky_relu(x, 0.01)


def upsample2x(x):
    """nn.Upsample(scale_factor=2, bilinear, align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


class ConvD(nn.Module):
    """Down block (unet.py:32-73): [maxpool] -> conv-bn -> conv-bn-act ->
    conv-bn-act. Note the reference's first conv output skips activation."""
    planes: int
    norm: str = "bn"
    first: bool = False
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool, domain_label=None, groups: int = 1,
                 group_sizes=None, group_valid=None):
        act = _act(self.activation)
        if not self.first:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _conv(self.planes, 3, "conv1")(x)
        x = Norm(self.norm, self.num_domains, name="bn1")(
            x, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        y = _conv(self.planes, 3, "conv2")(x)
        y = Norm(self.norm, self.num_domains, name="bn2")(
            y, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        y = act(y)
        z = _conv(self.planes, 3, "conv3")(y)
        z = Norm(self.norm, self.num_domains, name="bn3")(
            z, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        return act(z)


class ConvU(nn.Module):
    """Up block (unet.py:75-118)."""
    planes: int
    norm: str = "bn"
    first: bool = False
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, prev, *, train: bool, domain_label=None,
                 groups: int = 1, group_sizes=None, group_valid=None):
        act = _act(self.activation)
        if not self.first:
            x = _conv(self.planes, 3, "conv1")(x)
            x = Norm(self.norm, self.num_domains, name="bn1")(
                x, train=train, domain_label=domain_label, groups=groups,
                group_sizes=group_sizes, group_valid=group_valid)
            x = act(x)
        y = upsample2x(x)
        y = _conv(self.planes // 2, 1, "conv2")(y)
        y = Norm(self.norm, self.num_domains, name="bn2")(
            y, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        y = act(y)
        y = jnp.concatenate([prev, y], axis=-1)
        y = _conv(self.planes, 3, "conv3")(y)
        y = Norm(self.norm, self.num_domains, name="bn3")(
            y, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        return act(y)


class ConvURec(nn.Module):
    """Reconstruction up block (unet.py:120-166), DSBN-conditionable."""
    planes: int
    norm: str = "bn"
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool, domain_label=None,
                 groups: int = 1, group_sizes=None, group_valid=None):
        act = _act(self.activation)
        x = _conv(self.planes // 2, 3, "conv1")(x)
        x = Norm(self.norm, self.num_domains, name="bn1")(
            x, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        x = act(x)
        y = upsample2x(x)
        y = _conv(self.planes // 2, 1, "conv2")(y)
        y = Norm(self.norm, self.num_domains, name="bn2")(
            y, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        y = act(y)
        y = _conv(self.planes // 2, 3, "conv3")(y)
        y = Norm(self.norm, self.num_domains, name="bn3")(
            y, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        return act(y)


class _Backbone(nn.Module):
    c: int = 3
    n: int = 16
    norm: str = "bn"
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool, domain_label=None,
                 groups: int = 1, group_sizes=None, group_valid=None):
        n = self.n
        kw = dict(train=train, domain_label=domain_label, groups=groups,
                  group_sizes=group_sizes, group_valid=group_valid)
        x1 = ConvD(n, self.norm, True, self.activation, self.num_domains,
                   name="convd1")(x, **kw)
        x2 = ConvD(2 * n, self.norm, False, self.activation,
                   self.num_domains, name="convd2")(x1, **kw)
        x3 = ConvD(4 * n, self.norm, False, self.activation,
                   self.num_domains, name="convd3")(x2, **kw)
        x4 = ConvD(8 * n, self.norm, False, self.activation,
                   self.num_domains, name="convd4")(x3, **kw)
        x5 = ConvD(16 * n, self.norm, False, self.activation,
                   self.num_domains, name="convd5")(x4, **kw)
        return x1, x2, x3, x4, x5


class _UpPath(nn.Module):
    n: int = 16
    norm: str = "bn"
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, feats, *, train: bool, domain_label=None,
                 groups: int = 1, group_sizes=None, group_valid=None):
        n = self.n
        x1, x2, x3, x4, x5 = feats
        kw = dict(train=train, domain_label=domain_label, groups=groups,
                  group_sizes=group_sizes, group_valid=group_valid)
        y4 = ConvU(16 * n, self.norm, True, self.activation,
                   self.num_domains, name="convu4")(x5, x4, **kw)
        y3 = ConvU(8 * n, self.norm, False, self.activation,
                   self.num_domains, name="convu3")(y4, x3, **kw)
        y2 = ConvU(4 * n, self.norm, False, self.activation,
                   self.num_domains, name="convu2")(y3, x2, **kw)
        y1 = ConvU(2 * n, self.norm, False, self.activation,
                   self.num_domains, name="convu1")(y2, x1, **kw)
        return y1, y2, y3, y4


class Unet2D(nn.Module):
    """unet.py:168-203."""
    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, domain_label=None,
                 groups: int = 1, group_sizes=None, group_valid=None):
        feats = _Backbone(self.c, self.n, self.norm, self.activation,
                          self.num_domains, name="enc")(
            x, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        y1, _, _, _ = _UpPath(self.n, self.norm, self.activation,
                              self.num_domains, name="dec")(
            feats, train=train, domain_label=domain_label, groups=groups,
            group_sizes=group_sizes, group_valid=group_valid)
        return _conv(self.num_classes, 3, "seg1")(y1)


class Unet2D_MT(nn.Module):
    """Mean-teacher variant with seg + reconstruction heads
    (unet.py:206-246)."""
    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = True, is_rec: bool = False):
        feats = _Backbone(self.c, self.n, self.norm, self.activation,
                          name="enc")(x, train=train)
        y1, _, _, _ = _UpPath(self.n, self.norm, self.activation,
                              name="dec")(feats, train=train)
        # both heads always exist (torch registers both modules,
        # unet.py:221-222); select the output
        seg = _conv(self.num_classes, 3, "seg1")(y1)
        rec = _conv(self.c, 3, "rec1")(y1)
        return rec if is_rec else seg


class Encoder(nn.Module):
    """unet.py:248-271."""
    c: int = 3
    n: int = 16
    norm: str = "bn"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        return list(_Backbone(self.c, self.n, self.norm, self.activation,
                              name="enc")(x, train=train))


class Decoder(nn.Module):
    """unet.py:273-296."""
    n: int = 16
    num_classes: int = 2
    norm: str = "bn"
    activation: str = "relu"

    @nn.compact
    def __call__(self, feats, *, train: bool = True):
        y1, _, _, _ = _UpPath(self.n, self.norm, self.activation,
                              name="dec")(tuple(feats), train=train)
        return _conv(self.num_classes, 3, "out1")(y1)


class RecDecoder(nn.Module):
    """DSBN-conditioned reconstruction decoder (unet.py:339-364)."""
    n: int = 16
    num_classes: int = 2
    norm: str = "bn"
    activation: str = "relu"
    num_domains: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True, domain_label=None):
        n = self.n
        kw = dict(train=train, domain_label=domain_label)
        y4 = ConvURec(16 * n, self.norm, self.activation, self.num_domains,
                      name="convu4")(x, **kw)
        y3 = ConvURec(8 * n, self.norm, self.activation, self.num_domains,
                      name="convu3")(y4, **kw)
        y2 = ConvURec(4 * n, self.norm, self.activation, self.num_domains,
                      name="convu2")(y3, **kw)
        y1 = ConvURec(2 * n, self.norm, self.activation, self.num_domains,
                      name="convu1")(y2, **kw)
        return _conv(self.num_classes, 3, "out1")(y1)


class Unet2D_DS(nn.Module):
    """Deep supervision variant (unet.py:365-419): side heads at every
    decoder level, upsampled to full resolution."""
    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = True, deep_sup: bool = False):
        n = self.n
        feats = _Backbone(self.c, self.n, self.norm, self.activation,
                          name="enc")(x, train=train)
        y1, y2, y3, y4 = _UpPath(self.n, self.norm, self.activation,
                                 name="dec")(feats, train=train)
        y1_pred = _conv(self.num_classes, 3, "seg1")(y1)
        size = x.shape[1:3]

        def up(t):
            return jax.image.resize(
                t, (t.shape[0], size[0], size[1], t.shape[-1]), "bilinear")

        y5_pred = up(_conv(self.num_classes, 3, "seg5")(feats[4]))
        y4_pred = up(_conv(self.num_classes, 3, "seg4")(y4))
        y3_pred = up(_conv(self.num_classes, 3, "seg3")(y3))
        y2_pred = up(_conv(self.num_classes, 3, "seg2")(y2))
        if not deep_sup:
            return y1_pred
        return y1_pred, y2_pred, y3_pred, y4_pred, y5_pred


class Unet2D_MS(nn.Module):
    """Multi-scale heads variant (unet.py:421-471): same side heads but
    WITHOUT upsampling."""
    c: int = 3
    n: int = 16
    norm: str = "bn"
    num_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, *, train: bool = True,
                 multi_scale_output: bool = False):
        feats = _Backbone(self.c, self.n, self.norm, self.activation,
                          name="enc")(x, train=train)
        y1, y2, y3, y4 = _UpPath(self.n, self.norm, self.activation,
                                 name="dec")(feats, train=train)
        outs = (_conv(self.num_classes, 3, "seg1")(y1),
                _conv(self.num_classes, 3, "seg2")(y2),
                _conv(self.num_classes, 3, "seg3")(y3),
                _conv(self.num_classes, 3, "seg4")(y4),
                _conv(self.num_classes, 3, "seg5")(feats[4]))
        if not multi_scale_output:
            return outs[0]
        return outs


class Discriminator(nn.Module):
    """PatchGAN-style discriminator (unet.py:473-501)."""
    input_nc: int = 3
    n: int = 16

    @nn.compact
    def __call__(self, x):
        def inorm(t):
            mean = jnp.mean(t, axis=(1, 2), keepdims=True)
            var = jnp.var(t, axis=(1, 2), keepdims=True)
            return (t - mean) * jax.lax.rsqrt(var + 1e-5)

        n = self.n
        x = _conv(n, 4, "c0", stride=2, padding=1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = _conv(2 * n, 4, "c1", stride=2, padding=1)(x)
        x = nn.leaky_relu(inorm(x), 0.2)
        x = _conv(4 * n, 4, "c2", stride=2, padding=1)(x)
        x = nn.leaky_relu(inorm(x), 0.2)
        x = _conv(8 * n, 4, "c3", stride=1, padding=1)(x)
        x = nn.leaky_relu(inorm(x), 0.2)
        x = _conv(1, 4, "c4", stride=1, padding=1)(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 1)
