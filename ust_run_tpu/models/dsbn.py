"""Domain-specific BatchNorm (reference networks/dsbn.py:4-34).

The reference keeps a ModuleList of per-domain BatchNorm2d layers and
routes the whole batch through `bns[domain_label[0]]` — one domain per
batch. Here the per-domain affine parameters and running statistics are
stacked on a leading domain axis and selected with a gather, which keeps
the layer jittable with a traced domain index (XLA select instead of
python branching).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class DomainSpecificBatchNorm2d(nn.Module):
    num_domains: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, domain_label, *, train: bool):
        """x: (N,H,W,C); domain_label: int array, first element selects the
        domain (reference dsbn.py:26: `bn = self.bns[domain_label[0]]`)."""
        c = x.shape[-1]
        d = self.num_domains
        scale = self.param("scale", nn.initializers.ones, (d, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d, c), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d, c), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d, c), jnp.float32))
        idx = jnp.asarray(domain_label).reshape(-1)[0].astype(jnp.int32)
        sc = scale[idx]
        bs = bias[idx]
        out_dtype = self.dtype or x.dtype

        if not train:
            mean = ra_mean.value[idx]
            var = ra_var.value[idx]
            inv = jax.lax.rsqrt(var + self.eps) * sc
            y = (x.astype(jnp.float32) - mean) * inv + bs
            return y.astype(out_dtype)

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2))
                          - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps) * sc
        y = ((xf - mean) * inv + bs).astype(out_dtype)

        if self.is_mutable_collection("batch_stats"):
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            onehot = jax.nn.one_hot(idx, d)[:, None]        # (d,1)
            ra_mean.value = ra_mean.value * (1 - m * onehot) \
                + m * onehot * mean[None, :]
            ra_var.value = ra_var.value * (1 - m * onehot) \
                + m * onehot * unbiased[None, :]
        return y
