"""W-packed level-1 U-Net (pack_l1=True) vs the plain layout.

The packed modules transform the SAME parameters in-trace
(ops/packing.py), so in f32 the two layouts must agree to float
tolerance on: forward logits (train + eval), the feature map, BN
running-stat updates, and parameter gradients. Tie-routing in the pool
differs only at ReLU-zero ties whose gradient dies in ReLU's backward,
so gradients agree too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ust_run_tpu.models import UNet


def _models(n_ch=3, n_cls=2, hw=64):
    kx, kp = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (3, hw, hw, n_ch), jnp.float32)
    m0 = UNet(n_channels=n_ch, n_classes=n_cls)
    m1 = UNet(n_channels=n_ch, n_classes=n_cls, pack_l1=True)
    v = m0.init(kp, x, train=False)
    return m0, m1, v, x


def test_param_tree_identical():
    m0, m1, v, x = _models()
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    t0 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v1)
    assert jax.tree_util.tree_structure(t0) == jax.tree_util.tree_structure(t1)
    assert t0 == t1


@pytest.mark.parametrize("train", [False, True])
def test_forward_matches(train):
    m0, m1, v, x = _models()
    kw = dict(train=train, groups=1)
    if train:
        y0, s0 = m0.apply(v, x, mutable=["batch_stats"], **kw)
        y1, s1 = m1.apply(v, x, mutable=["batch_stats"], **kw)
        for a, b in zip(jax.tree_util.tree_leaves(s0),
                        jax.tree_util.tree_leaves(s1)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    else:
        y0 = m0.apply(v, x, **kw)
        y1 = m1.apply(v, x, **kw)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_feature_matches():
    m0, m1, v, x = _models()
    _, f0 = m0.apply(v, x, train=False, feature=True)
    _, f1 = m1.apply(v, x, train=False, feature=True)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=2e-4, atol=2e-4)


def test_grads_match():
    m0, m1, v, x = _models(hw=32)

    def loss(model, params):
        y, _ = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(y))

    g0 = jax.grad(lambda p: loss(m0, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        # atol covers f32 reassociation in the level-1 weight-grads (the
        # largest pixel-count contractions): under f64 the worst
        # whole-tree diff is 2e-7, so everything above that is summation
        # order, not structure.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=6e-4,
            err_msg=jax.tree_util.keystr(path))


def test_grayscale_and_odd_classes():
    """MNMS-like config: 1 channel in, 4 classes out, 288-like size."""
    kx, kp = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (2, 36, 36, 1), jnp.float32)
    m0 = UNet(n_channels=1, n_classes=4)
    m1 = UNet(n_channels=1, n_classes=4, pack_l1=True)
    v = m0.init(kp, x, train=False)
    y0 = m0.apply(v, x, train=False)
    y1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_odd_width_falls_back():
    """A W-odd input silently uses the plain layout (pk gate)."""
    kx, kp = jax.random.split(jax.random.PRNGKey(4))
    x = jax.random.normal(kx, (1, 48, 48, 3), jnp.float32)
    m1 = UNet(n_channels=3, n_classes=2, pack_l1=True)
    v = m1.init(kp, x, train=False)
    xo = jax.random.normal(kx, (1, 48, 47, 3), jnp.float32)
    # odd width: must still run (plain path) without error
    m1.apply(v, xo, train=False)
