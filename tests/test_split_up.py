"""Parity tests for the split Up-path first conv (models/layers.SplitConv3x3).

`split_up=True` computes each Up block's first conv as two summed
sliced convs instead of conv(concat([skip, up])) — the contraction is
identical with its f32 accumulation split along the input-channel
reduction dim, so results are tolerance-equal (reduction order), the
parameter tree is IDENTICAL (checkpoints interchangeable), and both
the packed (level-1) and plain Up blocks are covered. Reference
architecture: networks/unet_model.py:6-38, unet_parts.py:42-68.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ust_run_tpu.models import UNet


def _mk(pack, split):
    return UNet(n_channels=3, n_classes=2, pack_l1=pack, split_up=split)


@pytest.mark.parametrize("pack", [False, True])
def test_split_up_param_tree_identical(pack):
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = _mk(pack, False).init(jax.random.PRNGKey(0), x, train=False)
    v1 = _mk(pack, True).init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v0["params"]) == \
        jax.tree_util.tree_structure(v1["params"])
    for a, b in zip(jax.tree_util.tree_leaves(v0["params"]),
                    jax.tree_util.tree_leaves(v1["params"])):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pack", [False, True])
def test_split_up_forward_and_grad_parity(pack):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    m0, m1 = _mk(pack, False), _mk(pack, True)
    v = m0.init(jax.random.PRNGKey(1), x, train=False)

    y0 = m0.apply(v, x, train=False)
    y1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)

    def loss(params, m):
        return jnp.sum(m.apply({**v, "params": params}, x,
                               train=False) ** 2)

    g0 = jax.grad(loss)(v["params"], m0)
    g1 = jax.grad(loss)(v["params"], m1)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-3)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=5e-3,
            err_msg=jax.tree_util.keystr(p0))


def test_split_up_batchnorm_stats_parity():
    """Train-mode batch stats must agree: the BN after the split conv
    sees a tolerance-equal activation, so running stats track."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    m0, m1 = _mk(True, False), _mk(True, True)
    v = m0.init(jax.random.PRNGKey(2), x, train=True)
    _, u0 = m0.apply(v, x, train=True, mutable=["batch_stats"])
    _, u1 = m1.apply(v, x, train=True, mutable=["batch_stats"])
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(u0["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(u1["batch_stats"]),):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(p0))
