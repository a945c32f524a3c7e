import jax
import jax.numpy as jnp
import numpy as np
import torch

from ust_run_tpu.models.layers import GroupedBatchNorm
from ust_run_tpu.models.unet import UNet


def test_grouped_bn_matches_sequential_torch_bn():
    """G-group BN on a concat batch == G sequential torch BN forwards."""
    rng = np.random.RandomState(0)
    g, b, h, w, c = 3, 4, 8, 8, 5
    x = rng.randn(g * b, h, w, c).astype(np.float32)

    bn = GroupedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((g * b, h, w, c)),
                        train=False)
    # give nontrivial affine params and running stats
    scale = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32)
    r_mean = rng.randn(c).astype(np.float32)
    r_var = rng.rand(c).astype(np.float32) + 0.5
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(r_mean), "var": jnp.asarray(r_var)},
    }

    y, mutated = bn.apply(variables, jnp.asarray(x), train=True, groups=g,
                          mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
        tbn.running_mean.copy_(torch.from_numpy(r_mean))
        tbn.running_var.copy_(torch.from_numpy(r_var))
    tbn.train()
    outs = []
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    for gi in range(g):
        outs.append(tbn(xt[gi * b:(gi + 1) * b]).detach().numpy())
    ref = np.concatenate(outs).transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)


def test_grouped_bn_eval_uses_running_stats():
    c = 3
    bn = GroupedBatchNorm()
    variables = {
        "params": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "batch_stats": {"mean": jnp.full((c,), 2.0), "var": jnp.full((c,), 4.0)},
    }
    x = jnp.full((2, 4, 4, c), 2.0)
    y = bn.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-5)


def test_unet_shapes_and_param_count():
    model = UNet(n_channels=3, n_classes=2)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 64, 64, 2)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # reference UNet(3, 2) has 31,037,698 parameters (networks/unet_model.py,
    # bilinear=False; analytic count over DoubleConv/Down/Up/OutConv)
    assert n_params == 31_037_698, n_params


def test_unet_grouped_equals_separate_forwards():
    """One groups=2 call must equal two independent forward passes."""
    model = UNet(n_channels=1, n_classes=2)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(2), x[:2], train=False)

    both, _ = model.apply(variables, x, train=True, groups=2,
                          mutable=["batch_stats"])
    a, _ = model.apply(variables, x[:2], train=True, mutable=["batch_stats"])
    b, _ = model.apply(variables, x[2:], train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(both[:2]), np.asarray(a),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(both[2:]), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_unet_feature_flag():
    model = UNet(n_channels=1, n_classes=2)
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, feat = model.apply(variables, x, train=False, feature=True)
    assert logits.shape == (1, 32, 32, 2)
    assert feat.shape == (1, 32, 32, 64)
