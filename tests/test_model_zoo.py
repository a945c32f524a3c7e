import jax
import jax.numpy as jnp
import numpy as np

from ust_run_tpu.models import (DeepLabV2, Discriminator, Unet2D, Unet2D_DS,
                                Unet2D_MS, Unet2D_MT, build_WideResNet)
from ust_run_tpu.models.dsbn import DomainSpecificBatchNorm2d


def test_unet2d_shapes():
    m = Unet2D(c=1, n=8, num_classes=2)
    x = jnp.zeros((2, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 32, 32, 2)


def test_unet2d_gn_and_in_norms():
    for norm in ("gn", "in"):
        m = Unet2D(c=1, n=4, num_classes=2, norm=norm)
        x = jnp.ones((1, 32, 32, 1))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=True)
        assert np.isfinite(np.asarray(y)).all(), norm


def test_unet2d_dsbn_routes_by_domain():
    m = Unet2D(c=1, n=4, num_classes=2, norm="dsbn", num_domains=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    dl0 = jnp.zeros((2,), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, train=False, domain_label=dl0)
    # eval path uses per-domain running stats -> domains with fresh stats
    # produce different outputs after one domain's stats are updated
    _, upd = m.apply(v, x, train=True, domain_label=dl0,
                     mutable=["batch_stats"])
    v1 = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    y0 = m.apply(v1, x, train=False, domain_label=jnp.zeros((2,), jnp.int32))
    y1 = m.apply(v1, x, train=False, domain_label=jnp.ones((2,), jnp.int32))
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_dsbn_layer_isolated_stats():
    bn = DomainSpecificBatchNorm2d(num_domains=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3)) * 2 + 1
    v = bn.init(jax.random.PRNGKey(1), x, jnp.zeros((4,), jnp.int32),
                train=False)
    _, upd = bn.apply(v, x, jnp.zeros((4,), jnp.int32), train=True,
                      mutable=["batch_stats"])
    stats = upd["batch_stats"]
    # only domain 0's running stats moved
    assert not np.allclose(np.asarray(stats["mean"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(stats["mean"][1]), 0.0)
    np.testing.assert_allclose(np.asarray(stats["var"][1]), 1.0)


def test_unet2d_mt_rec_head():
    m = Unet2D_MT(c=3, n=4, num_classes=2)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    seg = m.apply(v, x, train=False)
    rec = m.apply(v, x, train=False, is_rec=True)
    assert seg.shape == (1, 32, 32, 2)
    assert rec.shape == (1, 32, 32, 3)


def test_deep_supervision_and_multiscale():
    ds = Unet2D_DS(c=1, n=4, num_classes=2)
    x = jnp.zeros((1, 32, 32, 1))
    v = ds.init(jax.random.PRNGKey(0), x, train=False)
    outs = ds.apply(v, x, train=False, deep_sup=True)
    assert len(outs) == 5
    assert all(o.shape == (1, 32, 32, 2) for o in outs)  # all upsampled
    ms = Unet2D_MS(c=1, n=4, num_classes=2)
    v = ms.init(jax.random.PRNGKey(0), x, train=False)
    outs = ms.apply(v, x, train=False, multi_scale_output=True)
    # native head resolutions: y1..y4 at 32/16/8/4, x5 at 2 (unet.py:459-466)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]


def test_wrn_classifier():
    wrn = build_WideResNet(depth=10, widen_factor=2).build(
        num_classes=5, in_channel=3)
    x = jnp.zeros((2, 32, 32, 3))
    v = wrn.init(jax.random.PRNGKey(0), x, train=False)
    logits = wrn.apply(v, x, train=False)
    assert logits.shape == (2, 5)
    logits2, feat = wrn.apply(v, x, train=False, ood_test=True)
    assert feat.shape == (2, 128)


def test_discriminator():
    d = Discriminator(input_nc=3, n=8)
    x = jnp.zeros((2, 64, 64, 3))
    v = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(v, x)
    assert y.shape == (2, 1)


def test_deeplabv2_output_stride_and_tta():
    m = DeepLabV2(backbone="resnet50", nclass=2)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 64, 64, 2)
    y_tta = m.apply(v, x, train=False, tta=True)
    assert y_tta.shape == (1, 64, 64, 2)
