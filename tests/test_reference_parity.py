"""Architecture parity against the actual reference network.

The reference repo is mounted read-only at /root/reference; its
networks/unet_model.py is importable on CPU (no .cuda() at module level).
We copy OUR Flax UNet parameters into the reference torch UNet and require
numerically identical outputs — proving the rebuilt architecture (shapes,
padding, concat order, BN semantics, transpose-conv convention) matches
the trained model bit-for-bit up to float32 accumulation order.

Skipped automatically when the reference mount is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _flax_to_torch(params, stats, tmodel):
    import torch

    def conv_w(k):  # (kh,kw,in,out) -> (out,in,kh,kw)
        return torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    def convT_w(k):  # flax (kh,kw,in,out) -> torch (in,out,kh,kw), flipped
        return torch.from_numpy(
            np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)).copy())

    def set_double_conv(seq, p, s):
        # seq: nn.Sequential(conv, bn, relu, conv, bn, relu)
        seq[0].weight.data.copy_(conv_w(p["Conv_0"]["kernel"]))
        seq[1].weight.data.copy_(torch.from_numpy(
            np.asarray(p["GroupedBatchNorm_0"]["scale"])))
        seq[1].bias.data.copy_(torch.from_numpy(
            np.asarray(p["GroupedBatchNorm_0"]["bias"])))
        seq[1].running_mean.copy_(torch.from_numpy(
            np.asarray(s["GroupedBatchNorm_0"]["mean"])))
        seq[1].running_var.copy_(torch.from_numpy(
            np.asarray(s["GroupedBatchNorm_0"]["var"])))
        seq[3].weight.data.copy_(conv_w(p["Conv_1"]["kernel"]))
        seq[4].weight.data.copy_(torch.from_numpy(
            np.asarray(p["GroupedBatchNorm_1"]["scale"])))
        seq[4].bias.data.copy_(torch.from_numpy(
            np.asarray(p["GroupedBatchNorm_1"]["bias"])))
        seq[4].running_mean.copy_(torch.from_numpy(
            np.asarray(s["GroupedBatchNorm_1"]["mean"])))
        seq[4].running_var.copy_(torch.from_numpy(
            np.asarray(s["GroupedBatchNorm_1"]["var"])))

    with torch.no_grad():
        set_double_conv(tmodel.inc.double_conv, params["inc"], stats["inc"])
        for i in range(1, 5):
            set_double_conv(
                getattr(tmodel, f"down{i}").maxpool_conv[1].double_conv,
                params[f"down{i}"]["DoubleConv_0"],
                stats[f"down{i}"]["DoubleConv_0"])
        for i in range(1, 5):
            up = getattr(tmodel, f"up{i}")
            p = params[f"up{i}"]
            s = stats[f"up{i}"]
            up.up.weight.data.copy_(convT_w(p["ConvTranspose_0"]["kernel"]))
            up.up.bias.data.copy_(torch.from_numpy(
                np.asarray(p["ConvTranspose_0"]["bias"])))
            set_double_conv(up.conv.double_conv, p["DoubleConv_0"],
                            s["DoubleConv_0"])
        tmodel.outc.conv.weight.data.copy_(
            conv_w(params["outc"]["kernel"]))
        tmodel.outc.conv.bias.data.copy_(torch.from_numpy(
            np.asarray(params["outc"]["bias"])))


def test_unet_matches_reference_torch_unet():
    import torch
    sys.path.insert(0, REF)
    try:
        from networks.unet_model import UNet as TorchUNet
    finally:
        sys.path.remove(REF)
    import jax

    from ust_run_tpu.models import UNet

    model = UNet(n_channels=3, n_classes=2)
    x = np.random.RandomState(0).randn(2, 48, 48, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), x, train=False)
    # randomize the running stats so eval-mode BN is non-trivial
    rng = np.random.RandomState(1)
    stats = jax.tree.map(
        lambda a: rng.randn(*a.shape).astype(np.float32) * 0.3
        + (1.0 if a.ndim and False else 0.5),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    ours = np.asarray(model.apply(variables, x, train=False))

    tmodel = TorchUNet(n_channels=3, n_classes=2)
    _flax_to_torch(variables["params"], variables["batch_stats"], tmodel)
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    theirs = theirs.transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_train_mode_bn_matches_reference():
    import torch
    sys.path.insert(0, REF)
    try:
        from networks.unet_model import UNet as TorchUNet
    finally:
        sys.path.remove(REF)
    import jax

    from ust_run_tpu.models import UNet

    model = UNet(n_channels=1, n_classes=2)
    x = np.random.RandomState(2).randn(4, 32, 32, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    ours, _ = model.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    ours = np.asarray(ours)

    tmodel = TorchUNet(n_channels=1, n_classes=2)
    _flax_to_torch(variables["params"], variables["batch_stats"], tmodel)
    tmodel.train()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    theirs = theirs.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_losses_match_reference_module():
    """Drive the reference's own DiceLossWithMask as the oracle."""
    import torch
    sys.path.insert(0, REF)
    try:
        from utils.losses import DiceLossWithMask
    finally:
        sys.path.remove(REF)
    from ust_run_tpu.utils import losses as L

    rng = np.random.RandomState(5)
    # fundus path: sigmoid + multi, with mask (train.py:817, 826-836)
    x = rng.randn(2, 2, 16, 16).astype(np.float32)       # NCHW for torch
    t = (rng.rand(2, 2, 16, 16) > 0.5).astype(np.float32)
    m = (rng.rand(2, 2, 16, 16) > 0.4).astype(np.float32)
    ref = DiceLossWithMask(2)
    r = float(ref(torch.from_numpy(x), torch.from_numpy(t).unsqueeze(1),
                  mask=torch.from_numpy(m), softmax=False, sigmoid=True,
                  multi=True))
    ours = float(L.dice_loss_multilabel(x.transpose(0, 2, 3, 1),
                                        t.transpose(0, 2, 3, 1),
                                        m.transpose(0, 2, 3, 1)))
    assert np.isclose(ours, r, rtol=1e-5), (ours, r)

    # prostate path: softmax per-class with the one-hot mask quirk
    x2 = rng.randn(2, 2, 16, 16).astype(np.float32)
    t2 = rng.randint(0, 2, (2, 16, 16))
    m2 = (rng.rand(2, 1, 16, 16) > 0.5).astype(np.float32)
    r2 = float(ref(torch.from_numpy(x2),
                   torch.from_numpy(t2).unsqueeze(1),
                   mask=torch.from_numpy(m2), softmax=True, sigmoid=False,
                   multi=False))
    ours2 = float(L.dice_loss_multiclass(x2.transpose(0, 2, 3, 1), t2, 2,
                                         m2.transpose(0, 2, 3, 1)))
    assert np.isclose(ours2, r2, rtol=1e-5), (ours2, r2)


def test_metrics_match_reference_module():
    import torch
    sys.path.insert(0, REF)
    try:
        from utils import metrics as ref_metrics
    finally:
        sys.path.remove(REF)
    from ust_run_tpu.utils import metrics as M

    rng = np.random.RandomState(6)
    pred = (rng.rand(3, 2, 16, 16) > 0.5)
    gt = torch.from_numpy((rng.rand(3, 2, 16, 16) > 0.5).astype(np.float32))
    ref = ref_metrics.dice_coeff_2label(np.asarray(pred), gt)
    ours = M.dice_coeff_2label_np(pred, gt.numpy())
    np.testing.assert_allclose(ours, ref, rtol=1e-12)

    ref_arr = ref_metrics.dice_coeff(np.asarray(pred[:, 0]),
                                     gt[:, 0], ret_arr=True)
    ours_arr = M.dice_coeff_np(pred[:, 0], gt[:, 0].numpy(), ret_arr=True)
    np.testing.assert_allclose(ours_arr[0], ref_arr[0], rtol=1e-12)


def test_ramps_match_reference_module():
    sys.path.insert(0, REF)
    try:
        from utils import ramps as ref_ramps
    finally:
        sys.path.remove(REF)
    from ust_run_tpu.utils import ramps as R
    for cur in (0, 13, 50, 199, 200, 500):
        assert R.sigmoid_rampup(cur, 200) == ref_ramps.sigmoid_rampup(cur, 200)


def test_dsbn_matches_reference_module():
    import torch
    sys.path.insert(0, REF)
    try:
        from networks.dsbn import DomainSpecificBatchNorm2d as TorchDSBN
    finally:
        sys.path.remove(REF)
    import jax

    from ust_run_tpu.models.dsbn import DomainSpecificBatchNorm2d

    rng = np.random.RandomState(7)
    c, d = 5, 3
    x = rng.randn(4, 8, 8, c).astype(np.float32)
    dl = np.asarray([1, 1, 1, 1])

    ours_mod = DomainSpecificBatchNorm2d(num_domains=d)
    v = ours_mod.init(jax.random.PRNGKey(0), x, dl, train=False)
    scale = rng.rand(d, c).astype(np.float32) + 0.5
    bias = rng.randn(d, c).astype(np.float32)
    v = {"params": {"scale": scale, "bias": bias},
         "batch_stats": v["batch_stats"]}
    ours, upd = ours_mod.apply(v, x, dl, train=True,
                               mutable=["batch_stats"])

    tref = TorchDSBN(c, num_domains=d)
    with torch.no_grad():
        for i, bn in enumerate(tref.bns):
            bn.weight.copy_(torch.from_numpy(scale[i]))
            bn.bias.copy_(torch.from_numpy(bias[i]))
    tref.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    theirs, _ = tref(xt, torch.from_numpy(dl))
    theirs = theirs.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4,
                               atol=2e-5)
    # only domain 1's running stats moved, and they match torch's
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["mean"][1]),
        tref.bns[1].running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"][0]),
                               0.0, atol=1e-7)


def test_grouped_bn_unequal_groups_match_sequential_applies():
    """The fused 6-group student call (5x B=4 + 1x B=1 LQ,
    semisup/step.py) must reproduce the separate sequential forwards it
    replaces (reference train.py:699-702, 740): identical normalized
    outputs per group and identical running-stat folds, including the
    group_valid=False case where the LQ forward 'never happened'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ust_run_tpu.models.unet import UNet

    rng = np.random.RandomState(3)
    model = UNet(n_channels=3, n_classes=2)
    x4a = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
    x4b = jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32)
    x1 = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x4a, train=False)

    # sequential: one 2-group call over [x4a; x4b], then a B=1 call
    lg_ab, upd1 = model.apply(v, jnp.concatenate([x4a, x4b]), train=True,
                              groups=2, mutable=["batch_stats"])
    lg_c, upd2 = model.apply(
        {"params": v["params"], "batch_stats": upd1["batch_stats"]},
        x1, train=True, groups=1, mutable=["batch_stats"])

    # fused with all groups valid
    lg_f, updf = model.apply(
        v, jnp.concatenate([x4a, x4b, x1]), train=True,
        group_sizes=(4, 4, 1),
        group_valid=jnp.asarray([True, True, True]),
        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(lg_f[:8]), np.asarray(lg_ab),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lg_f[8:]), np.asarray(lg_c),
                               rtol=1e-4, atol=1e-5)
    for (pa, sa), (pb, sb) in zip(
            jax.tree_util.tree_leaves_with_path(upd2["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(updf["batch_stats"])):
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sa),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))

    # fused with the LQ group invalid == the B=1 call never ran
    _, updi = model.apply(
        v, jnp.concatenate([x4a, x4b, x1]), train=True,
        group_sizes=(4, 4, 1),
        group_valid=jnp.asarray([True, True, False]),
        mutable=["batch_stats"])
    for (pa, sa), (pb, sb) in zip(
            jax.tree_util.tree_leaves_with_path(upd1["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(updi["batch_stats"])):
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sa),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))
