"""Round-trip: a reference torch UNet checkpoint imports into the Flax
model and produces identical predictions."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def test_torch_checkpoint_import_roundtrip(tmp_path):
    import torch
    sys.path.insert(0, REF)
    try:
        from networks.unet_model import UNet as TorchUNet
    finally:
        sys.path.remove(REF)
    import jax

    from ust_run_tpu.models import UNet
    from ust_run_tpu.utils.torch_import import load_torch_checkpoint

    tmodel = TorchUNet(n_channels=3, n_classes=2)
    # give the BN stats nontrivial values
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    path = tmp_path / "unet_avg_dice_best_model.pth"
    torch.save(tmodel.state_dict(), str(path))

    variables = load_torch_checkpoint(str(path))
    model = UNet(n_channels=3, n_classes=2)
    x = np.random.RandomState(0).randn(2, 48, 48, 3).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, x, train=False))

    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1),
                               rtol=2e-3, atol=2e-3)
