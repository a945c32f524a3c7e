"""Import reference PyTorch UNet checkpoints into the Flax model.

The reference ships/loads `unet_avg_dice_best_model.pth` torch state_dicts
(train.py:946-949, test.py:242) and full `checkpoint.pth` files
(util.py:259-273). This module converts those tensors into our Flax
parameter/batch-stats pytrees, so existing trained reference checkpoints
can be evaluated or fine-tuned on TPU directly.

Conventions (verified by the cross-framework parity tests in
tests/test_reference_parity.py):
  * conv kernels:  torch (out,in,kh,kw)  -> flax (kh,kw,in,out)
  * transpose-conv: torch (in,out,kh,kw) -> flax (kh,kw,in,out), spatially
    flipped
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

import numpy as np


def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _convT_w(t):
    return np.transpose(np.asarray(t), (2, 3, 0, 1))[::-1, ::-1].copy()


def _np(t):
    return np.asarray(t, dtype=np.float32)


def unet_from_torch_state_dict(sd):
    """torch UNet state_dict (reference networks/unet_model.py layout) ->
    {'params': ..., 'batch_stats': ...} for ust_run_tpu.models.UNet.

    Accepts a dict of torch tensors or numpy arrays keyed like
    `inc.double_conv.0.weight`, `down1.maxpool_conv.1.double_conv...`,
    `up1.up.weight`, `outc.conv.weight`.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    params = {}
    stats = {}

    def double_conv(prefix):
        p = {
            "Conv_0": {"kernel": _conv_w(sd[f"{prefix}.0.weight"])},
            "GroupedBatchNorm_0": {"scale": _np(sd[f"{prefix}.1.weight"]),
                                   "bias": _np(sd[f"{prefix}.1.bias"])},
            "Conv_1": {"kernel": _conv_w(sd[f"{prefix}.3.weight"])},
            "GroupedBatchNorm_1": {"scale": _np(sd[f"{prefix}.4.weight"]),
                                   "bias": _np(sd[f"{prefix}.4.bias"])},
        }
        s = {
            "GroupedBatchNorm_0": {
                "mean": _np(sd[f"{prefix}.1.running_mean"]),
                "var": _np(sd[f"{prefix}.1.running_var"])},
            "GroupedBatchNorm_1": {
                "mean": _np(sd[f"{prefix}.4.running_mean"]),
                "var": _np(sd[f"{prefix}.4.running_var"])},
        }
        return p, s

    params["inc"], stats["inc"] = double_conv("inc.double_conv")
    for i in range(1, 5):
        p, s = double_conv(f"down{i}.maxpool_conv.1.double_conv")
        params[f"down{i}"] = {"DoubleConv_0": p}
        stats[f"down{i}"] = {"DoubleConv_0": s}
    for i in range(1, 5):
        p, s = double_conv(f"up{i}.conv.double_conv")
        params[f"up{i}"] = {
            "DoubleConv_0": p,
            "ConvTranspose_0": {
                "kernel": _convT_w(sd[f"up{i}.up.weight"]),
                "bias": _np(sd[f"up{i}.up.bias"]),
            },
        }
        stats[f"up{i}"] = {"DoubleConv_0": s}
    params["outc"] = {"kernel": _conv_w(sd["outc.conv.weight"]),
                      "bias": _np(sd["outc.conv.bias"])}
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path, model="unet"):
    """Load a reference .pth file (torch serialization) and convert.

    Handles both the best-model form (bare state_dict) and the full
    checkpoint form (dict with 'state_dict'/'ema_state_dict',
    util.py:259-273). Returns {'params', 'batch_stats'} or, for full
    checkpoints, a dict with 'student'/'teacher' entries plus metadata.
    """
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    if model != "unet":
        raise NotImplementedError(model)
    if isinstance(payload, dict) and "state_dict" in payload:
        out = {
            "student": unet_from_torch_state_dict(payload["state_dict"]),
            "epoch": payload.get("epoch"),
            "best_dice": payload.get("best_dice"),
        }
        if "ema_state_dict" in payload:
            out["teacher"] = unet_from_torch_state_dict(
                payload["ema_state_dict"])
        return out
    return unet_from_torch_state_dict(payload)
