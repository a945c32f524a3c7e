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


_RESNET_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _bn(sd, prefix):
    p = {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])}
    s = {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])}
    return p, s


def resnet_from_torch_state_dict(sd, arch="resnet50"):
    """torch ResNet state_dict (reference networks/backbone/resnet.py
    layout — also the torchvision ImageNet .pth layout, which the
    reference loads with strict=False at resnet.py:185-190) ->
    {'params','batch_stats'} for ust_run_tpu.models.resnet.ResNet.
    Classifier-head keys (fc.*) present in ImageNet checkpoints are
    ignored, mirroring strict=False."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for stage, n_blocks in enumerate(_RESNET_LAYERS[arch], start=1):
        for i in range(n_blocks):
            t = f"layer{stage}.{i}"
            f = f"layer{stage}_{i}"
            p, s = {}, {}
            for j in (1, 2, 3):
                p[f"conv{j}"] = {"kernel": _conv_w(sd[f"{t}.conv{j}.weight"])}
                p[f"bn{j}"], s[f"bn{j}"] = _bn(sd, f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                p["ds_conv"] = {
                    "kernel": _conv_w(sd[f"{t}.downsample.0.weight"])}
                p["ds_bn"], s["ds_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f] = p
            stats[f] = s
    return {"params": params, "batch_stats": stats}


def deeplab_from_torch_state_dict(sd, arch="resnet50"):
    """torch DeepLabV2 state_dict (networks/deeplabv2.py: `backbone.*`
    + `classifier.{0..3}.*`) -> variables for models.DeepLabV2."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    bb = resnet_from_torch_state_dict(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, arch)
    params = {"backbone_net": bb["params"]}
    stats = {"backbone_net": bb["batch_stats"]}
    for idx, d in enumerate((6, 12, 18, 24)):
        params[f"aspp_{d}"] = {
            "kernel": _conv_w(sd[f"classifier.{idx}.weight"]),
            "bias": _np(sd[f"classifier.{idx}.bias"]),
        }
    return {"params": params, "batch_stats": stats}


def overlay_pretrained_backbone(variables, pth_path, arch):
    """Overlay ImageNet ResNet weights onto initialized DeepLabV2
    variables, reproducing the reference's pretrained init
    (base.py:10-12 -> resnet.py:185-190: backbone pretrained, head
    random). Returns new {'params','batch_stats'}."""
    import torch
    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "state_dict" in sd and not any("conv" in k for k in sd):
        sd = sd["state_dict"]
    bb = resnet_from_torch_state_dict(sd, arch)
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    params["backbone_net"] = bb["params"]
    stats["backbone_net"] = bb["batch_stats"]
    return {"params": params, "batch_stats": stats}


def _conv_pb(sd, prefix):
    p = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _norm_wrapped(sd, prefix):
    """Norm factory ('bn') -> our Norm module wrapping GroupedBatchNorm."""
    p, s = _bn(sd, prefix)
    return {"GroupedBatchNorm_0": p}, {"GroupedBatchNorm_0": s}


def unet2d_from_torch_state_dict(sd):
    """torch Unet2D / Unet2D_MT state_dict (reference networks/unet.py:
    168-246, norm='bn') -> variables for models.Unet2D / Unet2D_MT.
    Layout: convd{1..5}.{conv,bn}{1..3}, convu{4..1} (convu4 first=True
    has no conv1/bn1), seg1 [, rec1]."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    enc_p, enc_s, dec_p, dec_s = {}, {}, {}, {}
    for i in range(1, 6):
        p, s = {}, {}
        for j in (1, 2, 3):
            p[f"conv{j}"] = _conv_pb(sd, f"convd{i}.conv{j}")
            p[f"bn{j}"], s[f"bn{j}"] = _norm_wrapped(sd, f"convd{i}.bn{j}")
        enc_p[f"convd{i}"], enc_s[f"convd{i}"] = p, s
    for i in (4, 3, 2, 1):
        first = i == 4
        p, s = {}, {}
        for j in (1, 2, 3):
            if first and j == 1:
                continue
            p[f"conv{j}"] = _conv_pb(sd, f"convu{i}.conv{j}")
            p[f"bn{j}"], s[f"bn{j}"] = _norm_wrapped(sd, f"convu{i}.bn{j}")
        dec_p[f"convu{i}"], dec_s[f"convu{i}"] = p, s
    params = {"enc": enc_p, "dec": dec_p, "seg1": _conv_pb(sd, "seg1")}
    stats = {"enc": enc_s, "dec": dec_s}
    if "rec1.weight" in sd:
        params["rec1"] = _conv_pb(sd, "rec1")
    return {"params": params, "batch_stats": stats}


def wrn_from_torch_state_dict(sd, depth=28):
    """torch WideResNet state_dict (reference networks/wrn.py:8-119) ->
    variables for models.WideResNet. Layout: conv1,
    block{1..3}.layer.{i}.{bn1,conv1,bn2,conv2[,convShortcut]}, bn1, fc."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    n = (depth - 4) // 6
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    for b in (1, 2, 3):
        for i in range(n):
            t = f"block{b}.layer.{i}"
            f = f"block{b}_{i}"
            p, s = {}, {}
            p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
            p["conv1"] = {"kernel": _conv_w(sd[f"{t}.conv1.weight"])}
            p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
            p["conv2"] = {"kernel": _conv_w(sd[f"{t}.conv2.weight"])}
            if f"{t}.convShortcut.weight" in sd:
                p["convShortcut"] = {
                    "kernel": _conv_w(sd[f"{t}.convShortcut.weight"])}
            params[f], stats[f] = p, s
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    params["fc"] = {"kernel": _np(sd["fc.weight"]).T,
                    "bias": _np(sd["fc.bias"])}
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
    if model in ("deeplabv2", "deeplabv2_r50"):
        arch = "resnet50" if model.endswith("r50") else "resnet101"
        sd = payload.get("state_dict", payload)
        return deeplab_from_torch_state_dict(sd, arch)
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
