#!/usr/bin/env python
"""Produce a torchvision-format resnet50/resnet101 state_dict .pth for the
DeepLab pretrained-backbone path (VERDICT r3 item 6).

The reference loads `<pretrained_root>/<arch>.pth` unconditionally when
constructing DeepLabV2 (networks/backbone/resnet.py:185-190). No ImageNet
checkpoint is available in this zero-egress environment, so this tool
saves the reference backbone's own torch (Kaiming) initialization — the
exact tensor names/shapes torchvision's resnet50 produces — which proves
the import + overlay + train wiring end to end; swap in a real
torchvision ImageNet .pth outside this environment for accuracy gains.

Usage: python tools/make_backbone_pth.py <out_dir> [--arch resnet50]
"""

import argparse
import os
import sys

import torch

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--arch", default="resnet50",
                    choices=["resnet50", "resnet101"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    sys.path.insert(0, REF)
    try:
        from networks.backbone import resnet as ref_resnet
    finally:
        sys.path.pop(0)

    torch.manual_seed(args.seed)
    model = getattr(ref_resnet, args.arch)(pretrained=False)
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"{args.arch}.pth")
    torch.save(model.state_dict(), path)
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {path}: {len(model.state_dict())} tensors, "
          f"{n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
