"""Cityscapes/GTAV semi-supervised domain adaptation dataset.

Capability parity with the reference's vestigial `SSDADataset`
(dataloaders/dataloader.py:473-539; constructed nowhere in the reference
but part of its surface): labeled = first `labeled_num` Cityscapes train
images + all GTAV images; unlabeled = remaining Cityscapes train images;
test = Cityscapes val list. GTAV label ids are remapped to the 19
Cityscapes train ids; unlabeled samples get a strong view (color jitter /
grayscale / blur).
"""

import os
import random
from glob import glob

import numpy as np
from PIL import Image

from ust_run_tpu.data import transform as T

ID_TO_TRAINID = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                 21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
                 28: 15, 31: 16, 32: 17, 33: 18}


def _color_jitter(img, brightness=0.5, contrast=0.5, saturation=0.5,
                  hue=0.25):
    """PIL-side color jitter approximating torchvision ColorJitter."""
    from PIL import ImageEnhance
    img = ImageEnhance.Brightness(img).enhance(
        1 + random.uniform(-brightness, brightness))
    img = ImageEnhance.Contrast(img).enhance(
        1 + random.uniform(-contrast, contrast))
    img = ImageEnhance.Color(img).enhance(
        1 + random.uniform(-saturation, saturation))
    if hue > 0:
        hsv = np.asarray(img.convert("HSV"), np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(random.uniform(-hue, hue) * 255)) \
            % 256
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


class SSDADataset:
    def __init__(self, mode, labeled_num, root="/data/DataSets/", size=512):
        self.root = root
        self.mode = mode
        self.labeled_num = labeled_num
        self.size = size
        if mode == "labeled":
            with open(os.path.join(root, "Cityscapes/train.list")) as f:
                self.path = f.read().splitlines()[:labeled_num]
            self.path += sorted(glob(os.path.join(root, "GTAV/images/*.png")))
        elif mode == "unlabeled":
            with open(os.path.join(root, "Cityscapes/train.list")) as f:
                self.path = f.read().splitlines()[labeled_num:]
        elif mode == "test":
            with open(os.path.join(root, "Cityscapes/val.list")) as f:
                self.path = f.read().splitlines()
        else:
            raise ValueError(mode)

    def __len__(self):
        return len(self.path)

    def _open(self, entry):
        if "GTAV" in entry:
            img = Image.open(entry)
            mask = Image.open(entry.replace("images", "labels"))
        else:
            img_p, mask_p = entry.split(" ")
            img = Image.open(os.path.join(self.root, "Cityscapes", img_p))
            mask = Image.open(os.path.join(self.root, "Cityscapes", mask_p))
        return img, mask

    def __getitem__(self, item):
        entry = self.path[item]
        s = self.size
        img, mask = self._open(entry)
        if self.mode == "test":
            img = img.resize((s, s), Image.BILINEAR)
            mask = mask.resize((s, s), Image.NEAREST)
            return (*T.normalize(img, mask), entry)
        img = img.resize((s, s), Image.BILINEAR)
        mask = mask.resize((s, s), Image.NEAREST)
        img, mask = T.resize(img, mask, (0.5, 2.0))
        img, mask = T.crop(img, mask, s)
        img, mask = T.hflip(img, mask, p=0.5)
        strong = img.copy()
        mask = np.asarray(mask)
        if "GTAV" in entry:
            remapped = np.full(mask.shape, 255, np.float32)
            for k, v in ID_TO_TRAINID.items():
                remapped[mask == k] = v
            mask = remapped
        img, mask = T.normalize(img, mask)
        if self.mode == "labeled":
            return img, mask, entry
        if random.random() < 0.8:
            strong = _color_jitter(strong)
        if random.random() < 0.2:
            strong = strong.convert("L").convert("RGB")
        strong = T.blur(strong, p=0.5)
        strong = T.normalize(strong)
        return img, strong, mask, entry
