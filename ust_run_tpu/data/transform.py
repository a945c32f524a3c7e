"""Functional PIL-level transform library.

Capability parity with reference dataloaders/transform.py:8-102 (crop,
hflip, normalize, resize, blur, cutout) — used by the reference only
through its Cityscapes/GTAV SSDA path (dataloader.py:473-539). Host-side
PIL/numpy implementations; the training hot path uses the on-device
ops/augment.py stack instead.
"""

import random

import numpy as np
from PIL import Image, ImageFilter


def crop(img, mask, size):
    """Random crop with 255-padding on the mask (transform.py:8-21)."""
    w, h = img.size
    padw = size - w if w < size else 0
    padh = size - h if h < size else 0
    if padw > 0 or padh > 0:
        img_np = np.zeros((h + padh, w + padw) + (
            (3,) if img.mode == "RGB" else ()), np.uint8)
        img_np[:h, :w] = np.asarray(img)
        img = Image.fromarray(img_np)
        mask_np = np.full((h + padh, w + padw), 255, np.uint8)
        mask_np[:h, :w] = np.asarray(mask)
        mask = Image.fromarray(mask_np)
    w, h = img.size
    x = random.randint(0, w - size)
    y = random.randint(0, h - size)
    img = img.crop((x, y, x + size, y + size))
    mask = mask.crop((x, y, x + size, y + size))
    return img, mask


def hflip(img, mask, p=0.5):
    if random.random() < p:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    return img, mask


def normalize(img, mask=None):
    """ImageNet normalization to CHW float arrays (transform.py:38-52)."""
    img = np.asarray(img, np.float32) / 255.0
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    if img.ndim == 3:
        img = (img - mean) / std
        img = img.transpose(2, 0, 1)
    if mask is not None:
        return img, np.asarray(mask, np.int64)
    return img


def resize(img, mask, ratio_range):
    w, h = img.size
    long_side = random.randint(int(max(h, w) * ratio_range[0]),
                               int(max(h, w) * ratio_range[1]))
    if h > w:
        oh = long_side
        ow = int(1.0 * w * long_side / h + 0.5)
    else:
        ow = long_side
        oh = int(1.0 * h * long_side / w + 0.5)
    img = img.resize((ow, oh), Image.BILINEAR)
    mask = mask.resize((ow, oh), Image.NEAREST)
    return img, mask


def blur(img, p=0.5):
    if random.random() < p:
        sigma = np.random.uniform(0.1, 2.0)
        img = img.filter(ImageFilter.GaussianBlur(radius=sigma))
    return img


def cutout(img, mask, p=0.5, size_min=0.02, size_max=0.4, ratio_1=0.3,
           ratio_2=1 / 0.3, value_min=0, value_max=255, pixel_level=True):
    """Random erasing with the mask marked 255 (transform.py:66-102)."""
    if random.random() < p:
        img = np.asarray(img)
        mask = np.asarray(mask)
        img_h, img_w = img.shape[0], img.shape[1]
        while True:
            size = np.random.uniform(size_min, size_max) * img_h * img_w
            ratio = np.random.uniform(ratio_1, ratio_2)
            erase_w = int(np.sqrt(size / ratio))
            erase_h = int(np.sqrt(size * ratio))
            x = np.random.randint(0, img_w)
            y = np.random.randint(0, img_h)
            if x + erase_w <= img_w and y + erase_h <= img_h:
                break
        if pixel_level:
            shape = (erase_h, erase_w) + (
                (img.shape[2],) if img.ndim == 3 else ())
            value = np.random.uniform(value_min, value_max, shape)
        else:
            value = np.random.uniform(value_min, value_max)
        img = img.copy()
        mask = mask.copy()
        img[y:y + erase_h, x:x + erase_w] = value
        mask[y:y + erase_h, x:x + erase_w] = 255
        img = Image.fromarray(img.astype(np.uint8))
        mask = Image.fromarray(mask.astype(np.uint8))
    return img, mask
