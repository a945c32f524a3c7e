"""Prediction overlays for --save_img (reference utils/util.py:299-390:
draw_contour / draw_mask_and_save used by test.py:110-113).

Re-imagined without cv2 dependence: per-part colored mask overlay plus a
1-pixel contour (mask XOR erosion), written as PNG via PIL.
"""

import os

import numpy as np
from PIL import Image
from scipy import ndimage

# one color per part (cup/disc, base, lv/myo/rv)
_COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]


def _contour(mask):
    er = ndimage.binary_erosion(mask, iterations=1)
    return mask & ~er


def overlay(image_u8, part_masks, alpha=0.35):
    """image_u8: (H,W,C) uint8; part_masks: (H,W,P) bool. Returns RGB."""
    img = image_u8
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    out = img.astype(np.float32)
    for i in range(part_masks.shape[-1]):
        m = part_masks[..., i].astype(bool)
        color = np.asarray(_COLORS[i % len(_COLORS)], np.float32)
        out[m] = (1 - alpha) * out[m] + alpha * color
        out[_contour(m)] = color
    return out.clip(0, 255).astype(np.uint8)


def draw_mask_and_save(image_u8, pred_parts, gt_parts, out_dir, name):
    """Save side-by-side prediction/ground-truth overlays."""
    os.makedirs(out_dir, exist_ok=True)
    pred_img = overlay(image_u8, pred_parts)
    gt_img = overlay(image_u8, gt_parts)
    combo = np.concatenate([pred_img, gt_img], axis=1)
    Image.fromarray(combo).save(os.path.join(out_dir, name))
