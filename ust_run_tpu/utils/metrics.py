"""Dice metrics.

Capability parity with reference utils/metrics.py:114-231. Two
implementations are provided:

  * host (`*_np`): numpy, bit-compatible with the reference formulas —
    used for the golden parity tests.
  * device (`*_jax`): jnp, identical formula evaluated on-TPU — used inside
    the jitted train step (per-sample hardness, train.py:705-710) and the
    evaluator so no host round-trip happens in the hot loop.

The reference smoothing convention (utils/metrics.py:139-143) is preserved
exactly: empty-prediction AND empty-ground-truth -> 0.0, otherwise
(2*intersection + 1.0) / (1.001 + |pred| + |gt|).
"""

import jax.numpy as jnp
import numpy as np


def dice_coefficient_np(binary_segmentation, binary_gt_label):
    """Smoothed Dice between two binary 2D maps (utils/metrics.py:114-146)."""
    seg = np.asarray(binary_segmentation, dtype=bool)
    gt = np.asarray(binary_gt_label, dtype=bool)
    inter = float(np.sum(np.logical_and(seg, gt)))
    seg_n = float(np.sum(seg))
    gt_n = float(np.sum(gt))
    if seg_n == 0 and gt_n == 0:
        return 0.0
    return (2 * inter + 1.0) / (1.001 + seg_n + gt_n)


def dice_coeff_np(pred, target, ret_arr=False):
    """Binary Dice over a batch (utils/metrics.py:149-174).

    pred/target: (H,W) or (B,H,W). Returns a 1-element list (one "part").
    """
    pred = np.asarray(pred)
    target = np.asarray(target)
    if pred.ndim == 2:
        return [dice_coefficient_np(pred, target)]
    all_dice = [dice_coefficient_np(pred[i], target[i]) for i in range(pred.shape[0])]
    if ret_arr:
        return [np.array(all_dice)]
    return [sum(all_dice) / len(all_dice)]


def dice_coeff_2label_np(pred, target, ret_arr=False):
    """Cup/disc two-plane Dice (utils/metrics.py:176-201).

    pred/target: (B,2,H,W) channel-first or (2,H,W).
    """
    pred = np.asarray(pred)
    target = np.asarray(target)
    if pred.ndim == 3:
        return [dice_coefficient_np(pred[0], target[0]),
                dice_coefficient_np(pred[1], target[1])]
    cup = [dice_coefficient_np(pred[i, 0], target[i, 0]) for i in range(pred.shape[0])]
    disc = [dice_coefficient_np(pred[i, 1], target[i, 1]) for i in range(pred.shape[0])]
    if ret_arr:
        return [np.array(cup), np.array(disc)]
    return [sum(cup) / len(cup), sum(disc) / len(disc)]


def dice_coeff_3label_np(pred, target, ret_arr=False):
    """LV/MYO/RV three-class Dice (utils/metrics.py:203-231).

    pred/target: (B,H,W) integer class maps with classes 1..3.
    """
    pred = np.asarray(pred)
    target = np.asarray(target)
    if pred.ndim == 2:
        return [dice_coefficient_np(pred == c, target == c) for c in (1, 2, 3)]
    parts = []
    for c in (1, 2, 3):
        parts.append([dice_coefficient_np(pred[i] == c, target[i] == c)
                      for i in range(pred.shape[0])])
    if ret_arr:
        return [np.array(p) for p in parts]
    return [sum(p) / len(p) for p in parts]


# ---------------------------------------------------------------------------
# Device-side (jnp) versions. Same formula; everything stays on-TPU.
# ---------------------------------------------------------------------------

def _dice_jax(seg, gt):
    """Per-map smoothed dice; seg/gt boolean-ish arrays of any matching shape,
    reduced over all axes except the leading batch axis."""
    seg = seg.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    axes = tuple(range(1, seg.ndim))
    inter = jnp.sum(seg * gt, axis=axes)
    seg_n = jnp.sum(seg, axis=axes)
    gt_n = jnp.sum(gt, axis=axes)
    dice = (2.0 * inter + 1.0) / (1.001 + seg_n + gt_n)
    both_empty = (seg_n == 0) & (gt_n == 0)
    return jnp.where(both_empty, 0.0, dice)


def dice_coeff_jax(pred, target):
    """Binary per-sample Dice. pred/target: (B,H,W). Returns (1,B)."""
    return _dice_jax(pred, target)[None, :]


def dice_coeff_2label_jax(pred, target):
    """Cup/disc per-sample Dice. pred/target: (B,H,W,2) NHWC. Returns (2,B)."""
    return jnp.stack([_dice_jax(pred[..., 0], target[..., 0]),
                      _dice_jax(pred[..., 1], target[..., 1])])


def dice_coeff_3label_jax(pred, target):
    """3-class per-sample Dice. pred/target: (B,H,W) int maps. Returns (3,B)."""
    return jnp.stack([_dice_jax(pred == c, target == c) for c in (1, 2, 3)])


def dice_per_part_jax(pred, target, n_part):
    """Dispatch on part count: 1 -> binary, 2 -> cup/disc planes, 3 -> classes.

    Mirrors the `dice_calcu` dispatch table at train.py:220 /
    train_mnms.py:208. Returns (n_part, B)."""
    if n_part == 1:
        return dice_coeff_jax(pred, target)
    if n_part == 2:
        return dice_coeff_2label_jax(pred, target)
    if n_part == 3:
        return dice_coeff_3label_jax(pred, target)
    raise ValueError(f"unsupported n_part={n_part}")
