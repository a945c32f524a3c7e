"""The unused C6 augmentation surface (data/extra_transforms.py) —
distribution/shape/semantic checks against the reference definitions
(custom_transforms.py line refs in each class docstring)."""

import random

import numpy as np
import pytest
from PIL import Image

from ust_run_tpu.data import extra_transforms as X


def _sample(size=32, rgb=True):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (size, size, 3) if rgb else (size, size),
                      dtype=np.uint8)
    mask = rng.choice([0, 128, 255], (size, size)).astype(np.uint8)
    return {"image": Image.fromarray(img), "label": Image.fromarray(mask),
            "img_name": "t.png"}


def test_salt_pepper_counts():
    random.seed(3)
    np.random.seed(3)
    s = _sample()
    before = np.asarray(s["image"]).copy()
    for _ in range(20):
        s["image"] = Image.fromarray(before)
        out = X.add_salt_pepper_noise()(s)["image"]
        changed = (np.asarray(out) != before).any(axis=-1).sum()
        # amount=0.004 of HWC size, whole-pixel writes -> bounded count
        assert changed <= np.ceil(0.004 * before.size)


def test_adjust_light_is_gamma_lut():
    random.seed(1)  # first draw > 0.5 triggers the gamma branch
    s = _sample()
    before = np.asarray(s["image"]).astype(np.int32)
    out = np.asarray(X.adjust_light()(s)["image"]).astype(np.int32)
    # a LUT is monotone: pixel ordering by value is preserved
    assert out.shape == before.shape
    flat_b, flat_o = before.ravel(), out.ravel()
    order = np.argsort(flat_b, kind="stable")
    assert (np.diff(flat_o[order]) >= 0).all()


def test_eraser_and_cutout_regions():
    random.seed(0)
    np.random.seed(0)
    s = _sample()
    s["image"] = np.asarray(s["image"])  # eraser expects array input
    out = X.eraser()(s)
    assert np.asarray(out["image"]).shape == (32, 32, 3)

    random.seed(2)  # draw < 0.5 -> cutout applies
    s2 = _sample()
    out2 = X.cutout()(s2)
    m = np.asarray(out2["label"])
    img = np.asarray(out2["image"])
    assert (m == 255).any()
    assert img.shape == (32, 32, 3)


def test_flip_family_preserves_labels():
    s = _sample()
    labels_before = set(np.unique(np.asarray(s["label"])))
    out = X.RandomFlip()(dict(s))
    assert set(np.unique(np.asarray(out["label"]))) == labels_before
    out = X.RandomHorizontalFlip()(dict(s))
    assert set(np.unique(np.asarray(out["label"]))) == labels_before


def test_resize_crop_family_shapes():
    s = _sample(40)
    out = X.FixedResize((20, 24))(dict(s))
    assert out["image"].size == (24, 20)       # PIL (w, h)
    out = X.Scale(16)(dict(s))
    assert out["image"].size == (16, 16)
    out = X.CenterCrop(20)(dict(s))
    assert out["image"].size == (20, 20)
    out = X.RandomSizedCrop(24)(dict(s))
    assert out["image"].size == (24, 24)
    out = X.ResizeImg(12)(dict(s))
    assert out["image"].size == (12, 12)
    assert out["label"].size == (40, 40)       # label untouched (:551)
    out = X.Resize(12)(dict(s))
    assert out["label"].size == (12, 12)
    out = X.RandomRotate()(dict(s))
    assert out["image"].size == (40, 40)


def test_normalize_variants():
    s = _sample(8)
    a = X.Normalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))(dict(s))
    img = np.asarray(s["image"], np.float32)
    np.testing.assert_allclose(a["image"], (img / 255.0 - 0.5) / 0.5,
                               rtol=1e-6)
    b = X.Normalize_cityscapes(mean=(10.0, 10.0, 10.0))(dict(s))
    np.testing.assert_allclose(b["image"], (img - 10.0) / 255.0, rtol=1e-6)


def test_get_boundary_band():
    m = np.zeros((40, 40, 2), np.uint8)
    m[10:30, 10:30, 0] = 1
    m[15:25, 15:25, 1] = 1
    band = X.GetBoundary(width=2)(m)
    assert band.dtype == np.uint8
    assert band[10, 10] == 1        # on the cup contour
    assert band[20, 20] == 0        # deep inside both
    assert band[0, 0] == 0          # far outside


def test_soft_label_properties():
    random.seed(0)
    onehot = [0, 1, 0]
    out = X.SoftLable(list(onehot))
    assert 0.8 <= out[1] <= 1.0
    assert abs(sum(out) - 1.0) < 1e-9
    assert X.ToMultiLabel(2).tolist() == [0, 0, 1]


def test_reverse_aug_anticorrelated():
    random.seed(0)
    np.random.seed(0)
    img = Image.fromarray(np.full((16, 16, 3), 100, np.uint8))
    a, b = X.reverse_aug(3, 3, 0.5, 1.5)(img, img)
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    # brightness v on one, 2-v on the other: means move oppositely
    assert (a.mean() - 100) * (b.mean() - 100) <= 1e-6
