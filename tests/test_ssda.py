"""SSDA (Cityscapes/GTAV) path + array-native transform library, against
a synthetic fixture in the exact on-disk layout the reference's
SSDADataset expects (dataloader.py:473-539)."""

import os

import numpy as np
import pytest
from PIL import Image

from ust_run_tpu.data import transform as T
from ust_run_tpu.data.ssda import ID_TO_TRAINID, SSDADataset


@pytest.fixture(scope="module")
def city_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsets")
    rng = np.random.RandomState(0)
    cs = root / "Cityscapes"
    entries = {"train.list": [], "val.list": []}
    for lst, n in (("train.list", 4), ("val.list", 2)):
        for k in range(n):
            rel_img = f"imgs/{lst[:-5]}_{k}.png"
            rel_mask = f"gt/{lst[:-5]}_{k}.png"
            (cs / "imgs").mkdir(parents=True, exist_ok=True)
            (cs / "gt").mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
                            ).save(cs / rel_img)
            Image.fromarray(rng.randint(0, 19, (64, 96), dtype=np.uint8)
                            ).save(cs / rel_mask)
            entries[lst].append(f"{rel_img} {rel_mask}")
    for lst, lines in entries.items():
        (cs / lst).write_text("\n".join(lines) + "\n")
    g = root / "GTAV"
    (g / "images").mkdir(parents=True)
    (g / "labels").mkdir(parents=True)
    for k in range(2):
        Image.fromarray(rng.randint(0, 255, (48, 80, 3), dtype=np.uint8)
                        ).save(g / "images" / f"g{k}.png")
        raw = rng.choice(list(ID_TO_TRAINID) + [0, 1], (48, 80)
                         ).astype(np.uint8)
        Image.fromarray(raw).save(g / "labels" / f"g{k}.png")
    return str(root)


def test_labeled_mode_mixes_cityscapes_and_gtav(city_root):
    ds = SSDADataset("labeled", labeled_num=2, root=city_root, size=32)
    assert len(ds) == 4                    # 2 cityscapes + 2 GTAV
    img, mask, entry = ds[0]
    assert img.shape == (3, 32, 32) and img.dtype == np.float32
    assert mask.shape == (32, 32) and mask.dtype == np.int64
    # GTAV entries get the train-id remap: only train ids / ignore remain
    img, mask, entry = ds[3]
    assert "GTAV" in entry
    assert set(np.unique(mask)) <= set(range(19)) | {T.IGNORE_ID}


def test_unlabeled_mode_returns_strong_view(city_root):
    ds = SSDADataset("unlabeled", labeled_num=2, root=city_root, size=32)
    assert len(ds) == 2                    # remaining cityscapes
    img, strong, mask, entry = ds[0]
    assert img.shape == strong.shape == (3, 32, 32)
    assert not np.array_equal(img, strong)  # augmented differently


def test_test_mode_is_deterministic(city_root):
    ds = SSDADataset("test", labeled_num=0, root=city_root, size=32)
    assert len(ds) == 2
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_transform_properties():
    rng = np.random.default_rng(0)
    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    mask = np.arange(40 * 60, dtype=np.uint8).reshape(40, 60) % 19

    ci, cm = T.random_crop(rng, img, mask, 48)   # pads then crops
    assert ci.shape == (48, 48, 3) and cm.shape == (48, 48)
    assert T.IGNORE_ID in cm                     # padding marked ignored

    fi, fm = T.random_hflip(rng, img, mask, p=1.0)
    np.testing.assert_array_equal(fi[:, ::-1], img)
    np.testing.assert_array_equal(fm[:, ::-1], mask)

    si, sm = T.random_scale(rng, img, mask, (0.5, 2.0))
    assert abs(si.shape[1] / si.shape[0] - 60 / 40) < 0.1  # aspect kept
    assert set(np.unique(sm)) <= set(np.unique(mask))      # nearest-safe

    ei, em = T.random_cutout(rng, img, mask, p=1.0)
    assert (em == T.IGNORE_ID).any()
    assert ei.shape == img.shape

    n = T.imagenet_normalize(img)
    assert n.shape == (3, 40, 60)
    # spot-check the normalization formula on one pixel/channel
    expect = (img[0, 0, 0] / 255.0 - T.IMAGENET_MEAN[0]) / T.IMAGENET_STD[0]
    assert np.isclose(n[0, 0, 0], expect, rtol=1e-6)
