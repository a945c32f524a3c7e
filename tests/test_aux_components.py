import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

from ust_run_tpu.data import dl_utils, transform
from ust_run_tpu.utils import losses


def test_focal_loss_matches_torch_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    t = rng.randint(0, 3, (2, 8, 8))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(t)
    logpt = F.log_softmax(xt, 1).gather(1, tt.unsqueeze(1))[:, 0]
    pt = logpt.exp()
    ref = float((-(1 - pt) ** 2 * logpt).mean())
    ours = float(losses.focal_loss(x, t, gamma=2.0))
    assert np.isclose(ours, ref, rtol=1e-4)


def test_softmax_dice_loss():
    rng = np.random.RandomState(1)
    a = rng.randn(2, 8, 8, 2).astype(np.float32)
    b = rng.randn(2, 8, 8, 2).astype(np.float32)
    sa = torch.softmax(torch.from_numpy(a), -1)
    sb = torch.softmax(torch.from_numpy(b), -1)
    ref = 0.0
    for c in range(2):
        inter = (sa[..., c] * sb[..., c]).sum()
        ref += 1 - (2 * inter + 1e-5) / (sa[..., c].sum()
                                         + sb[..., c].sum() + 1e-5)
    ref = float(ref / 2)
    assert np.isclose(float(losses.softmax_dice_loss(a, b)), ref, rtol=1e-4)


def test_post_processing_drops_small_components():
    m = np.zeros((32, 32), bool)
    m[2:20, 2:20] = True            # big blob (324 px)
    m[5:8, 5:8] = False             # hole -> should be filled
    m[28:30, 28:30] = True          # tiny blob (4 px < 20% of 324)
    out = dl_utils.post_processing(m)
    assert out[6, 6]                # hole filled
    assert not out[28, 28]          # small CC removed
    assert out[10, 10]


def test_segmap_roundtrip():
    lab = np.random.RandomState(0).randint(0, 19, (16, 16))
    rgb = dl_utils.decode_segmap(lab, "cityscapes")
    back = dl_utils.encode_segmap(rgb, "cityscapes")
    np.testing.assert_array_equal(back, lab)


def test_get_iou_and_dice():
    a = np.zeros((8, 8), int)
    b = np.zeros((8, 8), int)
    a[:4] = 1
    b[:4] = 1
    assert dl_utils.get_iou(a, b, 2) == 1.0
    assert dl_utils.get_dice(a == 1, b == 1) == 1.0
    assert np.isclose(dl_utils.lr_poly(0.03, 10, 100, 0.9),
                      0.03 * 0.9 ** 0.9)


def test_functional_transforms():
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (40, 60, 3), dtype=np.uint8))
    mask = Image.fromarray(np.random.RandomState(1).randint(
        0, 2, (40, 60), dtype=np.uint8) * 255)
    ci, cm = transform.crop(img, mask, 64)  # pad-then-crop path
    assert ci.size == (64, 64) and cm.size == (64, 64)
    ri, rm = transform.resize(img, mask, (0.5, 2.0))
    assert ri.size == rm.size
    n_img, n_mask = transform.normalize(img, mask)
    assert n_img.shape == (3, 40, 60)       # CHW
    assert n_mask.dtype == np.int64
    bi = transform.blur(img, p=1.0)
    assert bi.size == img.size
    co_i, co_m = transform.cutout(img, mask, p=1.0)
    assert np.asarray(co_m).max() == 255
