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
    rng = np.random.default_rng(0)
    img = np.random.RandomState(0).randint(
        0, 255, (40, 60, 3), dtype=np.uint8)
    mask = np.random.RandomState(1).randint(
        0, 2, (40, 60), dtype=np.uint8) * 255
    ci, cm = transform.random_crop(rng, img, mask, 64)  # pad-then-crop
    assert ci.shape[:2] == (64, 64) and cm.shape == (64, 64)
    ri, rm = transform.random_scale(rng, img, mask, (0.5, 2.0))
    assert ri.shape[:2] == rm.shape
    n_img = transform.imagenet_normalize(img)
    assert n_img.shape == (3, 40, 60)       # CHW
    bi = transform.random_blur(rng, img, p=1.0)
    assert bi.shape == img.shape
    co_i, co_m = transform.random_cutout(rng, img, mask, p=1.0)
    assert co_m.max() == 255


def test_cross_entropy2d_matches_torch():
    """Vestigial 2-D CE (dataloaders/utils.py:128-144) vs the torch
    definition it transcribes."""
    import torch
    import torch.nn as nn

    from ust_run_tpu.data.dl_utils import cross_entropy2d

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 6, 5, 4).astype(np.float32)   # NHWC
    target = rng.randint(0, 4, (2, 6, 5)).astype(np.int64)
    target[0, 0, :2] = 255                              # ignored pixels

    crit = nn.CrossEntropyLoss(ignore_index=255, reduction="sum")
    t_loss = crit(torch.from_numpy(logits).permute(0, 3, 1, 2),
                  torch.from_numpy(target)) / (6 * 5) / 2
    ours = float(cross_entropy2d(logits, target))
    assert np.isclose(ours, float(t_loss), rtol=1e-5)


def test_contour_overlay_variants(tmp_path):
    from ust_run_tpu.utils import visualize as V

    img = np.zeros((16, 16), np.float32)
    img[4:12, 4:12] = 1.0
    pred = np.zeros((16, 16), np.uint8)
    pred[5:10, 5:10] = 1
    gt = np.zeros((16, 16), np.uint8)
    gt[6:11, 6:11] = 1

    canvas = np.zeros((16, 16, 3), np.uint8)
    out = V.draw_contour(canvas, pred, (0, 255, 0))
    assert (out == (0, 255, 0)).all(-1).any()           # contour drawn
    assert not (out[7, 7] == (0, 255, 0)).all()         # interior clean

    out2 = V.make_prediction(np.zeros((16, 16), np.uint8),
                             (pred, (0, 255, 0)), (gt, (255, 0, 0)))
    assert out2.shape == (16, 16, 3)

    path = tmp_path / "c.png"
    V.draw_contour_and_save(img, pred, gt, str(path))
    assert path.exists()


def test_windowed_best_avg_is_spike_robust():
    """VERDICT r3 item 5: the stabilized student metric must ignore
    single-eval collapses/spikes (the reference student's signature
    instability) while tracking the true plateau level."""
    import sys
    sys.path.insert(0, "tools")
    from parity_report import windowed_best_avg

    def recs(vals):
        return [{"model": "stu", "dice": {"p": v}} for v in vals]

    # a single-point spike to 0.99 must NOT set the best
    spiky = recs([0.50, 0.60, 0.99, 0.61, 0.62])
    assert abs(windowed_best_avg(spiky, "stu") - 0.62) < 1e-9
    # a single-point collapse must not drag the best down either
    collapse = recs([0.80, 0.82, 0.05, 0.83, 0.81])
    assert abs(windowed_best_avg(collapse, "stu") - 0.82) < 1e-9
    # monotone trajectories keep their max (last full window's median)
    mono = recs([0.1, 0.2, 0.3, 0.4, 0.5])
    assert abs(windowed_best_avg(mono, "stu") - 0.4) < 1e-9
    # short sequences fall back to the plain median
    assert abs(windowed_best_avg(recs([0.3, 0.7]), "stu") - 0.7) < 1e-9
