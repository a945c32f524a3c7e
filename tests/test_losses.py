"""Loss parity tests against torch golden values.

torch (CPU) is used only as an oracle to verify that our jnp losses
reproduce the reference's numerical behavior (BCEWithLogitsLoss /
CrossEntropyLoss reduction='none' + DiceLossWithMask semantics,
reference train.py:515-521, 816-838 and utils/losses.py:194-268).
"""

import numpy as np
import torch
import torch.nn.functional as F

from ust_run_tpu.utils import losses


def _soft_dice_torch(score, target, mask=None):
    # oracle implementing losses.py:215-234 semantics
    smooth = 1e-10
    score = score.double()
    target = target.double()
    if mask is not None:
        mask = mask.double()
        inter = (score * target * mask).sum()
        t = (target * target * mask).sum()
        s = (score * score * mask).sum()
    else:
        inter = (score * target).sum()
        t = (target * target).sum()
        s = (score * score).sum()
    return float(1 - (2 * inter + smooth) / (s + t + smooth))


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 2).astype(np.float32) * 3
    t = (rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32)
    ours = np.asarray(losses.bce_with_logits(x, t))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_softmax_ce_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 3).astype(np.float32) * 3
    t = rng.randint(0, 3, (2, 8, 8))
    ours = np.asarray(losses.softmax_ce(x, t))
    # torch CE expects NCHW logits
    ref = F.cross_entropy(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t), reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_dice_multilabel_matches_oracle():
    # fundus path: sigmoid + single global dice (losses.py:236-249)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 2).astype(np.float32)
    t = (rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32)
    m = (rng.rand(2, 8, 8, 2) > 0.3).astype(np.float32)
    probs = torch.sigmoid(torch.from_numpy(x))
    ref = _soft_dice_torch(probs, torch.from_numpy(t), torch.from_numpy(m))
    ours = float(losses.dice_loss_multilabel(x, t, m))
    assert np.isclose(ours, ref, rtol=1e-5)
    ref_nm = _soft_dice_torch(probs, torch.from_numpy(t))
    ours_nm = float(losses.dice_loss_multilabel(x, t))
    assert np.isclose(ours_nm, ref_nm, rtol=1e-5)


def test_dice_multiclass_class0_unmasked_quirk():
    # losses.py:207-213: _one_hot_mask_encoder leaves class 0 unmasked
    rng = np.random.RandomState(3)
    x = rng.randn(2, 8, 8, 2).astype(np.float32)
    t = rng.randint(0, 2, (2, 8, 8))
    m = (rng.rand(2, 8, 8, 1) > 0.4).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(x), dim=-1)
    tt = torch.from_numpy(t)
    mm = torch.from_numpy(m[..., 0])
    d0 = _soft_dice_torch(probs[..., 0], (tt == 0).float(), None)  # unmasked!
    d1 = _soft_dice_torch(probs[..., 1], (tt == 1).float(), mm)
    ref = (d0 + d1) / 2
    ours = float(losses.dice_loss_multiclass(x, t, 2, m))
    assert np.isclose(ours, ref, rtol=1e-5)


def test_masked_ce_mean_over_all_pixels():
    # reference reduction quirk (train.py:826-836): (ce * mask).mean()
    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 8, 2).astype(np.float32)
    t = rng.randint(0, 2, (2, 8, 8))
    m = np.zeros((2, 8, 8, 1), np.float32)
    m[0, :4] = 1.0
    ce = F.cross_entropy(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(t), reduction="none")
    ce_term = float((ce * torch.from_numpy(m[..., 0])).mean())
    probs = torch.softmax(torch.from_numpy(x), dim=-1)
    tt = torch.from_numpy(t)
    mm = torch.from_numpy(m[..., 0])
    d0 = _soft_dice_torch(probs[..., 0], (tt == 0).float(), None)
    d1 = _soft_dice_torch(probs[..., 1], (tt == 1).float(), mm)
    ref = ce_term + (d0 + d1) / 2
    ours = float(losses.ce_plus_dice(x, t, multilabel=False, n_classes=2, mask=m))
    assert np.isclose(ours, ref, rtol=1e-5)


def test_kl_and_mse_consistency_losses():
    rng = np.random.RandomState(5)
    a = rng.randn(2, 4, 4, 3).astype(np.float32)
    b = rng.randn(2, 4, 4, 3).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref_mse = ((torch.softmax(ta, -1) - torch.softmax(tb, -1)) ** 2).numpy()
    np.testing.assert_allclose(np.asarray(losses.softmax_mse_loss(a, b)),
                               ref_mse, rtol=1e-5, atol=1e-6)
    ref_kl = float(F.kl_div(F.log_softmax(ta, -1), torch.softmax(tb, -1),
                            reduction="mean"))
    assert np.isclose(float(losses.softmax_kl_loss(a, b)), ref_kl, rtol=1e-4)


def test_softmax_ce_one_hot_matches_take_along_axis():
    """r5: softmax_ce's class pick is a one-hot contraction (the
    take_along_axis form lowered to a ~5 ms/term scalar gather path on
    TPU — PERF.md). Pin bit-identity against the gather form."""
    import jax
    rng = np.random.RandomState(3)
    import jax.numpy as jnp
    for C in (2, 4):
        logits = jnp.asarray(rng.randn(2, 17, 17, C).astype(np.float32) * 30)
        tgt = jnp.asarray(rng.randint(0, C, (2, 17, 17)))
        ref = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1),
            tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
        new = losses.softmax_ce(logits, tgt)
        assert (np.asarray(ref) == np.asarray(new)).all()
