import numpy as np

from ust_run_tpu.utils import metrics


def test_dice_smoothing_constants():
    # (2*inter + 1.0) / (1.001 + a + b), reference utils/metrics.py:143
    seg = np.zeros((8, 8), bool)
    gt = np.zeros((8, 8), bool)
    seg[:4, :4] = True
    gt[:4, :4] = True
    d = metrics.dice_coefficient_np(seg, gt)
    assert np.isclose(d, (2 * 16 + 1.0) / (1.001 + 16 + 16))


def test_dice_empty_empty_is_zero():
    # reference utils/metrics.py:139-140
    assert metrics.dice_coefficient_np(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0
    # one-sided empty still uses smoothing
    gt = np.zeros((4, 4), bool)
    gt[0, 0] = True
    assert np.isclose(metrics.dice_coefficient_np(np.zeros((4, 4)), gt),
                      1.0 / (1.001 + 0 + 1))


def test_dice_coeff_batch_and_ret_arr():
    rng = np.random.RandomState(0)
    pred = rng.rand(3, 16, 16) > 0.5
    gt = rng.rand(3, 16, 16) > 0.5
    mean = metrics.dice_coeff_np(pred, gt)
    arr = metrics.dice_coeff_np(pred, gt, ret_arr=True)
    assert len(mean) == 1 and len(arr) == 1
    assert np.isclose(mean[0], arr[0].mean())


def test_jax_matches_numpy_binary():
    rng = np.random.RandomState(1)
    pred = rng.rand(5, 16, 16) > 0.5
    gt = rng.rand(5, 16, 16) > 0.3
    jx = np.asarray(metrics.dice_coeff_jax(pred, gt))
    ref = metrics.dice_coeff_np(pred, gt, ret_arr=True)[0]
    np.testing.assert_allclose(jx[0], ref, rtol=1e-6)


def test_jax_matches_numpy_2label():
    rng = np.random.RandomState(2)
    pred = rng.rand(4, 2, 16, 16) > 0.5     # NCHW like the reference
    gt = rng.rand(4, 2, 16, 16) > 0.5
    ref = metrics.dice_coeff_2label_np(pred, gt, ret_arr=True)
    # device version expects NHWC
    jx = np.asarray(metrics.dice_coeff_2label_jax(
        pred.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(jx[0], ref[0], rtol=1e-6)
    np.testing.assert_allclose(jx[1], ref[1], rtol=1e-6)


def test_jax_matches_numpy_3label():
    rng = np.random.RandomState(3)
    pred = rng.randint(0, 4, (4, 16, 16))
    gt = rng.randint(0, 4, (4, 16, 16))
    ref = metrics.dice_coeff_3label_np(pred, gt, ret_arr=True)
    jx = np.asarray(metrics.dice_coeff_3label_jax(pred, gt))
    for i in range(3):
        np.testing.assert_allclose(jx[i], ref[i], rtol=1e-6)


def test_jax_empty_empty():
    z = np.zeros((2, 8, 8), bool)
    assert np.all(np.asarray(metrics.dice_coeff_jax(z, z)) == 0.0)
