"""Boundary-metric engine tests: dc/jc/hd95/asd (utils/boundary.py, the
native EDT engine native/boundary.cc, and the medpy work-alike shim).

The reference computes these via medpy.metric.binary per sample per part
(train.py:306-325) with the empty-prediction => hd=asd=100 convention
(train.py:313-315). medpy is not installed here, so the oracles are:

  * hand-derived golden values on masks whose surface-distance multiset
    is known exactly (1-pixel-thick segments erode to themselves, so the
    distance set can be enumerated by hand and fed to np.percentile);
  * a brute-force O(N^2) pairwise-distance computation on random blobs,
    sharing only the *definition* (border = mask XOR erosion,
    connectivity-1) with the implementations under test;
  * cross-checks: native == scipy == medpy-shim on random masks.
"""

import numpy as np
import pytest
from scipy import ndimage

from ust_run_tpu.utils import boundary as B
from ust_run_tpu.utils import boundary_native as BN


def seg_mask(h, w, y, xs, xe):
    m = np.zeros((h, w), bool)
    m[y, xs:xe] = True
    return m


def brute_force_metrics(a, b):
    """Independent oracle: borders by definition, distances by brute
    force instead of an EDT."""
    foot = ndimage.generate_binary_structure(2, 1)
    ab = a ^ ndimage.binary_erosion(a, structure=foot)
    bb = b ^ ndimage.binary_erosion(b, structure=foot)
    pa = np.argwhere(ab).astype(float)
    pb = np.argwhere(bb).astype(float)
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    s_ab = d.min(axis=1)          # a-surface -> b-surface
    s_ba = d.min(axis=0)
    hd95 = np.percentile(np.hstack([s_ab, s_ba]), 95)
    return float(s_ab.mean()), float(hd95)


def random_blob(rng, size=48):
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = rng.randint(10, size - 10, 2)
    r = rng.uniform(4, 12)
    m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    # poke holes / roughen the boundary so borders are non-trivial
    noise = rng.rand(size, size) < 0.05
    return m ^ (m & noise)


def test_dc_jc_identical_and_disjoint():
    a = seg_mask(10, 10, 4, 2, 8)
    assert B.dc(a, a) == 1.0
    assert B.jc(a, a) == 1.0
    b = seg_mask(10, 10, 8, 2, 8)
    assert B.dc(a, b) == 0.0
    assert B.jc(a, b) == 0.0
    # half overlap: |A|=6 |B|=6 |A∩B|=3 -> dc 0.5, jc 1/3
    c = seg_mask(10, 10, 4, 5, 11)[:, :10]
    inter = (a & c).sum()
    assert B.dc(a, c) == pytest.approx(2 * inter / (a.sum() + c.sum()))
    assert B.jc(a, c) == pytest.approx(inter / (a | c).sum())


def test_dc_jc_empty_conventions():
    z = np.zeros((8, 8), bool)
    assert B.dc(z, z) == 0.0
    assert B.jc(z, z) == 0.0
    a = seg_mask(8, 8, 2, 2, 5)
    assert B.dc(a, z) == 0.0
    assert B.jc(z, a) == 0.0


def test_identical_masks_zero_distance():
    rng = np.random.RandomState(0)
    m = random_blob(rng)
    assert B.asd(m, m) == 0.0
    assert B.hd95(m, m) == 0.0
    assert B.hd(m, m) == 0.0


def test_single_pixels_exact_distance():
    a = np.zeros((20, 20), bool)
    b = np.zeros((20, 20), bool)
    a[3, 4] = True
    b[9, 12] = True            # distance sqrt(6^2 + 8^2) = 10
    assert B.asd(a, b) == pytest.approx(10.0)
    assert B.hd95(a, b) == pytest.approx(10.0)
    assert B.assd(a, b) == pytest.approx(10.0)


def test_hand_derived_segment_goldens():
    """1-pixel segments erode away entirely (connectivity-1 erosion with
    zero border), so surface == segment and the distance multiset is
    enumerable by hand: a = row y=0, x in [0,10); b = row y=3, x in
    [5,15). a->b: x>=5 -> 3; x<5 -> sqrt(9+(5-x)^2). b->a: x<=9 -> 3;
    x>9 -> sqrt(9+(x-9)^2)."""
    a = seg_mask(20, 20, 0, 0, 10)
    b = seg_mask(20, 20, 3, 5, 15)
    s_ab = [np.sqrt(9 + max(0, 5 - x) ** 2) for x in range(0, 10)]
    s_ba = [np.sqrt(9 + max(0, x - 9) ** 2) for x in range(5, 15)]
    assert B.asd(a, b) == pytest.approx(np.mean(s_ab))
    assert B.asd(b, a) == pytest.approx(np.mean(s_ba))
    # hd95 uses numpy's linear-interpolated percentile over the union
    assert B.hd95(a, b) == pytest.approx(
        np.percentile(np.hstack([s_ab, s_ba]), 95))
    assert B.hd(a, b) == pytest.approx(max(max(s_ab), max(s_ba)))


def test_empty_mask_raises():
    z = np.zeros((8, 8), bool)
    a = seg_mask(8, 8, 2, 2, 5)
    with pytest.raises(Exception):
        B.asd(z, a)
    with pytest.raises(Exception):
        B.hd95(a, z)


def test_scipy_matches_brute_force():
    rng = np.random.RandomState(1)
    for _ in range(8):
        a, b = random_blob(rng), random_blob(rng)
        asd_bf, hd95_bf = brute_force_metrics(a, b)
        assert B.asd(a, b) == pytest.approx(asd_bf, abs=1e-9)
        assert B.hd95(a, b) == pytest.approx(hd95_bf, abs=1e-9)


def test_medpy_shim_agrees_with_boundary():
    """The work-alike used to RUN the reference (tools/medpy_shim) and
    the framework's own engine must agree — a divergence would invalidate
    the parity comparison."""
    import sys
    sys.path.insert(0, "tools/medpy_shim")
    try:
        from medpy.metric import binary as ref
    finally:
        sys.path.pop(0)
    rng = np.random.RandomState(2)
    for _ in range(5):
        a, b = random_blob(rng), random_blob(rng)
        assert B.dc(a, b) == pytest.approx(ref.dc(a, b))
        assert B.jc(a, b) == pytest.approx(ref.jc(a, b))
        assert B.asd(a, b) == pytest.approx(ref.asd(a, b))
        assert B.hd95(a, b) == pytest.approx(ref.hd95(a, b))


def test_native_matches_scipy():
    """Property test: the C++ EDT engine reproduces the scipy fallback
    bit-for-bit-ish on random masks, including empty-mask NaNs."""
    if not BN.available():
        pytest.skip("no compiler for the native engine")
    rng = np.random.RandomState(3)
    for _ in range(10):
        a, b = random_blob(rng), random_blob(rng)
        d, j, h, s = BN.boundary_metrics(a, b)
        assert d == pytest.approx(B.dc(a, b), abs=1e-12)
        assert j == pytest.approx(B.jc(a, b), abs=1e-12)
        assert h == pytest.approx(B.hd95(a, b), abs=1e-9)
        assert s == pytest.approx(B.asd(a, b), abs=1e-9)
    # empty prediction -> NaN (evaluator maps it to 100, train.py:313-315)
    z = np.zeros((16, 16), bool)
    m = seg_mask(16, 16, 4, 2, 9)
    d, j, h, s = BN.boundary_metrics(z, m)
    assert d == 0.0 and j == 0.0
    assert np.isnan(h) and np.isnan(s)


def test_native_edge_touching_and_full_masks():
    if not BN.available():
        pytest.skip("no compiler for the native engine")
    # masks touching the array edge: erosion with zero border keeps the
    # edge pixels in the surface — both paths must agree
    a = np.zeros((12, 12), bool)
    a[0:5, 0:12] = True
    b = np.zeros((12, 12), bool)
    b[7:12, 0:12] = True
    d, j, h, s = BN.boundary_metrics(a, b)
    assert s == pytest.approx(B.asd(a, b), abs=1e-9)
    assert h == pytest.approx(B.hd95(a, b), abs=1e-9)
    full = np.ones((9, 9), bool)
    d, j, h, s = BN.boundary_metrics(full, full)
    assert d == 1.0 and j == 1.0 and h == 0.0 and s == 0.0
