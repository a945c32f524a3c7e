import math

import numpy as np

from ust_run_tpu.utils import ramps


def test_sigmoid_rampup_golden():
    # golden values from the reference formula exp(-5 (1 - t)^2)
    # (reference utils/ramps.py:19-26)
    assert ramps.sigmoid_rampup(0, 200) == math.exp(-5.0)
    assert ramps.sigmoid_rampup(200, 200) == 1.0
    assert ramps.sigmoid_rampup(400, 200) == 1.0  # clipped
    t = 50 / 200
    assert np.isclose(ramps.sigmoid_rampup(50, 200),
                      math.exp(-5 * (1 - t) ** 2))
    assert ramps.sigmoid_rampup(123, 0) == 1.0


def test_linear_rampup():
    assert ramps.linear_rampup(0, 10) == 0.0
    assert ramps.linear_rampup(5, 10) == 0.5
    assert ramps.linear_rampup(20, 10) == 1.0
    assert ramps.linear_rampup(3, 0) == 1.0


def test_cosine_rampdown():
    assert np.isclose(ramps.cosine_rampdown(0, 10), 1.0)
    assert np.isclose(ramps.cosine_rampdown(10, 10), 0.0)
    assert np.isclose(ramps.cosine_rampdown(5, 10), 0.5)


def test_consistency_weight_staircase():
    # reference train.py:819-820: iter // (max_iter / rampup) floor-divides
    # floats, producing a staircase. fundus: max_iter 30000, rampup 200.
    w0 = ramps.consistency_weight(1.0, 0, 30000, 200.0)
    w149 = ramps.consistency_weight(1.0, 149, 30000, 200.0)
    w150 = ramps.consistency_weight(1.0, 150, 30000, 200.0)
    assert np.isclose(float(w0), math.exp(-5.0))
    assert np.isclose(float(w149), float(w0))  # same stair
    assert float(w150) > float(w149)
    assert np.isclose(float(ramps.consistency_weight(1.0, 30000, 30000, 200.0)), 1.0)
