"""Hyperparameter ramp schedules.

Capability parity with reference utils/ramps.py:19-41 (sigmoid_rampup,
linear_rampup, cosine_rampdown). Implemented as pure functions usable both
on host (python floats) and inside jit (jnp scalars).
"""

import jax.numpy as jnp
import numpy as np


def sigmoid_rampup(current, rampup_length):
    """exp(-5 (1 - t)^2) ramp, t = clip(current/rampup_length, 0, 1).

    Reference: utils/ramps.py:19-26; consumed for the consistency weight at
    train.py:82-84 and train.py:819-820.
    """
    if rampup_length == 0:
        return 1.0
    if isinstance(current, (int, float)) or isinstance(current, np.ndarray):
        current = float(np.clip(current, 0.0, rampup_length))
        phase = 1.0 - current / rampup_length
        return float(np.exp(-5.0 * phase * phase))
    current = jnp.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    """Linear 0->1 ramp. Reference: utils/ramps.py:29-35."""
    assert rampup_length >= 0
    if rampup_length == 0:
        return 1.0
    if isinstance(current, (int, float)):
        return 1.0 if current >= rampup_length else current / rampup_length
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    """Cosine 1->0 rampdown. Reference: utils/ramps.py:38-41."""
    if isinstance(current, (int, float)):
        return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1)


def consistency_weight(consistency, iter_num, max_iterations, rampup_length):
    """The exact consistency-weight computation of the reference hot loop.

    w = consistency * sigmoid_rampup(iter // (max_iter / rampup), rampup)
    Reference: train.py:819-820 (note the float floor-division producing a
    staircase schedule).
    """
    step = jnp.floor(iter_num / (max_iterations / rampup_length))
    return consistency * sigmoid_rampup(step, rampup_length)
