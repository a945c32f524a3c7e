"""Numerical validation of the fused BN+ReLU+conv3x3 Pallas kernel
(ops/fused_conv.py) against the exact XLA chain it replaces, in
interpret mode on CPU (small shapes — the interpreter is slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ust_run_tpu.ops.fused_conv import bn_relu_conv3x3, xla_reference_chain


def _mk(b, h, w, c, co, dtype, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    y = jax.random.normal(k[0], (b, h, w, c), jnp.float32).astype(dtype)
    inv = jax.random.uniform(k[1], (b, c), jnp.float32, 0.5, 1.5)
    shift = jax.random.normal(k[2], (b, c), jnp.float32) * 0.3
    wk = jax.random.normal(k[3], (3, 3, c, co), jnp.float32) * 0.1
    return y, inv, shift, wk


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 8), (1, 32, 24, 16, 8),
                                   (1, 16, 16, 64, 16)])  # P=2: the pack
                                   # factor the 64-ch U-Net levels use
def test_matches_xla_chain(dtype, shape):
    b, h, w, c, co = shape
    y, inv, shift, wk = _mk(b, h, w, c, co, dtype)
    out, m1, m2 = bn_relu_conv3x3(y, inv, shift, wk, block_rows=8,
                                  interpret=True)
    ref_out, ref_m1, ref_m2 = xla_reference_chain(y, inv, shift, wk)
    # The kernel applies BN in f32 and takes moments of the f32
    # accumulator (strictly more precise than the bf16 chain), so bf16
    # comparisons carry one-ulp-of-bf16 tolerances.
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_out, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(ref_m1), **tol)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(ref_m2), **tol)


def test_edge_rows_are_zero_padded():
    """The halo DMA must zero the synthetic -1 / H rows: compare against
    the XLA 'same' conv on an input whose content makes edge bleed
    obvious (all-ones)."""
    b, h, w, c, co = 1, 16, 16, 8, 8
    y = jnp.ones((b, h, w, c), jnp.float32)
    inv = jnp.ones((b, c), jnp.float32)
    shift = jnp.zeros((b, c), jnp.float32)
    wk = jnp.ones((3, 3, c, co), jnp.float32)
    out, _, _ = bn_relu_conv3x3(y, inv, shift, wk, block_rows=8,
                                interpret=True)
    ref_out, _, _ = xla_reference_chain(y, inv, shift, wk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-6)
    # corners see 4 taps * 8 ch, edges 6 * 8, interior 9 * 8
    assert np.asarray(out)[0, 0, 0, 0] == 4 * c
    assert np.asarray(out)[0, 0, 5, 0] == 6 * c
    assert np.asarray(out)[0, 5, 5, 0] == 9 * c
