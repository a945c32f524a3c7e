"""Pallas TPU kernel: batched uniform random field generation.

The weak augmentation chain draws two (S,S) uniform fields per sample for
the elastic deformation (custom_transforms.py:224-225) — ~1M values per
training step at 256^2, which makes the counter-based threefry generator a
measurable slice of the fused step. This kernel uses the TPU's on-chip
PRNG (pltpu.prng_seed / prng_random_bits) to fill the fields at VPU rate.

Distribution: top-24-bit mantissa trick -> exact U[0, 1) on a 2^-24 grid,
statistically equivalent to the reference's np.random.rand draws (the
parity bar is distributional, not stream-identical — SURVEY.md §7).

Falls back to jax.random.uniform off-TPU (tests run on CPU).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(out_ref.shape[1:])
    # prng_random_bits yields SIGNED int32: `bits >> 8` would be an
    # arithmetic shift, mapping half the draws to (-2^7, 0) instead of
    # [0,1) — a logical shift keeps the top 24 bits as an unsigned
    # mantissa. (Caught on-chip: the arithmetic form made the elastic
    # displacement fields explode, blacking out every p=0.5-gated
    # sample; see STABILITY.md.)
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) \
        * (1.0 / (1 << 24))
    out_ref[0] = u


def _pallas_uniform(seed_scalar, n, size):
    seed_arr = jnp.asarray([seed_scalar], jnp.int32)
    return pl.pallas_call(
        _uniform_kernel,
        out_shape=jax.ShapeDtypeStruct((n, size, size), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, size, size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(seed_arr)


def _on_tpu():
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def uniform_batch(key, n, size):
    """(n, size, size) floats in [0,1), deterministic per key."""
    if _on_tpu():
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        return _pallas_uniform(seed, n, size)
    return jax.random.uniform(key, (n, size, size), jnp.float32)
