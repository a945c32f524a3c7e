"""Coordinate-based image resampling primitives.

These are the device-side replacements for the PIL/scipy interpolation the
reference performs per-sample in DataLoader worker processes
(dataloaders/custom_transforms.py: PIL resize/rotate, scipy
map_coordinates at :197-256). A whole augmentation chain composes into one
coordinate map, so each image is resampled with a single vectorized gather
instead of four sequential CPU interpolations.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_gather(img, rows, cols):
    """Sample `img` (H,W,C) at fractional coordinates, bilinear, edge-clamped.

    rows/cols: float arrays of any matching shape -> output (*coords, C).

    Implemented as ONE patch gather fetching 2x2xC slices per coordinate
    (lax.gather with slice_sizes) instead of four independent 1-element
    taps: TPU gather throughput is per-row, so 4x-wider rows are ~4x
    faster (profiled: the tap gathers were the largest single cost of the
    fused train step).

    GRAYSCALE (C=1) is channel-padded to 4 before the gather and sliced
    back after: a (2,2,1) slice puts a degenerate size-1/size-2 extent in
    the minormost dims and XLA's TPU gather emitter collapses to a
    scalar path — measured 1.6 s for 8x288^2 images (the whole MNMS /
    prostate train step was ~17x slower than fundus before this).
    Padding to (2,2,4) u8 rows restores the vector emitter: 15.8 ms.
    Casting to f32 or dropping the channel dim entirely do NOT fix it
    (1.4 s / 1.6 s measured); 4 flat 1-element takes do (24 ms) but the
    padded patch gather is faster still. Values are bit-identical: the
    padded lanes are copies and are discarded.
    """
    h, w, c = img.shape
    if c == 1:
        img = jnp.concatenate([img] * 4, axis=-1)
    shape = rows.shape
    r0 = jnp.clip(jnp.floor(rows), 0, h - 2)
    c0 = jnp.clip(jnp.floor(cols), 0, w - 2)
    # clipped fractions reproduce edge-clamp semantics for out-of-range
    # coordinates (value saturates at the border pixel)
    fr = jnp.clip(rows - r0, 0.0, 1.0).reshape(-1, 1)
    fc = jnp.clip(cols - c0, 0.0, 1.0).reshape(-1, 1)
    starts = jnp.stack([r0.reshape(-1), c0.reshape(-1)],
                       axis=-1).astype(jnp.int32)
    # gather in the SOURCE dtype (uint8 corpus images: 4x less gather
    # traffic than pre-converted f32 — this gather is the single largest
    # op of the fused train step); interpolation happens in f32 after, so
    # results are bit-identical (uint8 -> f32 conversion is exact).
    # Do NOT "optimize" C=3 to an f32-sourced gather to save the
    # standalone u8->f32 convert of the patch tensor: measured −3.3%
    # end-to-end images/s (PERF.md dead-end table, r5 A/B 90.9 -> 87.7).
    patches = jax.lax.gather(
        img, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2, img.shape[-1]),
        mode=jax.lax.GatherScatterMode.CLIP)[..., :c]  # (N, 2, 2, C)
    # weighted sum of the four taps as ELEMENTWISE multiply-adds: unlike
    # the previous einsum (dot_general), this fuses with the u8->f32
    # convert of the gather output, so the 4x-wider f32 patch tensor is
    # never materialized in HBM (profiled: %convert of [N,2,2,C] was a
    # standalone 2.2 ms/step op in the fused train step).
    # slice the u8 taps FIRST, convert per-tap: the whole-tensor
    # `patches.astype(f32)` form let XLA materialize a 4x-wider f32
    # copy plus a layout transpose ahead of the tap slices (profiled
    # 2.16 + 1.42 ms/step in the r5 fundus trace); per-tap converts
    # fuse into the multiply-adds. Same ops, same order: bit-identical.
    p00 = patches[:, 0, 0, :].astype(jnp.float32)
    p01 = patches[:, 0, 1, :].astype(jnp.float32)
    p10 = patches[:, 1, 0, :].astype(jnp.float32)
    p11 = patches[:, 1, 1, :].astype(jnp.float32)
    top = p00 * (1 - fc) + p01 * fc
    bot = p10 * (1 - fc) + p11 * fc
    out = top * (1 - fr) + bot * fr
    return out.reshape(*shape, c)


def nearest_gather(img, rows, cols):
    """Sample `img` (H,W,C) at coordinates, nearest-neighbor, edge-clamped."""
    h, w, _ = img.shape
    r = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, w - 1)
    return jnp.take(img.reshape(h * w, -1), r * w + c, axis=0)


@functools.lru_cache(maxsize=None)
def _reflect_tap_matrices(size, ktaps):
    """Static (K, size, size) 0/1 tap matrices for a reflect-padded 1-D
    conv: tap t of output i reads source reflect(i + t - r)."""
    r = ktaps // 2
    m = np.zeros((ktaps, size, size), np.float32)
    for t in range(ktaps):
        j = np.arange(size) + t - r
        j = np.where(j < 0, -j, j)
        j = np.where(j >= size, 2 * size - 2 - j, j)
        m[t, np.arange(size), j] = 1.0
    return m  # numpy: safe to cache across traces


def separable_gaussian_blur(img, kernel):
    """Separable gaussian blur with reflect padding as two MXU matmuls.

    img: (H, W, C); kernel: (K,) normalized 1-D kernel (may be traced —
    per-sample sigma). Matches the reference's reflection-padded two-pass
    conv (custom_transforms.py:78-118: ReflectionPad2d(r) + blur_h +
    blur_v). The banded filter matrix is contracted from static tap
    matrices so the heavy work is dense matmul, not 1-channel conv.
    """
    h, w, c = img.shape
    assert h == w, "square images expected"
    taps = jnp.asarray(_reflect_tap_matrices(h, kernel.shape[0]))
    m = jnp.einsum("t,tij->ij", kernel, taps)
    rows = jnp.dot(m, img.reshape(h, w * c),
                   preferred_element_type=jnp.float32).reshape(h, w, c)
    return jnp.einsum("jw,iwc->ijc", m, rows)


def gaussian_kernel(sigma, radius):
    """exp(-x^2 / (2 sigma^2)) on [-radius, radius], normalized — the exact
    kernel construction of reference custom_transforms.py:103-106."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-jnp.square(x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)
