"""Coordinate-based image resampling primitives.

These are the device-side replacements for the PIL/scipy interpolation the
reference performs per-sample in DataLoader worker processes
(dataloaders/custom_transforms.py: PIL resize/rotate, scipy
map_coordinates at :197-256). A whole augmentation chain composes into one
coordinate map, so each image is resampled with a single vectorized gather
instead of four sequential CPU interpolations.
"""

import jax.numpy as jnp


def bilinear_gather(img, rows, cols):
    """Sample `img` (H,W,C) at fractional coordinates, bilinear, edge-clamped.

    rows/cols: float arrays of any matching shape -> output (*coords, C).
    """
    h, w, _ = img.shape
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0 = jnp.clip(r0.astype(jnp.int32), 0, h - 1)
    c0 = jnp.clip(c0.astype(jnp.int32), 0, w - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)

    flat = img.reshape(h * w, -1)

    def tap(r, c):
        return jnp.take(flat, r * w + c, axis=0)

    fr = fr[..., None]
    fc = fc[..., None]
    top = tap(r0, c0) * (1 - fc) + tap(r0, c1) * fc
    bot = tap(r1, c0) * (1 - fc) + tap(r1, c1) * fc
    return top * (1 - fr) + bot * fr


def nearest_gather(img, rows, cols):
    """Sample `img` (H,W,C) at coordinates, nearest-neighbor, edge-clamped."""
    h, w, _ = img.shape
    r = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, h - 1)
    c = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, w - 1)
    return jnp.take(img.reshape(h * w, -1), r * w + c, axis=0)


def separable_gaussian_blur(img, kernel):
    """Depthwise separable gaussian blur with reflect padding.

    img: (H, W, C); kernel: (K,) normalized 1-D kernel. Matches the
    reference's reflection-padded two-pass conv (custom_transforms.py:78-118:
    ReflectionPad2d(r) + blur_h + blur_v).
    """
    k = kernel.shape[0]
    r = k // 2
    x = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    # horizontal then vertical 1-D convolutions via dot products over
    # shifted slices (K taps, unrolled; K is static and modest).
    h, w, c = img.shape
    out = jnp.zeros((h + 2 * r, w, c), img.dtype)
    for i in range(k):
        out = out + x[:, i:i + w, :] * kernel[i]
    out2 = jnp.zeros((h, w, c), img.dtype)
    for i in range(k):
        out2 = out2 + out[i:i + h, :, :] * kernel[i]
    return out2


def gaussian_kernel(sigma, radius):
    """exp(-x^2 / (2 sigma^2)) on [-radius, radius], normalized — the exact
    kernel construction of reference custom_transforms.py:103-106."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-jnp.square(x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)
