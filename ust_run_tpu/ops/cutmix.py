"""CutMix box machinery, fixed-shape and on-device.

Reference: `obtain_cutmix_box` (train.py:222-240) rejection-samples a box
of area U(0.02,0.4)*S^2 with aspect ratio U(0.3, 1/0.3) fully inside the
image; `obtain_all_cover_box` (train.py:242-251) returns the bounding box
of a foreground region, falling back to a forced cutmix box when the
region is empty. Both are reproduced with jax.random + lax.while_loop so
they live inside the jitted train step (the reference computes them on
host/GPU with a python loop every iteration).
"""

import functools

import jax
import jax.numpy as jnp


def _box_mask(size, y, x, h, w):
    """mask[y:y+h, x:x+w] = 1 via iota comparisons."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return (((rows >= y) & (rows < y + h) &
             (cols >= x) & (cols < x + w)).astype(jnp.float32))


def cutmix_box(key, size, p=0.5, size_min=0.02, size_max=0.4,
               ratio_1=0.3, ratio_2=1 / 0.3):
    """One (size,size) {0,1} box mask, exactly the reference's rejection
    sampling (train.py:222-240): area drawn once, (ratio, x, y) redrawn
    until the box fits."""
    k_p, k_size, k_loop = jax.random.split(key, 3)
    skip = jax.random.uniform(k_p) > p
    area = jax.random.uniform(k_size, (), jnp.float32, size_min, size_max) \
        * size * size

    def draw(k):
        k1, k2, k3, k_next = jax.random.split(k, 4)
        ratio = jax.random.uniform(k1, (), jnp.float32, ratio_1, ratio_2)
        w = jnp.floor(jnp.sqrt(area / ratio)).astype(jnp.int32)
        h = jnp.floor(jnp.sqrt(area * ratio)).astype(jnp.int32)
        x = jax.random.randint(k2, (), 0, size)  # np.random.randint: [0, S)
        y = jax.random.randint(k3, (), 0, size)
        return k_next, w, h, x, y

    def cond(carry):
        _, w, h, x, y = carry
        return ~((x + w <= size) & (y + h <= size))

    def body(carry):
        k = carry[0]
        return draw(k)

    init = draw(k_loop)
    _, w, h, x, y = jax.lax.while_loop(cond, body, init)
    mask = _box_mask(size, y, x, h, w)
    return jnp.where(skip, jnp.zeros_like(mask), mask)


@functools.partial(jax.jit, static_argnames=("n", "size", "p"))
def cutmix_boxes(key, n, size, p):
    """Stack of n independent boxes (train.py:639)."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: cutmix_box(k, size, p))(keys)


def all_cover_box(key, region):
    """Bounding box of the nonzero region; forced cutmix box if empty
    (train.py:242-251). region: (S,S) float/bool."""
    s = region.shape[0]
    nz = region > 0
    any_nz = jnp.any(nz)
    rows = jnp.any(nz, axis=1)
    cols = jnp.any(nz, axis=0)
    y1 = jnp.argmax(rows)
    y2 = s - 1 - jnp.argmax(rows[::-1])
    x1 = jnp.argmax(cols)
    x2 = s - 1 - jnp.argmax(cols[::-1])
    bbox = _box_mask(s, y1, x1, y2 - y1 + 1, x2 - x1 + 1)
    fallback = cutmix_box(key, s, p=1.0)
    return jnp.where(any_nz, bbox, fallback)
