"""Device-side weak/strong augmentation stack.

The reference runs its augmentations per-sample on CPU inside DataLoader
worker processes (dataloaders/custom_transforms.py, composed at
train.py:439-462):

  weak   = RandomScaleCrop(S)        (custom_transforms.py:529-550,311-344)
         -> RandomScaleRotate(+-20)  (custom_transforms.py:507-526)
         -> RandomHorizontalFlip     (custom_transforms.py:387-397)
         -> elastic_transform        (custom_transforms.py:197-256)
  strong = Brightness -> Contrast    (custom_transforms.py:60-76)
         -> GaussianBlur             (custom_transforms.py:78-118)
  norm   = x/127.5 - 1               (Normalize_tf, custom_transforms.py:650-684)

Here the whole weak chain composes into ONE coordinate map evaluated with a
single gather per image (bilinear) / per mask (nearest), vectorized over
the batch with vmap and fused into the jitted train step. Fill semantics
are reproduced: rotation fills the image with 0 and the mask with the
dataset `fillcolor`; elastic out-of-bounds fills the image with 0
(map_coordinates mode='constant') and clamps the mask (mode='nearest').

Equivalence is *statistical*, not RNG-stream-identical: the same
distributions, probabilities and interpolation orders, driven by
jax.random keys (SURVEY.md section 7, hard part 4).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ust_run_tpu.ops.resample import (bilinear_gather, gaussian_kernel,
                                      nearest_gather,
                                      separable_gaussian_blur)


def _u(key, lo=0.0, hi=1.0, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


@functools.lru_cache(maxsize=None)
def _gauss_band_matrix(size, sigma):
    """Dense (size,size) zero-padded 1-D gaussian filter matrix.

    A K-tap 1-D convolution on a length-`size` axis is a banded matmul;
    on TPU the dense matmul rides the MXU, far faster than a 1-channel
    conv (which lowers to the VPU). sigma is static (elastic uses
    sigma = 0.08*patch), so the matrix is a compile-time constant.
    """
    radius = int(4.0 * sigma + 0.5)  # scipy truncate=4.0
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-x * x / (2.0 * sigma * sigma))
    k = k / k.sum()
    m = np.zeros((size, size), np.float64)
    for t, kv in enumerate(k):
        off = t - radius
        idx = np.arange(max(0, -off), min(size, size - off))
        m[idx, idx + off] += kv  # zero padding: out-of-range taps dropped
    return m.astype(np.float32)  # numpy: safe to cache across traces


def gaussian_filter_constant(field, sigma):
    """scipy.ndimage.gaussian_filter(mode='constant', cval=0) equivalent
    for a 2-D field with STATIC sigma (used by elastic_transform,
    custom_transforms.py:224-225), expressed as two MXU matmuls."""
    size = field.shape[0]
    m = jnp.asarray(_gauss_band_matrix(size, float(sigma)))
    # rows: out[i,:] = sum_j m[i,j] field[j,:]; cols symmetric
    out = jnp.dot(m, field, preferred_element_type=jnp.float32)
    return jnp.dot(out, m.T, preferred_element_type=jnp.float32)


def weak_augment_sample(key, img, mask, dx, dy, *, size, fillcolor):
    """One sample through the composed weak chain.

    img: (S,S,C) uint8 or float32 in [0,255]; mask: (S,S,K) uint8 or
    float32 label values (uint8 keeps the gathers 4x cheaper); dx/dy:
    pre-smoothed elastic displacement fields (S,S) (drawn at batch
    level — see weak_augment_batch). Returns float32 (img', mask').
    """
    s = size
    keys = jax.random.split(key, 10)
    sf = jnp.float32(s)

    # --- RandomScaleCrop: p=0.5 upscale by U(1,1.5)^2 then random crop ---
    do_scale = _u(keys[0]) > 0.5
    w = jnp.where(do_scale,
                  jnp.floor(_u(keys[1], 1.0, 1.5) * sf), sf)
    h = jnp.where(do_scale,
                  jnp.floor(_u(keys[2], 1.0, 1.5) * sf), sf)
    # random.randint(0, w - S) is INCLUSIVE of the upper bound
    x1 = jnp.floor(_u(keys[3]) * (w - sf + 1.0))
    y1 = jnp.floor(_u(keys[4]) * (h - sf + 1.0))

    # --- RandomScaleRotate: p=0.5, integer degrees in [-20, 20] ---
    do_rot = _u(keys[5]) > 0.5
    deg = jax.random.randint(keys[6], (), -20, 21).astype(jnp.float32)
    theta = jnp.where(do_rot, deg * (math.pi / 180.0), 0.0)

    # --- RandomHorizontalFlip: p=0.5 ---
    do_flip = _u(keys[7]) > 0.5

    # --- elastic_transform: p=0.5; displacement = gauss(U(-1,1)) * 2S ---
    do_el = _u(keys[8]) > 0.5
    dx = jnp.where(do_el, dx, 0.0)
    dy = jnp.where(do_el, dy, 0.0)

    ii = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)  # row index
    jj = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)  # col index

    # Compose output->input coordinate maps, last stage first.
    # elastic (image: constant fill 0; mask: clamp)
    q_r = ii + dx
    q_c = jj + dy
    el_oob = (q_r < 0) | (q_r > sf - 1) | (q_c < 0) | (q_c > sf - 1)
    qm_r = jnp.clip(jnp.round(q_r), 0.0, sf - 1)
    qm_c = jnp.clip(jnp.round(q_c), 0.0, sf - 1)

    def chain(rr, cc):
        # flip
        cc = jnp.where(do_flip, sf - 1.0 - cc, cc)
        # inverse rotation about the image center
        ctr = (sf - 1.0) / 2.0
        cos_t = jnp.cos(theta)
        sin_t = jnp.sin(theta)
        rr_c = rr - ctr
        cc_c = cc - ctr
        r_r = cos_t * rr_c - sin_t * cc_c + ctr
        r_c = sin_t * rr_c + cos_t * cc_c + ctr
        rot_oob = ((r_r < -0.5) | (r_r > sf - 0.5) |
                   (r_c < -0.5) | (r_c > sf - 0.5))
        # scale-crop source coords (resize to (w,h) then crop at (x1,y1))
        s_r = (y1 + r_r + 0.5) * sf / h - 0.5
        s_c = (x1 + r_c + 0.5) * sf / w - 0.5
        return s_r, s_c, rot_oob

    s_r, s_c, rot_oob = chain(q_r, q_c)
    sm_r, sm_c, rot_oob_m = chain(qm_r, qm_c)

    img_v = bilinear_gather(img, s_r, s_c)
    img_out = jnp.where((el_oob | rot_oob)[..., None], 0.0, img_v)
    img_out = jnp.round(jnp.clip(img_out, 0.0, 255.0))

    mask_v = nearest_gather(mask, sm_r, sm_c).astype(jnp.float32)
    mask_out = jnp.where(rot_oob_m[..., None], jnp.float32(fillcolor), mask_v)
    return img_out, mask_out


def strong_augment_sample(key, img, *, min_v, max_v, blur_radius):
    """Brightness -> Contrast -> GaussianBlur on one (S,S,C) image in
    [0,255], with PIL-faithful uint8 rounding between stages."""
    k0, k1, k2 = jax.random.split(key, 3)

    # Brightness (custom_transforms.py:60-67): PIL enhance(v) = img * v
    v1 = min_v + (max_v - min_v) * _u(k0)
    img = jnp.round(jnp.clip(img * v1, 0.0, 255.0))

    # Contrast (custom_transforms.py:69-76): blend with the mean gray of
    # the L-converted image; PIL rounds the mean to int.
    v2 = min_v + (max_v - min_v) * _u(k1)
    if img.shape[-1] == 3:
        gray = jnp.floor((img[..., 0] * 299 + img[..., 1] * 587 +
                          img[..., 2] * 114) / 1000.0)
    else:
        gray = img[..., 0]
    mean = jnp.floor(jnp.mean(gray) + 0.5)
    img = jnp.round(jnp.clip(mean + v2 * (img - mean), 0.0, 255.0))

    # GaussianBlur (custom_transforms.py:78-118): sigma ~ U(0.1, 2),
    # separable conv with reflection padding, kernel size 2*radius+1.
    sigma = _u(k2, 0.1, 2.0)
    kern = gaussian_kernel(sigma, blur_radius)
    img = separable_gaussian_blur(img, kern)
    return jnp.round(jnp.clip(img, 0.0, 255.0))


def normalize(img):
    """Normalize_tf: x/127.5 - 1 (custom_transforms.py:650-684)."""
    return img / 127.5 - 1.0


def denormalize(img):
    """(x+1)*127.5 — used before FDA, train.py:630-631."""
    return (img + 1.0) * 127.5


@functools.partial(jax.jit, static_argnames=("size", "fillcolor"))
def weak_augment_batch(key, imgs, masks, size, fillcolor):
    """Batch weak augmentation. The elastic random fields are generated
    for the whole batch in one shot (Pallas on-chip PRNG on TPU,
    ops/pallas_rng.py) and smoothed as one batched banded matmul, then
    each sample composes its own coordinate map."""
    from ust_run_tpu.ops.pallas_rng import uniform_batch
    n = imgs.shape[0]
    # images gather in uint8 (4x less traffic; see bilinear_gather) but
    # the 1-channel label take is FASTER in f32 than u8 on TPU (u8
    # single-element rows hit the (4,1) packed tiling) — profiled.
    masks = masks.astype(jnp.float32)
    k_fields, k_samples = jax.random.split(key)
    raw = uniform_batch(k_fields, 2 * n, size) * 2.0 - 1.0
    m = jnp.asarray(_gauss_band_matrix(size, 0.08 * size))
    sm = jnp.einsum("ij,bjk->bik", m, raw, precision="highest")
    sm = jnp.einsum("bik,lk->bil", sm, m, precision="highest")
    alpha = 2.0 * size
    dx = sm[:n] * alpha
    dy = sm[n:] * alpha
    keys = jax.random.split(k_samples, n)
    return jax.vmap(
        lambda k, i, ms, a, b: weak_augment_sample(
            k, i, ms, a, b, size=size, fillcolor=fillcolor)
    )(keys, imgs, masks, dx, dy)


@functools.partial(jax.jit, static_argnames=("min_v", "max_v", "blur_radius"))
def strong_augment_batch(key, imgs, min_v, max_v, blur_radius):
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(
        lambda k, i: strong_augment_sample(k, i, min_v=min_v, max_v=max_v,
                                           blur_radius=blur_radius)
    )(keys, imgs)


def blur_radius_for(patch_size):
    """kernel_size=int(0.1*patch); radius=kernel//2 (train.py:456,
    custom_transforms.py:81-83)."""
    return int(0.1 * patch_size) // 2
