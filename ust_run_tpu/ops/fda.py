"""Fourier domain adaptation (FDA), fully on-device.

The reference performs FDA per-sample on CPU with numpy FFTs every
training step (train.py:158-207, applied at :629-636), forcing a
GPU->CPU->GPU round trip in the hot loop. Here the identical math runs as
batched jnp.fft inside the jitted train step on TPU.

Semantics (train.py:166-185): swap the center (2b+1)^2 block of the
fftshifted amplitude spectrum, b = floor(min(H,W)*L), blending source and
target amplitudes with a per-sample ratio ~ U(0, degree); recombine with
the source phase and take the real part of the inverse FFT.
"""

import functools

import jax
import jax.numpy as jnp


def extract_amp(img):
    """Amplitude spectrum over the spatial axes of (..., H, W, C) NHWC
    images (train.py:158-164 operates CHW; axes differ, math identical)."""
    fft = jnp.fft.fft2(img, axes=(-3, -2))
    return jnp.abs(fft)


def _mutate_amp(amp_src, amp_trg, ratio, b):
    """Blend the centered low-frequency block (train.py:166-185)."""
    h, w = amp_src.shape[-3], amp_src.shape[-2]
    a_src = jnp.fft.fftshift(amp_src, axes=(-3, -2))
    a_trg = jnp.fft.fftshift(amp_trg, axes=(-3, -2))
    c_h, c_w = h // 2, w // 2
    h1, h2 = c_h - b, c_h + b + 1
    w1, w2 = c_w - b, c_w + b + 1
    block = a_src[..., h1:h2, w1:w2, :] * (1 - ratio) \
        + a_trg[..., h1:h2, w1:w2, :] * ratio
    a_src = a_src.at[..., h1:h2, w1:w2, :].set(block)
    return jnp.fft.ifftshift(a_src, axes=(-3, -2))


def source_to_target(src_img, amp_trg, ratio, L):
    """One image restyled toward a target amplitude (train.py:187-207).

    src_img: (H,W,C) in [0,255]; amp_trg: (H,W,C); ratio: scalar in [0,degree].
    """
    h, w = src_img.shape[0], src_img.shape[1]
    b = int(min(h, w) * L)  # static
    fft_src = jnp.fft.fft2(src_img, axes=(-3, -2))
    amp_src = jnp.abs(fft_src)
    pha_src = jnp.angle(fft_src)
    amp_new = _mutate_amp(amp_src, amp_trg, ratio, b)
    fft_new = amp_new * jnp.exp(1j * pha_src)
    out = jnp.real(jnp.fft.ifft2(fft_new, axes=(-3, -2)))
    return out


@functools.partial(jax.jit, static_argnames=("L",))
def fda_batch(key, src_imgs, trg_imgs, degree, L):
    """Restyle each src image toward the amplitude of the corresponding trg
    image (the reference pairs mix_img[i] with ulb_x_w[i], train.py:629-636).

    Inputs in [0,255] NHWC float; per-sample ratio ~ U(0, degree)
    (train.py:181). Output clipped to [0,255] (train.py:632).
    """
    bsz = src_imgs.shape[0]
    ratios = jax.random.uniform(key, (bsz,), jnp.float32) * degree
    amp_trg = extract_amp(trg_imgs)
    out = jax.vmap(lambda s, a, r: source_to_target(s, a, r, L))(
        src_imgs, amp_trg, ratios)
    return jnp.clip(out, 0.0, 255.0)
