"""Spatial-column channel packing (W-packing) for narrow-channel conv levels.

TPU vector lanes are 128 wide; a 64-channel NHWC tensor leaves the MXU
contracting at half width, which measures ~1.4-1.6x slower (fwd+bwd)
than the same bytes at 128 channels at the U-Net level-1 shape
(bf16[21,256,256,64]).  The fix is exact, not approximate: fold P
adjacent spatial columns into the channel dim — y.reshape(B, H, W/P,
P*C), a contiguous view — and rewrite each conv as a conv on the packed
layout whose weights are a banded block matrix over pack shifts.  Every
transform here is a linear re-indexing of the original kernel: the
packed op computes bit-for-bit the same contractions (plus explicit
multiplies by structural zeros, which are exact in floating point).

Used by `models/` for the U-Net's 64-channel level 1 (reference
networks/unet_parts.py:8-25 at 256-384 px) and by `ops/fused_conv.py`'s
Pallas kernel wrapper.
"""

import jax.numpy as jnp


def pack_weights(w, P):
    """Banded column-packing of a 3x3 HWIO kernel for stride-1 SAME conv.

    With P spatial columns folded into the channel dim (packed col u
    holds global cols P*u..P*u+P-1), the column-shift structure of the
    3x3 conv becomes a banded block matrix over pack-shifts
    s in {-1,0,1}: packed input block j_in of pack u+s contributes to
    packed output block j_out of pack u through the original tap
    K[dr, dw] with dw = P*s + j_in - j_out, kept iff |dw| <= 1.
    Returns (3, 3, P*C, P*Co): [row-tap dr, pack-shift s+1, ...].
    For P=1 this reduces exactly to the original (3, 3, C, Co)."""
    C, Co = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 3, P * C, P * Co), w.dtype)
    for s in (-1, 0, 1):
        for j_in in range(P):
            for j_out in range(P):
                dw = P * s + j_in - j_out
                if -1 <= dw <= 1:
                    wp = wp.at[:, s + 1,
                               j_in * C:(j_in + 1) * C,
                               j_out * Co:(j_out + 1) * Co].set(w[:, dw + 1])
    return wp


def pack2_weights_split(w, in_splits):
    """pack_weights(P=2) for an input that is a CONCAT of packed blocks.

    `in_splits` are the original channel widths of the concatenated
    inputs; the packed input layout is [a_col0, a_col1, b_col0, b_col1,
    ...] (each source packed independently, then concatenated), which is
    exactly what jnp.concatenate of two packed tensors produces."""
    parts, off = [], 0
    for c in in_splits:
        parts.append(pack_weights(w[:, :, off:off + c], 2))
        off += c
    assert off == w.shape[2], (in_splits, w.shape)
    return jnp.concatenate(parts, axis=2)


def pack2_stem_weights(w):
    """3x3 SAME conv from an UNPACKED input to a P=2 PACKED output.

    Expressed as a stride-(1,2) kernel-(3,4) conv with padding
    ((1,1),(1,2)): output pack u covers global cols {2u, 2u+1}; its
    window spans input cols 2u-1..2u+2 (positions t=0..3).  Block 0
    (global col 2u) uses taps t=0..2 = K[:, 0..2]; block 1 (global col
    2u+1) uses taps t=1..3 = K[:, 0..2] shifted right by one.
    Returns (3, 4, C, 2*Co)."""
    C, Co = w.shape[2], w.shape[3]
    wp = jnp.zeros((3, 4, C, 2 * Co), w.dtype)
    wp = wp.at[:, 0:3, :, :Co].set(w)
    wp = wp.at[:, 1:4, :, Co:].set(w)
    return wp


def pack2_convT_weights(w):
    """2x2 stride-2 VALID ConvTranspose -> H-only (2,1)-stride-(2,1)
    ConvTranspose with a P=2 packed output.

    lax.conv_transpose (flax default transpose_kernel=False) FLIPS the
    kernel spatially: out[2i+r, 2j+s] = x[i,j] . w[1-r, 1-s].  The
    packed form keeps the H flip in its own (2,1) transpose conv and
    bakes the W flip into the block layout: packed output block s must
    see w[:, 1-s].  Returns (2, 1, C, 2*Co)."""
    wt = jnp.concatenate([w[:, 1], w[:, 0]], axis=-1)   # (2, C, 2*Co)
    return wt[:, None]


def pack2_pointwise_weights(w):
    """1x1 conv on a P=2 packed tensor: block-diagonal (1,1,2C,2Co)."""
    C, Co = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 2 * C, 2 * Co), w.dtype)
    wp = wp.at[:, :, :C, :Co].set(w)
    wp = wp.at[:, :, C:, Co:].set(w)
    return wp
