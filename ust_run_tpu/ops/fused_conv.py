"""Pallas TPU kernel: BN-apply + ReLU fused into a 3x3 conv, with a
per-sample moment epilogue.

Target: the interior boundary of every DoubleConv (reference
unet_parts.py:8-25 — conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> ReLU).
XLA compiles that boundary as [BN-apply+ReLU pass over y1] -> [conv2]
with the normalized activation `a1` materialized in HBM between them:
at level 1 of the U-Net (bf16[21,256,256,64]) that is an extra 176 MB
write + 176 MB read per DoubleConv per step on an HBM-bound graph
(PERF.md §bucket table). This kernel computes

    out = conv3x3_same(relu(y * inv - shift), w)
    m1, m2 = per-sample mean / mean-square of `out`   (f32)

in ONE pass: y is read once from HBM, `a = relu(y*inv-shift)` lives
only in VMEM, and the conv accumulates in f32 on the MXU. The moment
epilogue feeds GroupedBatchNorm's group-average stage (models/layers.py
:119-133) so the NEXT BN's statistics also come for free with the conv
write-out, mirroring the kOutput stat-epilogue fusions XLA performs on
its own convs.

Layout/design notes (see /opt/skills/guides/pallas_guide.md):
  * grid = (B, H // R): one sample x one R-row output block per step;
    the last grid dim iterates fastest, so the (1, Co) moment
    accumulator block for sample b stays VMEM-resident across its row
    blocks (init at i==0, accumulate, auto-flushed at b+1).
  * y stays in HBM (pl.ANY); each step DMAs the R interior rows plus
    two single-row halos (zeroed at the image edge) into a VMEM slab.
    Blocked in_specs cannot express overlapping (halo) reads, and the
    clamped 3-block trick would fetch 3x the bytes.
  * the slab is BN-applied in f32 and written into a (R+2, W+2, C)
    zero-edged scratch so all nine 3x3 taps are static slices; each
    tap is an (R*W, C) @ (C, Co) MXU matmul accumulated in f32
    (preferred_element_type) — bf16 inputs, exactly the precision XLA
    uses for the amp conv (dtype=bf16, f32 accumulation).

The kernel is numerically validated against the XLA chain in interpret
mode on CPU (tests/test_fused_conv.py) and benchmarked on-chip by
tools/bench_fused_conv.py; integration into the model is gated on that
measurement (PERF.md dead-end-table standard).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ust_run_tpu.ops.packing import pack_weights as _pack_weights


def _kernel(y_hbm, inv_ref, shift_ref, w_ref, out_ref, s1_ref, s2_ref,
            slab, apad, sems, *, R, W, C, H):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    # --- fetch: R interior rows + 2 halo rows (zero at image edges) ---
    body = pltpu.make_async_copy(
        y_hbm.at[b, pl.ds(i * R, R)], slab.at[pl.ds(1, R)], sems.at[0])
    body.start()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(y_hbm.at[b, pl.ds(i * R - 1, 1)],
                              slab.at[pl.ds(0, 1)], sems.at[1]).start()

    @pl.when(i < n_i - 1)
    def _():
        pltpu.make_async_copy(y_hbm.at[b, pl.ds(i * R + R, 1)],
                              slab.at[pl.ds(R + 1, 1)], sems.at[2]).start()

    body.wait()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(y_hbm.at[b, pl.ds(i * R - 1, 1)],
                              slab.at[pl.ds(0, 1)], sems.at[1]).wait()

    @pl.when(i < n_i - 1)
    def _():
        pltpu.make_async_copy(y_hbm.at[b, pl.ds(i * R + R, 1)],
                              slab.at[pl.ds(R + 1, 1)], sems.at[2]).wait()

    # --- BN-apply + ReLU in f32, into the zero-edged padded scratch ---
    inv = inv_ref[b].astype(jnp.float32)        # (C,)
    shift = shift_ref[b].astype(jnp.float32)    # (C,)
    a = jnp.maximum(slab[:].astype(jnp.float32) * inv - shift, 0.0)
    apad[:, 0:1, :] = jnp.zeros_like(apad[:, 0:1, :])
    apad[:, W + 1:W + 2, :] = jnp.zeros_like(apad[:, W + 1:W + 2, :])
    apad[:, 1:W + 1, :] = a.astype(apad.dtype)
    # 'same'-conv padding is zero in the POST-BN activation domain: the
    # synthetic -1 / H rows must be zeroed after the BN-apply (a raw
    # zero row would become relu(-shift) != 0). At i==0 / i==n-1 the
    # corresponding slab halo row was never DMA'd, so this also masks
    # stale VMEM.

    @pl.when(i == 0)
    def _():
        apad[0:1] = jnp.zeros_like(apad[0:1])

    @pl.when(i == n_i - 1)
    def _():
        apad[R + 1:R + 2] = jnp.zeros_like(apad[R + 1:R + 2])

    # --- nine-tap im2col matmul, f32 accumulation on the MXU ---
    co = w_ref.shape[-1]
    acc = jnp.zeros((R, W, co), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = apad[di:di + R, dj:dj + W, :]          # (R, W, C)
            acc = acc + jax.lax.dot_general(
                tap, w_ref[di * 3 + dj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    out_ref[0] = acc.astype(out_ref.dtype)

    # --- per-sample moment epilogue (feeds the next GroupedBatchNorm) ---
    # s1/s2 are full-(B, Co) VMEM blocks (constant index map keeps them
    # resident across the whole grid; a (1, Co) per-sample block would
    # violate Mosaic's sublane rule — second-to-last block dim must be
    # divisible by 8 or equal the array dim). Row b is initialized at
    # its own i==0 step, so no global zero-init pass is needed.
    s1 = jnp.sum(acc, axis=(0, 1))              # (Co,) f32
    s2 = jnp.sum(jnp.square(acc), axis=(0, 1))

    @pl.when(i == 0)
    def _():
        s1_ref[b] = s1
        s2_ref[b] = s2

    @pl.when(i > 0)
    def _():
        s1_ref[b] = s1_ref[b] + s1
        s2_ref[b] = s2_ref[b] + s2




@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def bn_relu_conv3x3(y, inv_n, shift_n, w, *, block_rows=32,
                    interpret=False):
    """out = conv3x3_same(relu(y * inv_n - shift_n), w), plus per-sample
    mean / mean-square moments of `out`.

    Args:
      y:       (B, H, W, C) raw pre-BN conv output (bf16 or f32).
      inv_n:   (B, C) f32 per-sample BN scale  (gamma * rsqrt(var+eps)).
      shift_n: (B, C) f32 per-sample BN shift  (mean * inv - beta).
      w:       (3, 3, C, Co) conv kernel (cast to y.dtype for the MXU).
      block_rows: output rows per grid step (must divide H).

    Returns:
      (out, m1, m2): out (B, H, W, Co) in y.dtype; m1/m2 (B, Co) f32
      per-sample mean and mean-of-square of out — the inputs to
      GroupedBatchNorm's group-average stage.

    Channel packing: Mosaic requires HBM slices to be whole 128-lane
    tiles, so a C<128 tensor (physically lane-padded in HBM) cannot be
    row-slab-DMA'd directly. We instead fold P = 128//C spatial columns
    into the channel dim — y.reshape(B, H, W/P, P*C), a contiguous
    view — and run the SAME kernel on the packed shape with banded
    packed weights (_pack_weights). Bonus: the MXU contraction width
    goes from C to 128, so the 64-channel U-Net levels run the matmuls
    at full systolic-array width instead of half.
    """
    B, H, W, C = y.shape
    co = w.shape[-1]
    R = block_rows
    assert H % R == 0, (H, R)

    P = 1
    if C < 128 and 128 % C == 0 and W % (128 // C) == 0:
        P = 128 // C
    if P > 1:
        y = jnp.reshape(y, (B, H, W // P, P * C))
        inv_n = jnp.tile(inv_n, (1, P))
        shift_n = jnp.tile(shift_n, (1, P))
        w = _pack_weights(w, P)
    Wp, Cp, cop = W // P, P * C, P * co
    wk = jnp.reshape(w.astype(y.dtype), (9, Cp, cop))

    grid = (B, H // R)
    out, s1, s2 = pl.pallas_call(
        functools.partial(_kernel, R=R, W=Wp, C=Cp, H=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # y (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # inv_n (B,Cp)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # shift_n
            pl.BlockSpec(memory_space=pltpu.VMEM),              # weights
        ],
        out_specs=(
            pl.BlockSpec((1, R, Wp, cop), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, cop), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, cop), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Wp, cop), y.dtype),
            jax.ShapeDtypeStruct((B, cop), jnp.float32),
            jax.ShapeDtypeStruct((B, cop), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2, Wp, Cp), y.dtype),         # halo slab
            pltpu.VMEM((R + 2, Wp + 2, Cp), y.dtype),     # padded relu(bn)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(y, inv_n, shift_n, wk)
    hw = jnp.float32(H * W)
    if P > 1:
        out = jnp.reshape(out, (B, H, W, co))
        s1 = jnp.sum(jnp.reshape(s1, (B, P, co)), axis=1)
        s2 = jnp.sum(jnp.reshape(s2, (B, P, co)), axis=1)
    return out, s1 / hw, s2 / hw


def xla_reference_chain(y, inv_n, shift_n, w):
    """The exact XLA op chain the kernel replaces (models/layers.py:
    135-148 apply + nn.Conv 3x3 + the per-sample moment stage at
    layers.py:119-120) — used for numerical validation and as the
    on-chip benchmark baseline."""
    a = jnp.maximum(
        y.astype(y.dtype) * inv_n[:, None, None, :].astype(y.dtype)
        - shift_n[:, None, None, :].astype(y.dtype), 0)
    out = jax.lax.conv_general_dilated(
        a, w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(y.dtype)
    m1 = jnp.mean(out, axis=(1, 2), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
    return out, m1, m2
