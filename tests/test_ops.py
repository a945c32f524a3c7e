import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from ust_run_tpu.ops import augment, cutmix, fda
from ust_run_tpu.ops.resample import (bilinear_gather, gaussian_kernel,
                                      nearest_gather,
                                      separable_gaussian_blur)


def test_bilinear_gather_matches_map_coordinates():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 1).astype(np.float32) * 255
    rows = rng.uniform(0.5, 14.5, (8, 8)).astype(np.float32)
    cols = rng.uniform(0.5, 14.5, (8, 8)).astype(np.float32)
    ours = np.asarray(bilinear_gather(jnp.asarray(img), rows, cols))[..., 0]
    ref = ndi.map_coordinates(img[..., 0], [rows, cols], order=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_nearest_gather_matches_map_coordinates():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 1)).astype(np.float32)
    rows = rng.uniform(0, 15, (8, 8)).astype(np.float32)
    cols = rng.uniform(0, 15, (8, 8)).astype(np.float32)
    # avoid exact .5 ties (rounding convention differs)
    rows = np.where(np.abs(rows - np.round(rows)) < 1e-3, rows + 0.01, rows)
    cols = np.where(np.abs(cols - np.round(cols)) < 1e-3, cols + 0.01, cols)
    ours = np.asarray(nearest_gather(jnp.asarray(img), rows, cols))[..., 0]
    ref = ndi.map_coordinates(img[..., 0], [rows, cols], order=0,
                              mode="nearest")
    np.testing.assert_allclose(ours, ref)


def test_gaussian_filter_constant_matches_scipy():
    rng = np.random.RandomState(2)
    f = rng.rand(32, 32).astype(np.float32)
    sigma = 0.08 * 32
    ours = np.asarray(augment.gaussian_filter_constant(jnp.asarray(f), sigma))
    ref = ndi.gaussian_filter(f, sigma, mode="constant", cval=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_separable_blur_matches_scipy_reflect():
    rng = np.random.RandomState(3)
    img = rng.rand(32, 32, 3).astype(np.float32)
    kern = np.asarray(gaussian_kernel(jnp.float32(1.3), 5))
    ours = np.asarray(separable_gaussian_blur(jnp.asarray(img),
                                              jnp.asarray(kern)))
    # torch ReflectionPad == scipy mode='mirror'
    ref = np.stack([
        ndi.correlate1d(ndi.correlate1d(img[..., c], kern, axis=1,
                                        mode="mirror"),
                        kern, axis=0, mode="mirror")
        for c in range(3)], axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_weak_augment_preserves_label_set_and_shapes():
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(4)
    imgs = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.float32)
    masks = rng.choice([0.0, 128.0, 255.0], (4, 64, 64, 1)).astype(np.float32)
    out_i, out_m = augment.weak_augment_batch(key, jnp.asarray(imgs),
                                              jnp.asarray(masks), 64, 255)
    assert out_i.shape == imgs.shape and out_m.shape == masks.shape
    vals = np.unique(np.asarray(out_m))
    assert set(vals).issubset({0.0, 128.0, 255.0})
    oi = np.asarray(out_i)
    assert oi.min() >= 0 and oi.max() <= 255
    assert np.allclose(oi, np.round(oi))  # uint8-quantized
    # deterministic under the same key
    out_i2, _ = augment.weak_augment_batch(key, jnp.asarray(imgs),
                                           jnp.asarray(masks), 64, 255)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(out_i2))


def test_strong_augment_range_and_determinism():
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (4, 64, 64, 1)).astype(np.float32)
    out = augment.strong_augment_batch(key, jnp.asarray(imgs), 0.1, 2.0, 3)
    o = np.asarray(out)
    assert o.shape == imgs.shape
    assert o.min() >= 0 and o.max() <= 255
    out2 = augment.strong_augment_batch(key, jnp.asarray(imgs), 0.1, 2.0, 3)
    np.testing.assert_array_equal(o, np.asarray(out2))


def _fda_oracle(src, trg, L, ratio):
    """Reference formula (train.py:158-207) as a numpy oracle, CHW."""
    fft_src = np.fft.fft2(src, axes=(-2, -1))
    amp_src, pha_src = np.abs(fft_src), np.angle(fft_src)
    amp_trg = np.abs(np.fft.fft2(trg, axes=(-2, -1)))
    a_src = np.fft.fftshift(amp_src, axes=(-2, -1))
    a_trg = np.fft.fftshift(amp_trg, axes=(-2, -1))
    _, h, w = a_src.shape
    b = int(np.floor(min(h, w) * L))
    c_h, c_w = int(np.floor(h / 2)), int(np.floor(w / 2))
    h1, h2, w1, w2 = c_h - b, c_h + b + 1, c_w - b, c_w + b + 1
    a_src[:, h1:h2, w1:w2] = a_src[:, h1:h2, w1:w2] * (1 - ratio) \
        + a_trg[:, h1:h2, w1:w2] * ratio
    amp_new = np.fft.ifftshift(a_src, axes=(-2, -1))
    out = np.real(np.fft.ifft2(amp_new * np.exp(1j * pha_src),
                               axes=(-2, -1)))
    return out


def test_fda_matches_numpy_oracle():
    rng = np.random.RandomState(6)
    src = rng.rand(1, 32, 32, 3).astype(np.float32) * 255
    trg = rng.rand(1, 32, 32, 3).astype(np.float32) * 255
    ratio = 0.37
    amp_trg = fda.extract_amp(jnp.asarray(trg))
    ours = np.asarray(fda.source_to_target(jnp.asarray(src[0]),
                                           amp_trg[0], ratio, 0.1))
    ref = _fda_oracle(src[0].transpose(2, 0, 1),
                      trg[0].transpose(2, 0, 1), 0.1, ratio)
    np.testing.assert_allclose(ours, ref.transpose(1, 2, 0),
                               rtol=1e-3, atol=1e-2)


def test_fda_degree_zero_is_identity():
    rng = np.random.RandomState(7)
    src = rng.rand(2, 32, 32, 1).astype(np.float32) * 255
    trg = rng.rand(2, 32, 32, 1).astype(np.float32) * 255
    out = fda.fda_batch(jax.random.PRNGKey(0), jnp.asarray(src),
                        jnp.asarray(trg), 0.0, 0.01)
    np.testing.assert_allclose(np.asarray(out), src, rtol=1e-3, atol=5e-2)


def test_cutmix_box_properties():
    size = 64
    keys = jax.random.split(jax.random.PRNGKey(2), 50)
    boxes = np.asarray(jax.vmap(
        lambda k: cutmix.cutmix_box(k, size, p=1.0))(keys))
    areas = boxes.sum(axis=(1, 2)) / (size * size)
    assert (areas > 0).all()
    assert (areas <= 0.4 + 1e-6).all()
    # each box is a contiguous rectangle
    for b in boxes[:10]:
        rows = np.where(b.any(axis=1))[0]
        cols = np.where(b.any(axis=0))[0]
        assert (np.diff(rows) == 1).all() and (np.diff(cols) == 1).all()
        assert b[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()


def test_cutmix_box_skip_probability():
    size = 32
    keys = jax.random.split(jax.random.PRNGKey(3), 200)
    boxes = np.asarray(jax.vmap(
        lambda k: cutmix.cutmix_box(k, size, p=0.5))(keys))
    frac_zero = (boxes.sum(axis=(1, 2)) == 0).mean()
    assert 0.3 < frac_zero < 0.7


def test_all_cover_box():
    region = np.zeros((32, 32), np.float32)
    region[5:9, 10:20] = 1
    region[15, 3] = 1
    box = np.asarray(cutmix.all_cover_box(jax.random.PRNGKey(0),
                                          jnp.asarray(region)))
    expect = np.zeros_like(region)
    expect[5:16, 3:20] = 1
    np.testing.assert_array_equal(box, expect)
    # empty region -> forced nonzero cutmix box
    empty = np.zeros((32, 32), np.float32)
    fb = np.asarray(cutmix.all_cover_box(jax.random.PRNGKey(1),
                                         jnp.asarray(empty)))
    assert fb.sum() > 0


def test_weak_augment_uint8_equals_float32():
    """The fused step feeds uint8 corpus pixels straight into the aug
    gathers (4x less traffic); results must be bit-identical to the f32
    path since conversion happens at the interpolation step."""
    import jax
    import jax.numpy as jnp

    from ust_run_tpu.ops.augment import weak_augment_batch

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(7)
    img_u8 = rng.randint(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    lab_u8 = rng.choice([0, 128, 255], (4, 64, 64, 1)).astype(np.uint8)
    out_u8 = weak_augment_batch(key, jnp.asarray(img_u8),
                                jnp.asarray(lab_u8), 64, 255)
    out_f32 = weak_augment_batch(key, jnp.asarray(img_u8, jnp.float32),
                                 jnp.asarray(lab_u8, jnp.float32), 64, 255)
    np.testing.assert_array_equal(np.asarray(out_u8[0]),
                                  np.asarray(out_f32[0]))
    np.testing.assert_array_equal(np.asarray(out_u8[1]),
                                  np.asarray(out_f32[1]))


def test_uniform_batch_distribution():
    """uniform_batch must be U[0,1) on WHICHEVER backend is active.

    Regression: the Pallas TPU kernel arithmetic-shifted SIGNED int32
    random bits, mapping half the draws to (-2^7, 0); the elastic
    displacement fields built from them threw every p=0.5-gated sample
    fully out of bounds (black image, fill-valued mask) — silently, on
    TPU only, because the CPU fallback (jax.random.uniform) is a
    different code path. See STABILITY.md. On CPU this exercises the
    fallback; under the TPU verify flow it exercises the kernel.
    """
    import jax

    from ust_run_tpu.ops.pallas_rng import uniform_batch

    u = np.asarray(uniform_batch(jax.random.PRNGKey(3), 8, 128))
    assert u.shape == (8, 128, 128)
    assert u.min() >= 0.0 and u.max() < 1.0, (u.min(), u.max())
    assert abs(u.mean() - 0.5) < 0.01, u.mean()
    assert abs(u.std() - (1 / 12) ** 0.5) < 0.01, u.std()
    # per-field independence: distinct fields differ
    assert np.abs(u[0] - u[1]).max() > 0.1


def test_weak_augment_batch_not_degenerate():
    """No augmentation branch may blank out a sample: on a bright input
    every output must keep a majority of non-fill pixels (the broken
    elastic fields produced ~99.7%-black outputs)."""
    import jax
    import jax.numpy as jnp

    from ust_run_tpu.ops.augment import weak_augment_batch

    img = np.full((8, 64, 64, 3), 200, np.uint8)
    lab = np.full((8, 64, 64, 1), 128, np.uint8)
    out_img, _ = weak_augment_batch(jax.random.PRNGKey(11),
                                    jnp.asarray(img), jnp.asarray(lab),
                                    64, 255)
    black = (np.asarray(out_img) < 1.0).mean(axis=(1, 2, 3))
    assert black.max() < 0.5, black


def test_bilinear_gather_single_channel_is_padded():
    """Structural pin for the grayscale gather fix (PERF.md §grayscale).

    A (2,2,1) patch gather drops XLA's TPU emitter onto a scalar path
    (measured 1.6 s vs 16 ms for 8x288² images — the MNMS/prostate step
    was 13x slower than fundus). bilinear_gather must channel-pad C=1
    sources to 4 before the gather; assert the lowered gather really
    fetches (2,2,4) slices so a future 'simplification' can't silently
    reintroduce the pathology. Value-parity of the padded path is
    covered by test_bilinear_gather_matches_map_coordinates (C=1).
    """
    low = jax.jit(bilinear_gather).lower(
        jax.ShapeDtypeStruct((16, 16, 1), jnp.uint8),
        jax.ShapeDtypeStruct((4, 4), jnp.float32),
        jax.ShapeDtypeStruct((4, 4), jnp.float32)).as_text()
    gathers = [l for l in low.splitlines() if "stablehlo.gather" in l]
    assert gathers and all("array<i64: 2, 2, 4>" in g for g in gathers), \
        gathers


def test_bilinear_gather_per_tap_convert_bit_identical():
    """r5: bilinear_gather slices the u8 taps FIRST and converts
    per-tap (kills a 2.16 ms standalone convert + 1.42 ms layout copy
    on TPU — PERF.md). Pin bit-identity against the whole-tensor
    astype form for both the C=1 (pad-4) and C=3 layouts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ust_run_tpu.ops.resample import bilinear_gather

    rng = np.random.RandomState(7)
    for C in (1, 3):
        img = jnp.asarray(rng.randint(0, 256, (40, 40, C)).astype(np.uint8))
        r = jnp.asarray(rng.uniform(-2, 41, (33, 33)).astype(np.float32))
        c = jnp.asarray(rng.uniform(-2, 41, (33, 33)).astype(np.float32))
        out = bilinear_gather(img, r, c)
        h, w, cc = img.shape
        im = jnp.concatenate([img] * 4, -1) if cc == 1 else img
        r0 = jnp.clip(jnp.floor(r), 0, h - 2)
        c0 = jnp.clip(jnp.floor(c), 0, w - 2)
        fr = jnp.clip(r - r0, 0, 1).reshape(-1, 1)
        fc = jnp.clip(c - c0, 0, 1).reshape(-1, 1)
        starts = jnp.stack([r0.reshape(-1), c0.reshape(-1)],
                           -1).astype(jnp.int32)
        pat = jax.lax.gather(
            im, starts,
            jax.lax.GatherDimensionNumbers((1, 2, 3), (), (0, 1)),
            (2, 2, im.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP)[..., :cc]
        p = pat.astype(jnp.float32)
        top = p[:, 0, 0] * (1 - fc) + p[:, 0, 1] * fc
        bot = p[:, 1, 0] * (1 - fc) + p[:, 1, 1] * fc
        ref = (top * (1 - fr) + bot * fr).reshape(33, 33, cc)
        assert (np.asarray(out) == np.asarray(ref)).all()
