"""Exact CLAHE properties + LAB round trip."""

import numpy as np
import pytest

from aerial_image_recognition_tpu.ops.clahe import (
    clahe_gray, clahe_rgb, lab_to_rgb, rgb_to_lab,
)


def test_lab_roundtrip(rng):
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    back = lab_to_rgb(rgb_to_lab(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_lab_known_values():
    white = np.full((1, 1, 3), 255, np.uint8)
    lab = rgb_to_lab(white)
    assert lab[0, 0, 0] == pytest.approx(100.0, abs=0.1)
    assert abs(lab[0, 0, 1]) < 0.5 and abs(lab[0, 0, 2]) < 0.5
    black = np.zeros((1, 1, 3), np.uint8)
    assert rgb_to_lab(black)[0, 0, 0] == pytest.approx(0.0, abs=0.1)


def test_clahe_increases_local_contrast(rng):
    # low-contrast image: narrow band around 120
    img = (120 + rng.normal(0, 5, (64, 64))).clip(0, 255).astype(np.uint8)
    out = clahe_gray(img, clip_limit=4.0, grid=(4, 4))
    assert out.std() > img.std() * 1.5
    assert out.dtype == np.uint8


def test_clahe_clip_limits_amplification(rng):
    img = (120 + rng.normal(0, 5, (64, 64))).clip(0, 255).astype(np.uint8)
    mild = clahe_gray(img, clip_limit=1.2, grid=(4, 4))
    strong = clahe_gray(img, clip_limit=8.0, grid=(4, 4))
    assert strong.std() > mild.std()


def test_clahe_identity_on_uniform():
    img = np.full((64, 64), 100, np.uint8)
    out = clahe_gray(img, clip_limit=2.0, grid=(8, 8))
    # uniform input stays (nearly) uniform — no contrast invented
    assert out.std() < 2.0


def test_clahe_rgb_preserves_shape_and_chroma_sign(rng):
    img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    out = clahe_rgb(img, clip_limit=2.0)
    assert out.shape == img.shape and out.dtype == np.uint8
    # lightness redistributed, chroma roughly preserved
    lab_in, lab_out = rgb_to_lab(img), rgb_to_lab(out)
    corr = np.corrcoef(lab_in[..., 1].ravel(), lab_out[..., 1].ravel())[0, 1]
    assert corr > 0.9


def test_clahe_nonsquare_and_odd_sizes(rng):
    img = rng.integers(0, 255, (50, 37), dtype=np.uint8)
    out = clahe_gray(img, clip_limit=2.0, grid=(8, 8))
    assert out.shape == (50, 37)


def test_device_clahe_gray_matches_host_exactly(rng):
    """clahe_gray_device must reproduce the host (cv2-parity) algorithm —
    the round-1 device TTA path only had an approximant (VERDICT item 7)."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.clahe import clahe_gray_device

    for shape, grid, clip in (((64, 64), (8, 8), 2.0),
                              ((50, 37), (8, 8), 3.0),
                              ((96, 96), (4, 4), 4.0)):
        imgs = rng.integers(0, 255, (3,) + shape, dtype=np.uint8)
        dev = np.asarray(clahe_gray_device(
            jnp.asarray(imgs, jnp.int32), clip_limit=clip, grid=grid))
        host = np.stack([clahe_gray(im, clip_limit=clip, grid=grid)
                         for im in imgs]).astype(np.int32)
        diff = np.abs(dev - host)
        # identical algorithm; allow ±1 for f32-vs-f64 rounding razor edges
        assert diff.max() <= 1, f"{shape}: max diff {diff.max()}"
        assert (diff == 0).mean() > 0.995, f"{shape}: {(diff == 0).mean()}"


def test_device_clahe_rgb_matches_host(rng):
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.clahe import clahe_rgb_device

    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    dev = np.asarray(clahe_rgb_device(
        jnp.asarray(imgs, jnp.float32) / 255.0, clip_limit=2.0))
    dev_u8 = np.clip(np.round(dev * 255.0), 0, 255).astype(np.int32)
    host = np.stack([clahe_rgb(im, clip_limit=2.0)
                     for im in imgs]).astype(np.int32)
    diff = np.abs(dev_u8 - host)
    assert diff.max() <= 2, f"max diff {diff.max()}"
    assert (diff <= 1).mean() > 0.999


def test_tta_clahe_variation_is_exact_now(rng):
    """The TTA 'clahe_*' variation routes to the exact device CLAHE."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.augment import apply_variation
    from aerial_image_recognition_tpu.ops.clahe import clahe_rgb_device

    x = jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3)), jnp.float32) / 255.0
    out = apply_variation(x, "clahe_2.0")
    want = clahe_rgb_device(x, clip_limit=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


def test_multi_clip_clahe_bit_identical_to_single_calls(rng):
    """clahe_*_device_multi (shared histograms + V-folded blocked lookup)
    must equal V separate single-clip calls exactly, on both the blocked
    geometry (even tiles, exact multiple) and the gather fallback."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.clahe import (
        clahe_gray_device, clahe_gray_device_multi,
        clahe_rgb_device, clahe_rgb_device_multi)

    clips = [2.0, 3.0, 4.0]
    for shape in ((3, 64, 64), (2, 50, 46)):     # blocked / gather fallback
        l8 = jnp.asarray(rng.integers(0, 255, shape), jnp.int32)
        multi = np.asarray(clahe_gray_device_multi(l8, clips))
        for v, c in enumerate(clips):
            single = np.asarray(clahe_gray_device(l8, clip_limit=c))
            np.testing.assert_array_equal(multi[v], single, err_msg=str((shape, c)))

    x = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)), jnp.float32) / 255.0
    multi = np.asarray(clahe_rgb_device_multi(x, clips))
    for v, c in enumerate(clips):
        single = np.asarray(clahe_rgb_device(x, clip_limit=c))
        np.testing.assert_allclose(multi[v], single, atol=1e-6,
                                   err_msg=str(c))


def test_hist_subsample_accuracy_and_guard(rng):
    """hist_subsample=2 (the TTA throughput knob, BASELINE.md round 4)
    must stay a close approximation at the production tile geometry and
    self-clamp to exact on tiles too small to subsample (integer-clip
    quantization flattens the LUTs below ~1024 sampled px — measured)."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.clahe import clahe_gray_device

    # structured content (gradient + texture) — flat-random histograms
    # would understate the approximation error
    s = 640
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    img = (80 + 60 * np.sin(yy / 90) + 40 * np.cos(xx / 60)
           + rng.normal(0, 18, (s, s)))
    l8 = jnp.asarray(np.clip(img, 0, 255).astype(np.int32)[None])

    exact = np.asarray(clahe_gray_device(l8, 2.0, (8, 8), 1))
    approx = np.asarray(clahe_gray_device(l8, 2.0, (8, 8), 2))
    d = np.abs(exact - approx)
    # measured round 4 on this content: max 14, mean 2.05 — bound loosely
    assert d.max() <= 24, f"max diff {d.max()}"
    assert d.mean() <= 4.0, f"mean diff {d.mean()}"

    # tiny tiles (32×30 → 240 sampled px at stride 2): the guard clamps
    # the stride back to 1, so the result is bit-equal to exact
    l8_small = jnp.asarray(
        np.clip(img[:250, :237], 0, 255).astype(np.int32)[None])
    exact_s = np.asarray(clahe_gray_device(l8_small, 3.0, (8, 8), 1))
    approx_s = np.asarray(clahe_gray_device(l8_small, 3.0, (8, 8), 2))
    np.testing.assert_array_equal(exact_s, approx_s)


def test_expand_tta_hist_subsample_plumbs_through(rng):
    """expand_tta(clahe_hist_subsample=s) must route s to the clahe_*
    variations (and ONLY those — brightness/gamma/original unchanged)."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.augment import (
        DEFAULT_VARIATIONS, expand_tta)
    from aerial_image_recognition_tpu.ops.clahe import clahe_rgb_device

    # 512 px / grid 8 → 64×64 tiles → 1024 sampled px at stride 2: the
    # guard admits the stride, so ss=2 differs from exact
    s = 512
    yy = np.linspace(0, 120, s, dtype=np.float32)[:, None, None]
    img = np.clip(rng.normal(100, 30, (1, s, s, 3)) + yy, 0, 255)
    x = jnp.asarray(img, jnp.float32) / 255.0

    got, _ = expand_tta(x, clahe_hist_subsample=2)
    got = got.reshape(len(DEFAULT_VARIATIONS), 1, s, s, 3)
    for v, (name, _) in enumerate(DEFAULT_VARIATIONS):
        if name.startswith("clahe_"):
            clip = float(name.split("_")[1])
            want = clahe_rgb_device(x, clip_limit=clip, hist_subsample=2)
            np.testing.assert_allclose(np.asarray(got[v]), np.asarray(want),
                                       atol=1e-6, err_msg=name)
            exact = clahe_rgb_device(x, clip_limit=clip, hist_subsample=1)
            assert np.abs(np.asarray(want) - np.asarray(exact)).max() > 0, \
                f"{name}: subsample had no effect (guard misfired?)"


def test_variation_backend_plumbs_through(rng, monkeypatch):
    """apply_variation/expand_tta must forward clahe_backend to
    clahe_rgb_device. Regression for a round-4 bug the CPU suite could
    not see: backend='xla' skipped the multi-clip fold but the
    per-variation fallback still called clahe_rgb_device with 'auto', so
    on TPU the escape hatch silently ran the Pallas kernel anyway (and
    the A/B it existed for measured pallas vs pallas)."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops import augment, clahe

    seen = []
    real = clahe.clahe_rgb_device

    def spy(x, clip_limit=2.0, grid=(8, 8), hist_subsample=1,
            backend="auto"):
        seen.append(backend)
        return real(x, clip_limit=clip_limit, grid=grid,
                    hist_subsample=hist_subsample, backend=backend)

    monkeypatch.setattr(clahe, "clahe_rgb_device", spy)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)),
                    jnp.float32) / 255.0
    augment.apply_variation(x, "clahe_2.0", clahe_backend="xla")
    got, _ = augment.expand_tta(x, clahe_backend="xla")
    assert seen and set(seen) == {"xla"}, seen


def test_expand_tta_matches_per_variation_loop(rng):
    """expand_tta must equal the per-variation loop (guards any future
    regrouping of the ladder — e.g. the measured-and-rejected multi-clip
    fold — against reordering or numeric drift)."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.augment import (
        DEFAULT_VARIATIONS, apply_variation, expand_tta)

    x = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32) / 255.0
    got, w = expand_tta(x)
    naive = jnp.concatenate(
        [apply_variation(x, name) for name, _ in DEFAULT_VARIATIONS], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive), atol=1e-6)
    assert w.shape == (len(DEFAULT_VARIATIONS),)
