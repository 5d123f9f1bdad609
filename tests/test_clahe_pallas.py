"""Pallas CLAHE LUT-apply kernel: bit-exactness vs the XLA lowering.

The kernel (ops/clahe_pallas) keeps the bit-split lookup's one-hot in
VMEM and folds every clip variant into one pass; these tests pin its
agreement with the measured-best XLA formulation on CPU (interpret
mode): raw-bit-identical on dyadic-blend-weight geometries, and within
1 f32 ULP pre-round (<=1 rounded level on a vanishing pixel fraction —
XLA fma-fusion freedom) on non-dyadic ones, so the on-TPU auto backend
cannot meaningfully change results.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aerial_image_recognition_tpu.ops import clahe as C
from aerial_image_recognition_tpu.ops.clahe_pallas import (
    apply_luts_pallas, supports_geometry)


def _luts_for(l8, clips, grid=(8, 8)):
    hist, (th, tw), n_px = C._tile_histograms(l8, grid)
    luts = jnp.stack([C._luts_from_hist(hist, c, n_px) for c in clips],
                     axis=3)
    return luts, th, tw


def test_kernel_bit_exact_vs_xla_blocked(rng):
    # 128px: tile w 16 -> dyadic k/16 blend weights, raw f32 bit-equality.
    # 384px: tile w 48 -> NON-dyadic k/48 weights; the kernel reproduces
    # _apply_luts_blocked's exact blend nesting (a flat-weight variant was
    # caught by on-chip parity probing), but XLA's fma-fusion freedom
    # still permits 1-ULP drift pre-round — so pin the ROUNDED 8-bit
    # levels (what clahe_gray_device emits) to exact equality instead.
    for size, raw_bits in ((128, True), (384, False)):
        l8 = jnp.asarray(rng.integers(0, 255, (2, size, size)), jnp.int32)
        for clips in ([2.0], [2.0, 3.0, 4.0]):
            luts, th, tw = _luts_for(l8, clips)
            ref = np.asarray(C._apply_luts_blocked(luts, l8, 8, 8, th, tw))
            got = np.asarray(apply_luts_pallas(luts, l8, 8, 8, th, tw,
                                               interpret=True))
            if raw_bits:
                np.testing.assert_array_equal(ref, got,
                                              err_msg=f"{size} {clips}")
            else:
                # a few f32 ULPs at 255-scale (ulp(256) = 3.05e-5)
                assert np.abs(ref - got).max() < 1e-4, f"{size} {clips}"
                lev = np.abs(np.clip(np.round(ref), 0, 255)
                             - np.clip(np.round(got), 0, 255))
                # the 1-ULP drift flips a rounded level only for values
                # landing exactly on a .5 boundary: <=1 level, vanishing
                # fraction (measured 3/294912 here)
                assert lev.max() <= 1, f"{size} {clips}"
                assert (lev > 0).mean() < 5e-4, f"{size} {clips}"


def test_supports_geometry():
    assert supports_geometry(640, 640, 8, 8)        # production TTA
    assert supports_geometry(512, 512, 8, 8)
    assert supports_geometry(128, 128, 8, 8)
    assert not supports_geometry(250, 237, 8, 8)    # ragged tiles
    assert not supports_geometry(96, 96, 8, 8)      # bh=6 not 8-multiple
    assert not supports_geometry(320, 320, 8, 8)    # W not 128-multiple


def test_gray_device_backends_agree(rng):
    l8 = jnp.asarray(rng.integers(0, 255, (1, 128, 128)), jnp.int32)
    xla = np.asarray(C.clahe_gray_device(l8, 3.0, backend="xla"))
    pal = np.asarray(C.clahe_gray_device(l8, 3.0,
                                         backend="pallas_interpret"))
    np.testing.assert_array_equal(xla, pal)
    # multi + hist_subsample composition
    xla_m = np.asarray(C.clahe_gray_device_multi(
        l8, [2.0, 4.0], hist_subsample=2, backend="xla"))
    pal_m = np.asarray(C.clahe_gray_device_multi(
        l8, [2.0, 4.0], hist_subsample=2, backend="pallas_interpret"))
    np.testing.assert_array_equal(xla_m, pal_m)


def test_forced_backend_rejects_bad_geometry(rng):
    l8 = jnp.asarray(rng.integers(0, 255, (1, 50, 46)), jnp.int32)
    with pytest.raises(ValueError):
        C.clahe_gray_device(l8, 2.0, backend="pallas")
    # auto silently falls back to the gather path
    out = C.clahe_gray_device(l8, 2.0, backend="auto")
    assert out.shape == (1, 50, 46)


def test_expand_tta_grouped_clahe_matches_per_variation(rng):
    """When the kernel engages, expand_tta folds the clahe_* variations
    into one multi-clip pass — results must stay bit-identical to the
    per-variation ladder."""
    from aerial_image_recognition_tpu.ops.augment import expand_tta

    x = jnp.asarray(rng.integers(0, 255, (1, 128, 128, 3)),
                    jnp.float32) / 255.0
    plain, w0 = expand_tta(x)                       # CPU: per-variation
    grouped, w1 = expand_tta(x, clahe_backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(grouped))
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
