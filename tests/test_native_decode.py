"""Native libjpeg decode path (native/fastdecode.cpp + gio/decode.py)."""

import io

import numpy as np
import pytest
from PIL import Image

from aerial_image_recognition_tpu.gio.decode import decode_rgb
from aerial_image_recognition_tpu.utils.native import decode_jpeg_native


def _jpeg_bytes(arr, quality=92):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_native_matches_pil(rng):
    arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    body = _jpeg_bytes(arr)
    native = decode_jpeg_native(body)
    if native is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    pil = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    assert native.shape == pil.shape == (96, 128, 3)
    # both are libjpeg underneath — allow ±2 for IDCT implementation choice
    assert np.abs(native.astype(int) - pil.astype(int)).max() <= 2


def test_native_scale_denom(rng):
    arr = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    body = _jpeg_bytes(arr)
    half = decode_jpeg_native(body, scale_denom=2)
    if half is None:
        pytest.skip("native decoder unavailable")
    assert half.shape == (64, 64, 3)
    quarter = decode_jpeg_native(body, scale_denom=4)
    assert quarter.shape == (32, 32, 3)


def test_native_rejects_garbage():
    assert decode_jpeg_native(b"\xff\xd8\x00garbage" * 10) is None
    assert decode_rgb(b"") is None
    assert decode_rgb(b"not an image at all") is None


def test_decode_rgb_png_fallback(rng):
    arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    out = decode_rgb(buf.getvalue())
    np.testing.assert_array_equal(out, arr)      # PNG is lossless


def test_decode_rgb_jpeg_roundtrip(rng):
    arr = np.full((64, 64, 3), 128, np.uint8)
    out = decode_rgb(_jpeg_bytes(arr, quality=95))
    assert out.shape == (64, 64, 3)
    assert np.abs(out.astype(int) - 128).max() <= 4
