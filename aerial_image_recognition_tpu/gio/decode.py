"""Central image decode for the ingest plane.

JPEG bytes take the native libjpeg path (native/fastdecode.cpp — decodes
straight into a numpy buffer, GIL released, so the fetch thread pools scale
across cores); PNG and anything else falls back to PIL. Replaces the
reference's per-tile ``PIL.Image.open(BytesIO(...)).convert("RGB")``
(e.g. reference simple_detector.py:129, _script/wms_handler.py).
"""

import io
from typing import Optional

import numpy as np

_JPEG_MAGIC = b"\xff\xd8"


def decode_rgb(body: bytes,
               scale_denom: int = 1) -> Optional[np.ndarray]:
    """Image bytes → uint8 [H, W, 3] RGB; None on undecodable input.

    scale_denom ∈ {1,2,4,8}: JPEG-only fractional-DCT downscale during
    decode (cheaper than decode-then-resize for oversized sources)."""
    if not body:
        return None
    if body[:2] == _JPEG_MAGIC:
        from aerial_image_recognition_tpu.utils.native import (
            decode_jpeg_native)
        arr = decode_jpeg_native(body, scale_denom=scale_denom)
        if arr is not None:
            return arr
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        if scale_denom > 1:
            img = img.resize((max(1, img.width // scale_denom),
                              max(1, img.height // scale_denom)))
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        return None
