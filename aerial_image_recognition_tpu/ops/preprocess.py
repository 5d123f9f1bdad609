"""On-device image preprocessing: crop → resize → normalize, fused under jit.

The reference does this per-image on host CPU with PIL/numpy
(simple_detector.py:462-467: resize 640 + /255 + HWC→CHW;
_script/xyz_handler.py:215: LANCZOS 864→640; _script/gpu_handler.py:67-92).
Here the host plane only decodes JPEG bytes to uint8 mosaics; the
crop/resize/normalize runs on-device over the whole batch, so the bytes
crossing PCIe are uint8 (4× less than f32) and the conversion fuses into the
first conv's HLO. NHWC throughout (TPU-native conv layout).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size", "method", "dtype",
                                   "crop_size"))
def preprocess_batch(images: jnp.ndarray, *,
                     out_size: int = 640,
                     crop_size: Optional[int] = None,
                     method: str = "bilinear",
                     dtype: jnp.dtype = jnp.bfloat16) -> jnp.ndarray:
    """uint8 [B,H,W,3] → normalized [B,out_size,out_size,3] in ``dtype``.

    crop_size: optional center-crop (in source pixels) before the resize —
    the XYZ path's 1024→864 center crop (reference xyz_handler.py:165-170).
    method: 'bilinear' | 'nearest' | 'lanczos3' (the reference's monolith
    used PIL nearest at simple_detector.py:462; XYZ used LANCZOS).
    """
    x = images
    b, h, w, c = x.shape
    if crop_size is not None and (crop_size != h or crop_size != w):
        oy = (h - crop_size) // 2
        ox = (w - crop_size) // 2
        x = jax.lax.slice(x, (0, oy, ox, 0), (b, oy + crop_size,
                                              ox + crop_size, c))
    x = x.astype(jnp.float32) / 255.0
    if x.shape[1] != out_size or x.shape[2] != out_size:
        x = jax.image.resize(x, (b, out_size, out_size, c), method=method)
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("grid", "tile_px"))
def assemble_mosaic(tiles: jnp.ndarray, *, grid: Tuple[int, int],
                    tile_px: int = 256) -> jnp.ndarray:
    """uint8 [B, gy·gx, t, t, 3] → [B, gy·t, gx·t, 3] mosaics on device.

    Device-side replacement for the PIL paste loop
    (reference simple_detector.py:401-407) — a pure reshape/transpose, which
    XLA turns into a copy at HBM bandwidth.
    """
    gy, gx = grid
    b, n, t, _, c = tiles.shape
    assert n == gy * gx and t == tile_px
    x = tiles.reshape(b, gy, gx, t, t, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)       # [B, gy, t, gx, t, c]
    return x.reshape(b, gy * t, gx * t, c)
