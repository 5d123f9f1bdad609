"""On-device image preprocessing: crop → resize → normalize, fused under jit.

The reference does this per-image on host CPU with PIL/numpy
(simple_detector.py:462-467: resize 640 + /255 + HWC→CHW;
_script/xyz_handler.py:215: LANCZOS 864→640; _script/gpu_handler.py:67-92).
Here the host plane only decodes JPEG bytes to uint8 mosaics; the
crop/resize/normalize runs on-device over the whole batch, so the bytes
crossing PCIe are uint8 (4× less than f32) and the conversion fuses into the
first conv's HLO. NHWC throughout (TPU-native conv layout).
"""

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _resize_matrix(src: int, dst: int, method: str) -> np.ndarray:
    """Exact 1-D interpolation matrix [dst, src] for ``jax.image.resize``.

    resize is linear and separable per axis, so resizing the identity
    matrix along one axis yields the axis's full weight matrix (including
    the antialiasing kernel widening jax applies when downscaling) — the
    two-matrix product Ry · X · Rxᵀ reproduces jax.image.resize exactly
    in exact arithmetic. Row-normalized weights sum to 1, so folding the
    /255 normalization in costs nothing.
    """
    eye = np.eye(src, dtype=np.float32)
    # ensure_compile_time_eval: this helper is reached from inside a jit
    # trace (preprocess_batch), where resize would return a tracer
    with jax.ensure_compile_time_eval():
        m = jax.image.resize(jnp.asarray(eye), (dst, src), method=method)
        return np.asarray(m)


def _separable_resize_core(x: jnp.ndarray, out_size: int, method: str,
                           out_dtype, *, scale: Optional[float],
                           compute_dtype) -> jnp.ndarray:
    """[B,H,W,C] → [B,out,out,C]: two separable MXU contractions.

    Shared core of the matmul-resize lowerings: exact ``jax.image.resize``
    weight matrices (``_resize_matrix``), height then width contraction
    with f32 accumulation, in ``compute_dtype`` on the MXU. ``scale`` (if
    given) is folded into the height matrix for free — row-normalized
    weights sum to 1, so e.g. the /255 ingest normalization costs nothing.
    """
    b, h, w, c = x.shape
    ry = _resize_matrix(h, out_size, method)
    if scale is not None:
        ry = ry * scale
    ry = jnp.asarray(ry, compute_dtype)
    rx = jnp.asarray(_resize_matrix(w, out_size, method), compute_dtype)
    xb = x.astype(compute_dtype)
    # f32 compute must pin precision: the TPU DEFAULT matmul precision
    # rounds f32 dot_general operands to bf16 on the MXU, silently
    # breaking this function's "f32 inputs keep their full precision"
    # contract (same bug class as the ops/nms.box_voting einsum — see
    # CLAUDE.md; the 4e-5 parity test runs on CPU, where the default is
    # already full precision, so it cannot catch this). bf16 compute
    # keeps the default (operands are already bf16 — that IS the fast
    # path's contract).
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    # height pass: contract H → [out_h, B, W, C]
    y = jax.lax.dot_general(
        ry, xb, (((1,), (1,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32).astype(compute_dtype)
    # width pass: contract W → [out_w, out_h, B, C]
    z = jax.lax.dot_general(
        rx, y, (((1,), (2,)), ((), ())), precision=prec,
        preferred_element_type=jnp.float32).astype(out_dtype)
    return z.transpose(2, 1, 0, 3)                 # [B, out_h, out_w, C]


def _matmul_resize(x_u8: jnp.ndarray, out_size: int, method: str,
                   dtype) -> jnp.ndarray:
    """uint8 [B,H,W,C] → normalized [B,out,out,C] via two MXU contractions.

    The straightforward lowering (f32 /255 then jax.image.resize) runs the
    separable contractions at the f32 MXU rate and quadruples the HBM
    bytes of the biggest tensor; measured ~20 ms of the src864 step's
    time at batch 128. Here pixels stay exact in bf16 (integers ≤255 fit
    bf16's 8-bit mantissa), both contractions run at the bf16 MXU rate
    with f32 accumulation, and /255 is folded into the height matrix.
    """
    return _separable_resize_core(x_u8, out_size, method, dtype,
                                  scale=1.0 / 255.0,
                                  compute_dtype=jnp.bfloat16)


def matmul_resize_float(x: jnp.ndarray, out_size: int,
                        method: str = "bilinear") -> jnp.ndarray:
    """float [B,H,W,C] → [B,out,out,C] via two separable MXU contractions.

    The already-normalized-input sibling of ``_matmul_resize`` (no /255
    fold): same exact ``jax.image.resize`` weight matrices, result cast
    back to ``x.dtype``. Used by the multiscale inference mode
    (pipeline/inference.py), where the tensors being rescaled are the
    preprocessed tiles rather than uint8 ingest batches. bf16 inputs run
    at the bf16 MXU rate; f32 inputs keep their full precision and run
    the contractions in f32 (a pipeline explicitly configured with
    dtype=float32 must not silently get bf16-precision rescales).
    """
    compute = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    return _separable_resize_core(x, out_size, method, x.dtype,
                                  scale=None, compute_dtype=compute)


@partial(jax.jit, static_argnames=("out_size", "method", "dtype",
                                   "crop_size", "matmul"))
def preprocess_batch(images: jnp.ndarray, *,
                     out_size: int = 640,
                     crop_size: Optional[int] = None,
                     method: str = "bilinear",
                     dtype: jnp.dtype = jnp.bfloat16,
                     matmul: bool = True) -> jnp.ndarray:
    """uint8 [B,H,W,3] → normalized [B,out_size,out_size,3] in ``dtype``.

    crop_size: optional center-crop (in source pixels) before the resize —
    the XYZ path's 1024→864 center crop (reference xyz_handler.py:165-170).
    method: 'bilinear' | 'nearest' | 'lanczos3' (the reference's monolith
    used PIL nearest at simple_detector.py:462; XYZ used LANCZOS).

    Linear separable methods (bilinear/lanczos3) resize via two bf16 MXU
    contractions (see _matmul_resize) — same weights as jax.image.resize,
    measured ~4× faster on the 864→640 production geometry.
    """
    x = images
    b, h, w, c = x.shape
    if crop_size is not None and (crop_size != h or crop_size != w):
        oy = (h - crop_size) // 2
        ox = (w - crop_size) // 2
        x = jax.lax.slice(x, (0, oy, ox, 0), (b, oy + crop_size,
                                              ox + crop_size, c))
        b, h, w, c = x.shape
    if (h, w) == (out_size, out_size):
        return (x.astype(jnp.float32) / 255.0).astype(dtype)
    if matmul and method in ("bilinear", "lanczos3"):
        return _matmul_resize(x, out_size, method, dtype)
    x = x.astype(jnp.float32) / 255.0
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
