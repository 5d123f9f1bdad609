"""Test-time augmentation (TTA) — lighting/occlusion variation stack.

Device-side reimplementation of the reference's TTA pipeline
(_script/gpu_handler.py:94-140: brightness/gamma/CLAHE variations;
_script/gpu_handler_archive.py:69-122: the fuller ladder — brightness
1.4/1.6/1.8, gamma 1.5, three CLAHE parameterizations; per-variation
confidence weights at gpu_handler.py:275-285 / archive:229-246).

The reference ran each variation as a separate host preprocess + ONNX call;
here variations are generated on device and stacked into the batch dimension
(B·V images through one jitted forward), then merged by weighted NMS — the
TPU-native formulation (bigger batches, zero extra host↔device traffic).

CLAHE: the ``clahe_*`` variations run the EXACT tile-histogram algorithm on
device (ops/clahe.clahe_rgb_device — compare-and-reduce histograms, vectorized
clip/redistribute/CDF, blocked bit-split LUT application on the MXU; cv2-parity
and TPU-wide ops throughout — see the round-3 note in ops/clahe.py). The
differentiable local-contrast approximant remains available as
``localcontrast_*`` for training-time augmentation.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# (name, weight): confidence weights per variation, mirroring the
# reference's table (gpu_handler.py:275-285).
DEFAULT_VARIATIONS: Tuple[Tuple[str, float], ...] = (
    ("original", 1.00),
    ("brightness_1.4", 0.95),
    ("brightness_1.6", 0.90),
    ("brightness_1.8", 0.85),
    ("gamma_1.5", 0.95),
    ("clahe_2.0", 0.90),
    ("clahe_3.0", 0.85),
    ("clahe_4.0", 0.80),
)


def brightness(x: jnp.ndarray, factor: float) -> jnp.ndarray:
    return jnp.clip(x * factor, 0.0, 1.0)


def gamma(x: jnp.ndarray, g: float) -> jnp.ndarray:
    return jnp.clip(x, 1e-6, 1.0) ** (1.0 / g)


def local_contrast(x: jnp.ndarray, clip: float = 2.0,
                   grid: int = 8) -> jnp.ndarray:
    """CLAHE-approximant: per-tile standardization on luminance with
    smooth (average-pool + resize) statistics, gain limited by ``clip``."""
    b, h, w, c = x.shape
    lum = x.mean(-1, keepdims=True)
    th, tw = h // grid, w // grid
    pooled = jax.lax.reduce_window(
        lum, 0.0, jax.lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID")
    cnt = float(th * tw)
    mean = pooled / cnt
    sq = jax.lax.reduce_window(
        lum * lum, 0.0, jax.lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID")
    var = jnp.maximum(sq / cnt - mean**2, 1e-6)
    mean_f = jax.image.resize(mean, (b, h, w, 1), "bilinear")
    std_f = jax.image.resize(jnp.sqrt(var), (b, h, w, 1), "bilinear")
    gain = jnp.clip(0.2 / (std_f + 1e-4), 1.0 / clip, clip)
    out = (lum - mean_f) * gain + mean_f
    # reapply chroma ratios
    ratio = x / jnp.maximum(lum, 1e-4)
    return jnp.clip(out * ratio, 0.0, 1.0)


def enhance_shadows(x: jnp.ndarray) -> jnp.ndarray:
    """Shadow enhancement: brightness 1.8 then contrast 1.2 around the mean
    (reference XYZHandler._enhance_shadows, _script/xyz_handler.py:177-185)."""
    y = jnp.clip(x * 1.8, 0.0, 1.0)
    mean = y.mean(axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((y - mean) * 1.2 + mean, 0.0, 1.0)


def apply_variation(x: jnp.ndarray, name: str, *,
                    clahe_hist_subsample: int = 1,
                    clahe_backend: str = "auto") -> jnp.ndarray:
    if name == "original":
        return x
    if name == "shadow":
        return enhance_shadows(x)
    kind, _, val = name.partition("_")
    v = float(val)
    if kind == "brightness":
        return brightness(x, v)
    if kind == "gamma":
        return gamma(x, v)
    if kind == "clahe":
        # exact tile-histogram CLAHE on device (cv2-parity LAB-L transform,
        # ops/clahe.clahe_rgb_device); the reference's TTA transform at
        # gpu_handler.py:103-117. clahe_hist_subsample > 1 estimates the
        # per-tile histograms from a stride-s lattice (throughput knob,
        # ops/clahe._tile_histograms; 1 = bit-exact cv2 parity).
        from aerial_image_recognition_tpu.ops.clahe import clahe_rgb_device
        return clahe_rgb_device(x, clip_limit=v,
                                hist_subsample=clahe_hist_subsample,
                                backend=clahe_backend)
    if kind == "localcontrast":
        # differentiable approximant (kept for training-time augmentation)
        return local_contrast(x, clip=v)
    raise KeyError(f"unknown TTA variation {name!r}")


def expand_tta(x: jnp.ndarray,
               variations: Sequence[Tuple[str, float]] = DEFAULT_VARIATIONS,
               *, clahe_hist_subsample: int = 1,
               clahe_backend: str = "auto"
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B,H,W,3] float → ([B·V,H,W,3], weights [V]); variation-major order
    (x_v = out[v·B:(v+1)·B]).

    The ``clahe_*`` variations fold into ONE multi-clip pass only when
    the Pallas LUT-apply kernel is FORCED (clahe_backend='pallas*' —
    ops/clahe_pallas shares the VMEM one-hot across clips, so the V-fold
    is free there). By default the ladder stays per-variation XLA calls
    whose identical histogram/LAB subexpressions XLA CSE shares: the
    fold was measured slower as pure XLA (118 → 182 ms/batch-128,
    BASELINE.md round 3) and the kernel itself measured slower than the
    XLA apply on chip (round-5 A/B: TTA 264.9 vs 381.3 t/s). Results
    are bit-identical either way (tests/test_clahe*.py).

    clahe_hist_subsample > 1 estimates the CLAHE tile histograms from a
    stride-s pixel lattice (accuracy/throughput trade, A/B in BASELINE.md
    round 4; 1 = bit-exact)."""
    from aerial_image_recognition_tpu.ops.clahe import (
        _pallas_apply_engages, clahe_rgb_device_multi)

    outs = [None] * len(variations)
    clahe = [(i, float(name.partition("_")[2]))
             for i, (name, _) in enumerate(variations)
             if name.partition("_")[0] == "clahe"]
    if len(clahe) >= 2 and _pallas_apply_engages(
            x.shape[1], x.shape[2], (8, 8), clahe_backend):
        multi = clahe_rgb_device_multi(
            x, [c for _, c in clahe],
            hist_subsample=clahe_hist_subsample, backend=clahe_backend)
        for v, (i, _) in enumerate(clahe):
            outs[i] = multi[v]
    for i, (name, _) in enumerate(variations):
        if outs[i] is None:
            outs[i] = apply_variation(
                x, name, clahe_hist_subsample=clahe_hist_subsample,
                clahe_backend=clahe_backend)
    w = jnp.asarray([wt for _, wt in variations], dtype=x.dtype)
    return jnp.concatenate(outs, axis=0), w


def merge_tta_scores(scores: jnp.ndarray, weights: jnp.ndarray,
                     batch: int) -> jnp.ndarray:
    """[B·V, A, nc] → [B, A, nc]: per-variation confidence weighting then
    max-merge across variations (the reference keeps the best weighted
    confidence per detection across variations)."""
    v = weights.shape[0]
    s = scores.reshape(v, batch, *scores.shape[1:])
    return jnp.max(s * weights[:, None, None, None], axis=0)
