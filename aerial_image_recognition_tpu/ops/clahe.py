"""Exact CLAHE (contrast-limited adaptive histogram equalization), numpy.

Host-side parity implementation of the cv2.createCLAHE pipeline the
reference applies to the LAB lightness channel for its TTA variations
(_script/gpu_handler.py:103-137: clipLimit 2.0-4.0, tileGridSize 8×8).
The on-device TTA path uses the differentiable local-contrast approximant
(ops/augment.local_contrast); this module is the bit-faithful algorithm for
host-side preprocessing/augmentation and for validating the approximant.

Algorithm: per-tile 256-bin histogram → clip at clip_limit × mean bin
height, redistribute the excess uniformly → CDF lookup table per tile →
bilinear interpolation of the four surrounding tiles' LUTs per pixel.
"""

from typing import Tuple

import numpy as np


def clahe_gray(img: np.ndarray, clip_limit: float = 2.0,
               grid: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """uint8 [H, W] → uint8 [H, W]."""
    h, w = img.shape
    gh, gw = grid
    th, tw = -(-h // gh), -(-w // gw)       # ceil tiles
    # pad to an exact tile multiple (edge-replicate, like cv2)
    pad_h, pad_w = th * gh - h, tw * gw - w
    padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")

    # per-tile LUTs
    tiles = padded.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    luts = np.empty((gh, gw, 256), np.uint8)
    n_px = th * tw
    clip = max(1, int(clip_limit * n_px / 256.0))
    for i in range(gh):
        for j in range(gw):
            hist = np.bincount(tiles[i, j].ravel(), minlength=256)
            excess = np.maximum(hist - clip, 0).sum()
            hist = np.minimum(hist, clip) + excess // 256
            # residual excess spreads one per bin from the start (cv2-like)
            rem = int(excess % 256)
            if rem:
                hist[:rem] += 1
            cdf = np.cumsum(hist)
            cdf_min = cdf[np.nonzero(cdf)[0][0]] if cdf[-1] else 0
            denom = max(cdf[-1] - cdf_min, 1)
            luts[i, j] = np.clip(np.round(
                (cdf - cdf_min) * 255.0 / denom), 0, 255).astype(np.uint8)

    # bilinear interpolation between tile LUTs
    ys, xs = np.mgrid[0:h, 0:w]
    fy = (ys + 0.5) / th - 0.5
    fx = (xs + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, gh - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, gw - 1)
    y1 = np.minimum(y0 + 1, gh - 1)
    x1 = np.minimum(x0 + 1, gw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)
    wx = np.clip(fx - x0, 0.0, 1.0)

    v = img
    p00 = luts[y0, x0, v].astype(np.float32)
    p01 = luts[y0, x1, v].astype(np.float32)
    p10 = luts[y1, x0, v].astype(np.float32)
    p11 = luts[y1, x1, v].astype(np.float32)
    out = ((1 - wy) * ((1 - wx) * p00 + wx * p01)
           + wy * ((1 - wx) * p10 + wx * p11))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- LAB plumbing

_RGB2XYZ = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], np.float32)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ).astype(np.float32)
_WHITE = np.array([0.950456, 1.0, 1.088754], np.float32)


def _f(t):
    d = 6.0 / 29.0
    return np.where(t > d**3, np.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _finv(t):
    d = 6.0 / 29.0
    return np.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] → float32 LAB (L in 0..100)."""
    x = (rgb.astype(np.float32) / 255.0) @ _RGB2XYZ.T / _WHITE
    fx = _f(x)
    L = 116.0 * fx[..., 1] - 16.0
    a = 500.0 * (fx[..., 0] - fx[..., 1])
    b = 200.0 * (fx[..., 1] - fx[..., 2])
    return np.stack([L, a, b], -1)


def lab_to_rgb(lab: np.ndarray) -> np.ndarray:
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = fy + lab[..., 1] / 500.0
    fz = fy - lab[..., 2] / 200.0
    xyz = np.stack([_finv(fx), _finv(fy), _finv(fz)], -1) * _WHITE
    rgb = xyz @ _XYZ2RGB.T
    return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)


def clahe_rgb(img: np.ndarray, clip_limit: float = 2.0,
              grid: Tuple[int, int] = (8, 8)) -> np.ndarray:
    """CLAHE on the LAB lightness channel of an RGB uint8 image — the
    reference's exact TTA transform (gpu_handler.py:103-117)."""
    lab = rgb_to_lab(img)
    l8 = np.clip(np.round(lab[..., 0] * 255.0 / 100.0), 0, 255).astype(np.uint8)
    l8 = clahe_gray(l8, clip_limit, grid)
    lab[..., 0] = l8.astype(np.float32) * 100.0 / 255.0
    return lab_to_rgb(lab)


# ------------------------------------------------------------ device (jnp)
#
# Exact tile-histogram CLAHE on device, reformulated for TPU (round 3):
# XLA lowers both scatter (segment_sum histograms) and per-pixel gather
# (LUT lookups) to serialized scalar memory ops on TPU — measured at
# 2.8 s/batch-128, which collapsed the whole TTA ladder to 14 tiles/s.
# The rewrite keeps the algorithm bit-identical to clahe_gray above (and
# therefore to cv2) but uses only ops the TPU runs wide:
#   * histograms: compare-and-reduce (tiles[...,None] == bins).sum() —
#     a fused vectorized reduction, no scatter (27 ms)
#   * LUT application: the image splits into half-tile blocks whose four
#     contributing tiles are *static*, so the per-block corner LUTs come
#     from repeat/pad/slice (zero gathers), and the 256-entry lookup is
#     decomposed by value bits: hi 5 bits via a one-hot ×LUT matmul on
#     the MXU, lo 3 bits via a fused eq+select reduction (39 ms,
#     bit-exact vs the gather formulation; was 2820 ms)
# A/B numbers: BASELINE.md round-3 TTA section.


def _tile_histograms(l8, grid, subsample: int = 1):
    """int32 [B,H,W] → (hist [B,gh,gw,256] int32, (th, tw), n_px).

    Per-tile histograms by compare-and-reduce, NOT segment_sum — scatter
    lowers to serialized per-element updates on TPU and was measured to
    dominate the whole TTA step (round 3); an eq+sum over the tile's
    pixels fuses into a vectorized reduction with no scatter at all.

    subsample > 1 estimates each tile's histogram from a stride-s pixel
    lattice (s² fewer compares; the clip limit scales with the counted
    pixel count, so the clip/redistribute semantics are unchanged). The
    LUTs become an approximation of the exact CLAHE — accuracy/THROUGHPUT
    trade recorded in BASELINE.md round 4; subsample=1 is bit-exact.

    The stride self-clamps so every tile keeps >= 1024 sampled pixels:
    below that the integer clip (int(clip_limit·n/256)) quantizes too
    coarsely and the uniform redistribute flattens the LUT toward a ramp
    (measured round 4: a 960-px tile at stride 2 → clip 11→2, LUT mean
    abs err 28.7/255 — vs 2.1 at the production 6400-px tiles)."""
    import jax.numpy as jnp

    b, h, w = l8.shape
    gh, gw = grid
    th, tw = -(-h // gh), -(-w // gw)
    while subsample > 1 and \
            (-(-th // subsample)) * (-(-tw // subsample)) < 1024:
        subsample -= 1
    pad_h, pad_w = th * gh - h, tw * gw - w
    padded = jnp.pad(l8, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
    tiles = padded.reshape(b, gh, th, gw, tw)
    if subsample > 1:
        tiles = tiles[:, :, ::subsample, :, ::subsample]
    sh, sw = tiles.shape[2], tiles.shape[4]
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(b, gh, gw, sh * sw)
    bins = jnp.arange(256, dtype=padded.dtype)
    hist = (tiles[..., None] == bins).astype(jnp.int32).sum(3)
    return hist, (th, tw), sh * sw


def _luts_from_hist(hist, clip_limit, n_px):
    """[B,gh,gw,256] int32 histograms → f32 [B,gh,gw,256] LUTs (cv2's
    clip/uniform-redistribute/CDF-normalize semantics, as clahe_gray)."""
    import jax.numpy as jnp

    clip = max(1, int(clip_limit * n_px / 256.0))
    excess = jnp.maximum(hist - clip, 0).sum(-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess // 256
    rem = excess % 256
    hist = hist + (jnp.arange(256)[None, None, None, :] < rem)
    cdf = jnp.cumsum(hist, -1)
    big = jnp.int32(2 ** 30)
    cdf_min = jnp.min(jnp.where(cdf > 0, cdf, big), -1, keepdims=True)
    cdf_min = jnp.where(cdf[..., -1:] > 0, cdf_min, 0)
    denom = jnp.maximum(cdf[..., -1:] - cdf_min, 1)
    return jnp.clip(jnp.round(
        (cdf - cdf_min).astype(jnp.float32) * 255.0
        / denom.astype(jnp.float32)), 0, 255)


def _pallas_apply_engages(h, w, grid, backend: str) -> bool:
    """Decide whether the Pallas LUT-apply kernel (ops/clahe_pallas) runs:
    'pallas' / 'pallas_interpret' force it (tests, A/B); everything else —
    including 'auto' — takes the jnp lowering, which the round-5 on-chip
    A/B measured FASTER (examples/ab_tta_clahe.py, 2026-08-20: TTA
    end-to-end 381.3 t/s xla vs 264.9 pallas at hist_subsample=1, CLAHE
    stage 153.6 vs 232.0 ms/128-batch — BASELINE.md round-5 table). The
    kernel is kept as an explicit backend for future geometries where a
    VMEM-resident one-hot could win, not as a default."""
    from aerial_image_recognition_tpu.ops import clahe_pallas as cp

    if backend not in ("pallas", "pallas_interpret"):
        return False
    if not cp.supports_geometry(h, w, *grid):
        raise ValueError(f"pallas CLAHE apply unsupported for "
                         f"{h}x{w} grid {grid}")
    return True


def clahe_gray_device(l8, clip_limit: float = 2.0,
                      grid: Tuple[int, int] = (8, 8),
                      hist_subsample: int = 1, backend: str = "auto"):
    """int32 [B, H, W] values 0..255 → int32 [B, H, W], batched jnp CLAHE.

    Bit-faithful port of clahe_gray (same padding, clip/redistribution,
    CDF normalization, and LUT interpolation semantics) at the default
    hist_subsample=1; >1 estimates the per-tile histograms from a
    stride-s lattice (see _tile_histograms). The LUT-application stage
    runs as jnp (measured-best on chip, BASELINE.md round 5);
    backend='pallas' forces the bit-identical ops/clahe_pallas kernel."""
    out = clahe_gray_device_multi(l8, [clip_limit], grid,
                                  hist_subsample=hist_subsample,
                                  backend=backend)
    return out[0]


def clahe_gray_device_multi(l8, clip_limits, grid=(8, 8), *,
                            hist_subsample: int = 1,
                            backend: str = "auto"):
    """int32 [B,H,W] × V clip limits → int32 [V,B,H,W] in ONE pass.

    Only the clip/redistribute step depends on the clip value, so the
    histograms are shared across V. How the LUTs get APPLIED depends on
    the backend: backend='pallas' folds all V variants into one
    VMEM-resident bit-split lookup (ops/clahe_pallas) — free of the
    HBM-materialized one-hot that made the V-fold LOSE as pure XLA
    (118 → 182 ms/batch-128, BASELINE.md round 3) — but the round-5
    on-chip A/B measured the whole kernel slower than the per-variation
    XLA ladder anyway (232.0 vs 153.6 ms/128-batch; TTA end-to-end 264.9
    vs 381.3 t/s — BASELINE.md round 5), so 'auto' takes the XLA paths.
    Bit-identical to V separate clahe_gray_device calls either way
    (pinned in tests/test_clahe.py + tests/test_clahe_pallas.py)."""
    import jax.numpy as jnp

    b, h, w = l8.shape
    gh, gw = grid
    hist, (th, tw), n_px = _tile_histograms(l8, grid, hist_subsample)
    luts = jnp.stack([_luts_from_hist(hist, c, n_px)
                      for c in clip_limits], axis=3)   # [B,gh,gw,V,256]

    if _pallas_apply_engages(h, w, grid, backend):
        from aerial_image_recognition_tpu.ops.clahe_pallas import (
            apply_luts_pallas)
        out = apply_luts_pallas(luts, l8, gh, gw, th, tw,
                                interpret=(backend == "pallas_interpret"))
    elif h == gh * th and w == gw * tw and th % 2 == 0 and tw % 2 == 0:
        out = _apply_luts_blocked(luts, l8, gh, gw, th, tw)
    else:
        out = jnp.stack([_apply_luts_gather(luts[:, :, :, v], l8,
                                            gh, gw, th, tw)
                         for v in range(len(clip_limits))])
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)


def _interp_weights_1d(n_img: int, tile: int, g: int):
    """Fractional bilinear weight toward the i1 (next) tile per pixel."""
    import jax.numpy as jnp

    f = (jnp.arange(n_img, dtype=jnp.float32) + 0.5) / tile - 0.5
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, g - 1)
    return jnp.clip(f - i0, 0.0, 1.0)


def _apply_luts_gather(luts, l8, gh, gw, th, tw):
    """Per-pixel gather of the 4 surrounding tiles' LUTs (general shapes;
    slow on TPU — the blocked path below is used whenever it applies)."""
    import jax.numpy as jnp

    b, h, w = l8.shape
    bi = jnp.arange(b)[:, None, None]
    fy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / th - 0.5
    fx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, gh - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, gw - 1)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    wx = jnp.clip(fx - x0, 0.0, 1.0)

    v = l8
    y0b, y1b = jnp.broadcast_to(y0, (h, w)), jnp.broadcast_to(y1, (h, w))
    x0b, x1b = jnp.broadcast_to(x0, (h, w)), jnp.broadcast_to(x1, (h, w))
    p00 = luts[bi, y0b[None], x0b[None], v]
    p01 = luts[bi, y0b[None], x1b[None], v]
    p10 = luts[bi, y1b[None], x0b[None], v]
    p11 = luts[bi, y1b[None], x1b[None], v]
    return ((1 - wy) * ((1 - wx) * p00 + wx * p01)
            + wy * ((1 - wx) * p10 + wx * p11))


def _corner_tables(luts, gh, gw):
    """[B,gh,gw,K] → [B,2gh,2gw,4,K]: for every half-tile block, the
    LUT rows of its four bilinear corner tiles (y0x0, y0x1, y1x0, y1x1).

    Pixels inside one half-tile block all share the same corner tiles,
    and the block→tile maps (qy-1)//2 and (qy+1)//2 (clamped) are static
    repeat/shift patterns — so the tables are built from repeat + edge-pad
    + slice with no gather at all."""
    import jax.numpy as jnp

    r = jnp.repeat(luts, 2, axis=1)                      # qy → qy//2
    ly0 = jnp.pad(r, ((0, 0), (1, 0), (0, 0), (0, 0)), mode="edge")[:, :2 * gh]
    ly1 = jnp.pad(r, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")[:, 1:]

    def xdir(t):
        r2 = jnp.repeat(t, 2, axis=2)
        x0 = jnp.pad(r2, ((0, 0), (0, 0), (1, 0), (0, 0)), mode="edge")[:, :, :2 * gw]
        x1 = jnp.pad(r2, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")[:, :, 1:]
        return x0, x1

    l00, l01 = xdir(ly0)
    l10, l11 = xdir(ly1)
    return jnp.stack([l00, l01, l10, l11], axis=3)


def _apply_luts_blocked(luts, l8, gh, gw, th, tw):
    """TPU-fast LUT application: half-tile blocks × bit-split lookup,
    for V LUT variants at once (luts [B,gh,gw,V,256] → out [V,B,H,W]).

    For each block the 4 corner LUTs [4,256] are reshaped to [4,32,8];
    the hi 5 bits of each pixel select a [V,4,8] row via a one-hot matmul
    (MXU), the lo 3 bits select within it via a fused eq+multiply
    reduction (VPU), and the 4 corner values blend with the standard
    bilinear weights in exactly clahe_gray's nesting order — bit-exact
    with _apply_luts_gather, measured 72× faster at batch 128 (39 vs
    2820 ms, BASELINE.md round 3). The pixel one-hots and bilinear
    weights are clip-independent, so V variants share everything except
    one wider MXU contraction (the multi-clip TTA win; V-folded results
    are bit-identical to V single calls — each output element is the
    same K=32 contraction either way)."""
    import jax
    import jax.numpy as jnp

    b, h, w = l8.shape
    nv = luts.shape[3]
    bh, bw = th // 2, tw // 2
    qh, qw = 2 * gh, 2 * gw
    L4 = _corner_tables(luts.reshape(b, gh, gw, nv * 256), gh, gw)
    L4 = L4.reshape(b, qh, qw, 4, nv, 256)               # [B,qh,qw,4,V,256]
    vb = l8.reshape(b, qh, bh, qw, bw).transpose(0, 1, 3, 2, 4)
    vb = vb.reshape(b, qh, qw, bh * bw)

    wy = _interp_weights_1d(h, th, gh).reshape(qh, bh)
    wx = _interp_weights_1d(w, tw, gw).reshape(qw, bw)
    wyf = jnp.broadcast_to(wy[:, None, :, None], (qh, qw, bh, bw))
    wxf = jnp.broadcast_to(wx[None, :, None, :], (qh, qw, bh, bw))
    wyf = wyf.reshape(qh, qw, bh * bw)[..., None]
    wxf = wxf.reshape(qh, qw, bh * bw)[..., None]

    def chunk(args):
        L4c, vc = args                       # [C,qh,qw,4,V,256] / [C,qh,qw,P]
        c = L4c.shape[0]
        L2 = L4c.reshape(c, qh, qw, 4, nv, 32, 8).astype(jnp.bfloat16)
        hi = vc >> 3
        lo = vc & 7
        hi_oh = (hi[..., None] == jnp.arange(32)).astype(jnp.bfloat16)
        L4m = L2.transpose(0, 1, 2, 5, 4, 3, 6).reshape(
            c, qh, qw, 32, nv * 4 * 8)
        tmp = jax.lax.dot_general(                       # [C,qh,qw,P,V·32]
            hi_oh, L4m,
            (((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.bfloat16)         # values ≤255: exact
        tmp = tmp.reshape(c, qh, qw, bh * bw, nv, 4, 8).astype(jnp.float32)
        lo_oh = (lo[..., None] == jnp.arange(8)).astype(jnp.float32)
        p = (tmp * lo_oh[..., None, None, :]).sum(6)     # [C,qh,qw,P,V,4]
        return ((1 - wyf) * ((1 - wxf) * p[..., 0] + wxf * p[..., 1])
                + wyf * ((1 - wxf) * p[..., 2] + wxf * p[..., 3]))

    cs = min(b, 32)                # bound the matmul intermediate (~1.6 GB)
    while b % cs:
        cs -= 1
    L4c = L4.reshape(b // cs, cs, qh, qw, 4, nv, 256)
    vbc = vb.reshape(b // cs, cs, qh, qw, bh * bw)
    out = jax.lax.map(chunk, (L4c, vbc))                 # [B/C,C,qh,qw,P,V]
    out = out.reshape(b, qh, qw, bh, bw, nv)
    out = out.transpose(5, 0, 1, 3, 2, 4)
    return out.reshape(nv, b, h, w)


def _lab_forward_device(rgb):
    """f32 [...,3] RGB 0..1 → (L, a, b) channels (mirrors rgb_to_lab)."""
    import jax.numpy as jnp

    m = jnp.asarray(_RGB2XYZ)
    white = jnp.asarray(_WHITE)
    xyz = rgb @ m.T / white
    d = 6.0 / 29.0
    fxyz = jnp.where(xyz > d**3, jnp.cbrt(xyz), xyz / (3 * d * d) + 4.0 / 29.0)
    L = 116.0 * fxyz[..., 1] - 16.0
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    bb = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    return L, a, bb


def _lab_inverse_device(L2, a, bb):
    """(L, a, b) → f32 [...,3] RGB 0..1 (mirrors lab_to_rgb)."""
    import jax.numpy as jnp

    d = 6.0 / 29.0
    white = jnp.asarray(_WHITE)
    fy = (L2 + 16.0) / 116.0
    fx2 = fy + a / 500.0
    fz = fy - bb / 200.0
    f3 = jnp.stack([fx2, fy, fz], -1)
    xyz2 = jnp.where(f3 > d, f3**3, 3 * d * d * (f3 - 4.0 / 29.0)) * white
    out = xyz2 @ jnp.asarray(_XYZ2RGB).T
    return jnp.clip(out, 0.0, 1.0)


def clahe_rgb_device(x, clip_limit: float = 2.0,
                     grid: Tuple[int, int] = (8, 8),
                     hist_subsample: int = 1, backend: str = "auto"):
    """float [B,H,W,3] in 0..1 → float [B,H,W,3]: exact CLAHE on the LAB
    lightness channel (device mirror of clahe_rgb, for the TTA stack).
    hist_subsample > 1 trades histogram exactness for throughput (see
    _tile_histograms)."""
    import jax.numpy as jnp

    dtype = x.dtype
    rgb = x.astype(jnp.float32)
    L, a, bb = _lab_forward_device(rgb)
    l8 = jnp.clip(jnp.round(L * 255.0 / 100.0), 0, 255).astype(jnp.int32)
    l8 = clahe_gray_device(l8, clip_limit, grid, hist_subsample, backend)
    L2 = l8.astype(jnp.float32) * 100.0 / 255.0
    return _lab_inverse_device(L2, a, bb).astype(dtype)


def clahe_rgb_device_multi(x, clip_limits, grid=(8, 8), *,
                           hist_subsample: int = 1, backend: str = "auto"):
    """float [B,H,W,3] × V clip limits → float [V,B,H,W,3] in one pass.

    Shares the LAB forward transform, the per-tile histograms, and the
    lookup's one-hots across the V clip parameterizations (the TTA
    ladder's 3 clahe_* variations); per-image results are bit-identical
    to V separate clahe_rgb_device calls. Backends as
    clahe_gray_device_multi (Pallas kernel on TPU)."""
    import jax.numpy as jnp

    dtype = x.dtype
    rgb = x.astype(jnp.float32)
    L, a, bb = _lab_forward_device(rgb)
    l8 = jnp.clip(jnp.round(L * 255.0 / 100.0), 0, 255).astype(jnp.int32)
    l8v = clahe_gray_device_multi(l8, clip_limits, grid,
                                  hist_subsample=hist_subsample,
                                  backend=backend)        # [V,B,H,W]
    L2 = l8v.astype(jnp.float32) * 100.0 / 255.0
    return _lab_inverse_device(L2, a[None], bb[None]).astype(dtype)
