"""Pallas TPU kernel for the CLAHE LUT-application stage (all clips fused).

Why a kernel: the XLA blocked formulation (ops/clahe._apply_luts_blocked)
is exact and 72x faster than gathers, but it must MATERIALIZE the hi-bit
one-hot matmul operand in HBM (~840 MB per 128x640^2 batch at bf16) plus
the matmul output — measured ~39 ms per clip, x3 clips = the dominant cost
of the TTA ladder (BASELINE.md round 4 profile). Here one grid program
handles one half-tile block-row of one image: the one-hot lives only in
VMEM, the 256-entry lookup stays the same exact bit-split contraction
(hi 5 bits -> one-hot x LUT matmul on the MXU, exact in bf16 since LUT
values are integers <= 255 and a one-hot picks a single one; lo 3 bits ->
eq+multiply reduction), and all V clip variants share the one one-hot by
widening the matmul rhs — the V-fold that LOST under XLA (it tripled the
HBM-resident operand, BASELINE.md round 3) is free in VMEM.

HBM traffic per 128-batch drops from ~2.5 GB x V to:
  l8 209 MB (read) + LUTs ~25 MB + out 629 MB (V=3, f32) ~= 0.9 GB total.

Numerics vs _apply_luts_blocked: the lookup contraction and blend nesting
are reproduced exactly (both select integer LUT entries, so the matmuls
are exact); the only residual freedom is XLA fma fusion in the bilinear
blend, worth <=1 ULP of f32 at 255-scale pre-round — after
clahe_gray_device's round-to-level, outputs differ by <=1 level on a
vanishing fraction of pixels (measured 3/294912; dyadic-weight
geometries, e.g. 128 px, are raw-bit-identical). Pinned by
tests/test_clahe_pallas.py. Reference TTA transform this serves:
/root/reference/_script/gpu_handler.py:103-137.

Geometry guard (falls back to the XLA path otherwise): even tile dims,
image an exact tile multiple, lane-dim-friendly W (multiple of 128) and
block rows a multiple of 8.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corner_rows(qi: int, g: int):
    """Static corner tile rows for half-tile block qi (matches
    ops/clahe._corner_tables: repeat + edge-pad + slice semantics)."""
    lo = max(qi - 1, 0) // 2
    hi = min((qi + 1) // 2, g - 1)
    return lo, hi


def _apply_kernel(l8_ref, lutA_ref, lutB_ref, wy_ref, wx_ref, out_ref, *,
                  gw: int, bh: int, bw: int, nv: int):
    """One program = one half-tile block-row (bh rows) of one image.

    l8_ref  [1, bh, W] int32      pixel values 0..255
    lutA_ref/lutB_ref [1, 1, gw, 32, nv*8] bf16   LUT rows y0 / y1 for this
        block-row, pre-arranged (v-major lane layout: lane = v*8 + lo)
    wy_ref  [1, 1, bh] f32        fractional weight toward y1 per row
        (kept 3-D so the block's trailing dims are (1, bh) — Mosaic
        requires dim -2 divisible by 8 or equal to the array dim)
    wx_ref  [qw, bw] f32          fractional weight toward x1 per column
    out_ref [nv, 1, bh, W] f32
    """
    qw = 2 * gw
    v_img = l8_ref[0]                                   # [bh, W] int32
    lutA = lutA_ref[0, 0]                               # [gw, 32, nv*8]
    lutB = lutB_ref[0, 0]
    wy = wy_ref[0, 0].reshape(bh, 1)                    # [bh, 1]

    rows = [[] for _ in range(nv)]
    for qx in range(qw):
        x0, x1 = _corner_rows(qx, gw)
        # rhs [32, 4*nv*8]: corners major (y0x0, y0x1, y1x0, y1x1), then
        # the pre-arranged (v, lo) lanes — one matmul serves every clip
        L = jnp.concatenate([lutA[x0], lutA[x1], lutB[x0], lutB[x1]],
                            axis=-1)                    # [32, 4*nv*8]
        vq = v_img[:, qx * bw:(qx + 1) * bw]            # static slice (qx
        # is a Python int; dynamic_slice doesn't lower in Mosaic)
        hi = vq >> 3                                    # [bh, bw]
        lo = vq & 7
        hi_oh = (hi[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (bh, bw, 32), 2)).astype(jnp.bfloat16)
        hi_oh = hi_oh.reshape(bh * bw, 32)
        tmp = jax.lax.dot_general(                      # [bh*bw, 4*nv*8]
            hi_oh, L, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # Mosaic requires a
        # 32-bit acc; exact either way (one-hot picks an integer <= 255)
        tmp = tmp.reshape(bh, bw, 4 * nv * 8)
        lo_oh = (lo[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (bh, bw, 8), 2)).astype(jnp.float32)
        wx = wx_ref[qx].reshape(1, bw)                  # [1, bw]
        for v in range(nv):
            p = [None] * 4
            for c in range(4):
                s = tmp[:, :, (c * nv + v) * 8:(c * nv + v) * 8 + 8]
                p[c] = (s * lo_oh).sum(-1)              # [bh, bw]
            # EXACTLY _apply_luts_blocked's blend nesting (bit-parity):
            # (1-wy)((1-wx)p0 + wx p1) + wy((1-wx)p2 + wx p3)
            rows[v].append((1 - wy) * ((1 - wx) * p[0] + wx * p[1])
                           + wy * ((1 - wx) * p[2] + wx * p[3]))
    for v in range(nv):
        out_ref[v, 0] = jnp.concatenate(rows[v], axis=1)   # [bh, W]


def supports_geometry(h: int, w: int, gh: int, gw: int) -> bool:
    th, tw = -(-h // gh), -(-w // gw)
    return (h == gh * th and w == gw * tw and th % 2 == 0 and tw % 2 == 0
            and (th // 2) % 8 == 0 and w % 128 == 0)


def apply_luts_pallas(luts, l8, gh: int, gw: int, th: int, tw: int,
                      interpret: bool = False):
    """[B,gh,gw,V,256] f32 LUTs x [B,H,W] int32 -> [V,B,H,W] f32.

    Drop-in for ops/clahe._apply_luts_blocked on supported geometries
    (supports_geometry); numerically identical (same exact contraction)."""
    from aerial_image_recognition_tpu.ops.clahe import _interp_weights_1d

    b, h, w = l8.shape
    nv = luts.shape[3]
    bh, bw = th // 2, tw // 2
    qh, qw = 2 * gh, 2 * gw

    # [B,gh,gw,V,256] -> [B,gh,gw,32,V*8] bf16 (hi-bit rows x (v,lo) lanes)
    lut_r = luts.reshape(b, gh, gw, nv, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    lut_r = lut_r.reshape(b, gh, gw, 32, nv * 8).astype(jnp.bfloat16)

    wy = _interp_weights_1d(h, th, gh).reshape(qh, 1, bh)
    wx = _interp_weights_1d(w, tw, gw).reshape(qw, bw)

    # corner rows as scalar index-map arithmetic (mirrors _corner_rows /
    # ops/clahe._corner_tables): y0 = max(q-1,0)//2, y1 = min((q+1)//2, gh-1)
    def y0_map(i, q):
        return i, jnp.maximum(q - 1, 0) // 2, 0, 0, 0

    def y1_map(i, q):
        return i, jnp.minimum((q + 1) // 2, gh - 1), 0, 0, 0

    kernel = partial(_apply_kernel, gw=gw, bh=bh, bw=bw, nv=nv)
    return pl.pallas_call(
        kernel,
        grid=(b, qh),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, q: (i, q, 0)),
            pl.BlockSpec((1, 1, gw, 32, nv * 8), y0_map),
            pl.BlockSpec((1, 1, gw, 32, nv * 8), y1_map),
            pl.BlockSpec((1, 1, bh), lambda i, q: (q, 0, 0)),
            pl.BlockSpec((qw, bw), lambda i, q: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nv, 1, bh, w), lambda i, q: (0, i, q, 0)),
        out_shape=jax.ShapeDtypeStruct((nv, b, h, w), jnp.float32),
        # the unrolled qw-iteration loop keeps every iteration's lane-padded
        # intermediates on the Mosaic stack (~50 MB measured) — raise the
        # scoped-VMEM limit from the 16 MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(l8, lut_r, lut_r, wy, wx)
