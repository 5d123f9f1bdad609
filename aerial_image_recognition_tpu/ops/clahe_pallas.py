"""Pallas TPU kernel for the CLAHE LUT-application stage (all clips fused).

Why a kernel: the XLA blocked formulation (ops/clahe._apply_luts_blocked)
is exact and 72x faster than gathers, but it must MATERIALIZE the hi-bit
one-hot matmul operand in HBM (~3.3 GB per 128x640^2 batch at bf16) plus
the bf16 matmul output (~10 GB each way) — measured ~125 ms per 3-clip
128-batch, the dominant cost of the TTA ladder (BASELINE.md round 4
profile). Here the one-hot never leaves VMEM.

Design (v2 — the v1 block-row kernel measured 591 ms vs XLA's 125 ms and
is the reason for this shape): ONE grid program per half-tile block
(grid b x qh x qw). Each program loads its [bh, bw] pixel block plus the
4 bilinear corner LUTs — corner selection happens in the BlockSpec index
maps (y0 = max(q-1,0)//2, y1 = min((q+1)//2, g-1), mirroring
ops/clahe._corner_tables), so the kernel body has NO loops and ~3 MB of
VMEM stack. v1 instead kept a whole block-row per program with an
unrolled 16-iteration qx loop: Mosaic does not reuse stack across
unrolled iterations, so every iteration's lane-padded intermediates
stayed live (~50 MB scoped stack), which both forced a raised VMEM limit
(and an outright VMEM OOM inside the fused TTA step) and destroyed DMA
pipelining.

The 256-entry lookup is ONE one-hot x LUT matmul on the MXU per program:
one_hot [bh*bw, 256] bf16 (two full lane tiles — no 32-lane padding
waste) x corner-concatenated LUTs [256, 4*nv] with an f32 accumulator.
Exact: a one-hot picks a single integer <= 255 (bf16-representable), and
all nv clip variants share the one one-hot by widening the rhs — the
V-fold that LOST as pure XLA (it tripled the HBM-resident operand,
BASELINE.md round 3) is free in VMEM.

HBM traffic per 128-batch (nv=3): l8 209 MB + relayout 2x209 MB +
LUTs ~25 MB + out 629 MB written + 2x629 MB transpose ~= 2.5 GB total,
~20x less than the XLA path moves.

Numerics vs _apply_luts_blocked: the lookup contraction and blend nesting
are reproduced exactly (both select integer LUT entries, so the matmuls
are exact); the only residual freedom is XLA fma fusion in the bilinear
blend, worth <=1 ULP of f32 at 255-scale pre-round — after
clahe_gray_device's round-to-level, outputs differ by <=1 level on a
vanishing fraction of pixels (measured 3/294912; dyadic-weight
geometries, e.g. 128 px, are raw-bit-identical; the production 640-px
geometry measured raw-bit-identical on chip). Pinned by
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


def _apply_kernel(l8_ref, a00_ref, a01_ref, a10_ref, a11_ref,
                  wy_ref, wx_ref, out_ref, *, bh: int, bw: int, nv: int):
    """One program = one half-tile block of one image.

    l8_ref  [1, 1, 1, bh, bw] int32   pixel values 0..255
    aYX_ref [1, 1, 1, 256, nv] bf16   corner (yY, xX) LUT for this block
        (corner tile row/col resolved by the BlockSpec index maps)
    wy_ref  [1, 1, bh] f32            fractional weight toward y1 per row
    wx_ref  [1, 1, bw] f32            fractional weight toward x1 per col
    out_ref [nv, 1, 1, 1, bh, bw] f32
    """
    v = l8_ref[0, 0, 0]                                 # [bh, bw] int32
    # corners major (y0x0, y0x1, y1x0, y1x1) — clahe_gray's blend order
    L = jnp.concatenate([a00_ref[0, 0, 0], a01_ref[0, 0, 0],
                         a10_ref[0, 0, 0], a11_ref[0, 0, 0]],
                        axis=-1)                        # [256, 4*nv]
    n = bh * bw
    # one-hot built 3-D then collapsed — (bh,bw)->(n,1) is an unsupported
    # Mosaic shape cast, (bh,bw,256)->(n,256) lowers fine
    oh = (v[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (bh, bw, 256), 2)).astype(jnp.bfloat16).reshape(n, 256)
    p = jax.lax.dot_general(                            # [n, 4*nv]
        oh, L, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # Mosaic needs a
    # 32-bit acc; exact either way (one-hot picks an integer <= 255)
    P = p.reshape(bh, bw, 4 * nv)
    wy = wy_ref[0, 0].reshape(bh, 1)
    wx = wx_ref[0, 0].reshape(1, bw)
    for vv in range(nv):
        p0 = P[:, :, 0 * nv + vv]
        p1 = P[:, :, 1 * nv + vv]
        p2 = P[:, :, 2 * nv + vv]
        p3 = P[:, :, 3 * nv + vv]
        # EXACTLY _apply_luts_blocked's blend nesting (bit-parity):
        # (1-wy)((1-wx)p0 + wx p1) + wy((1-wx)p2 + wx p3)
        out_ref[vv, 0, 0, 0] = ((1 - wy) * ((1 - wx) * p0 + wx * p1)
                                + wy * ((1 - wx) * p2 + wx * p3))


def supports_geometry(h: int, w: int, gh: int, gw: int) -> bool:
    th, tw = -(-h // gh), -(-w // gw)
    return (h == gh * th and w == gw * tw and th % 2 == 0 and tw % 2 == 0
            and (th // 2) % 8 == 0 and w % 128 == 0)


def apply_luts_pallas(luts, l8, gh: int, gw: int, th: int, tw: int,
                      interpret: bool = False):
    """[B,gh,gw,V,256] f32 LUTs x [B,H,W] int32 -> [V,B,H,W] f32.

    Drop-in for ops/clahe._apply_luts_blocked on supported geometries
    (supports_geometry); numerics per the module docstring."""
    from aerial_image_recognition_tpu.ops.clahe import _interp_weights_1d

    b, h, w = l8.shape
    nv = luts.shape[3]
    bh, bw = th // 2, tw // 2
    qh, qw = 2 * gh, 2 * gw

    # [B,gh,gw,V,256] -> [B,gh,gw,256,V] bf16 (exact: integers <= 255)
    lutc = luts.transpose(0, 1, 2, 4, 3).astype(jnp.bfloat16)
    # pixels regrouped so one half-tile block is one trailing [bh,bw] tile
    l8b = l8.reshape(b, qh, bh, qw, bw).transpose(0, 1, 3, 2, 4)

    wy = _interp_weights_1d(h, th, gh).reshape(qh, 1, bh)
    wx = _interp_weights_1d(w, tw, gw).reshape(qw, 1, bw)

    # corner rows/cols as index-map arithmetic (mirrors
    # ops/clahe._corner_tables): i0 = max(q-1,0)//2, i1 = min((q+1)//2, g-1)
    def corner(qy, qx, ysel, xsel):
        y = (jnp.maximum(qy - 1, 0) // 2 if ysel == 0
             else jnp.minimum((qy + 1) // 2, gh - 1))
        x = (jnp.maximum(qx - 1, 0) // 2 if xsel == 0
             else jnp.minimum((qx + 1) // 2, gw - 1))
        return y, x

    def lut_map(ysel, xsel):
        def m(i, qy, qx):
            y, x = corner(qy, qx, ysel, xsel)
            return i, y, x, 0, 0
        return m

    lut_spec = lambda ysel, xsel: pl.BlockSpec(
        (1, 1, 1, 256, nv), lut_map(ysel, xsel))

    kernel = partial(_apply_kernel, bh=bh, bw=bw, nv=nv)
    out6 = pl.pallas_call(
        kernel,
        grid=(b, qh, qw),
        in_specs=[
            pl.BlockSpec((1, 1, 1, bh, bw),
                         lambda i, qy, qx: (i, qy, qx, 0, 0)),
            lut_spec(0, 0), lut_spec(0, 1), lut_spec(1, 0), lut_spec(1, 1),
            pl.BlockSpec((1, 1, bh), lambda i, qy, qx: (qy, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda i, qy, qx: (qx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nv, 1, 1, 1, bh, bw),
                               lambda i, qy, qx: (0, i, qy, qx, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nv, b, qh, qw, bh, bw),
                                       jnp.float32),
        interpret=interpret,
    )(l8b, lutc, lutc, lutc, lutc, wy, wx)
    return out6.transpose(0, 1, 2, 4, 3, 5).reshape(nv, b, h, w)
