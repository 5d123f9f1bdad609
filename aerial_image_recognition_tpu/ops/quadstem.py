"""Quad-conv stem: the yolov7-tiny stride-2 stems as MXU-shaped 2x2 convs.

Per-stage profiling (examples/profile_backbone.py, batch 128 x 640^2)
showed stem0 + stem1 cost 9.2-10 ms of the ~27 ms forward: the 3-channel
first conv fills 3/128 MXU lanes and sits ~5x above its memory floor.
Measured alternatives (examples/ab_stem.py, examples/ab_quadstem.py,
interleaved same-process A/B on the v5e chip):

  - device-side space-to-depth rewrite (XLA): LOSES, 12.7 vs 9.2 ms — the
    relayout of a 3-channel 640^2 batch costs 6.7-7.9 ms on its own.
  - hand-written Pallas fused-stem kernel (both convs + intermediate in
    VMEM, grid-pipelined bands, quad/s2d weight transforms): compiles and
    is exact, but 13.3 ms kernel-only — Mosaic's relayout/concat overhead
    around the many small-K matmuls swamps the HBM saving (kept in git
    history at ops/pallas_stem.py, removed from the tree).
  - THIS module: assemble the batch in space_to_depth^2 layout on the
    HOST (a strided memcpy during batch assembly — the bytes crossing
    PCIe are identical), then run the two stems as plain XLA convs over
    [B, H/4, W/4, 48]: 2x2 kernels, contraction 192/512, output width
    128/64. 6.4 ms vs 10.1 ms for the uint8->feature chain — and XLA
    fuses the uint8 cast + /255 into the first conv.

Stage 1 computes a 2x2 quad of output pixels jointly (N = (a,b,c0) = 128),
and its output channel order IS the s2d layout of the intermediate, so
stage 2 is directly the equivalent 2x2-conv form of the second stride-2
conv. Both weight transforms are exact (zero-padded taps), derived in the
docstrings below; BN is folded into the conv weights first
(models.layers.fold_batchnorm algebra — deploy-form conv+bias only).

Replaces the hot half of the opaque ONNX stem the reference executes via
onnxruntime (/root/reference/_script/gpu_handler.py:39-65).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def s2d_kernel_transform(w):
    """[3,3,Cin,Cout] stride-2 torch-padded (k//2 = (1,1)) conv kernel ->
    [2,2,4*Cin,Cout]: the equivalent stride-1 2x2 conv over the
    space_to_depth2 grid, cell-space padding ((1,0),(1,0)).

    Torch-padded stride-2 out[y] reads rows 2y-1..2y+1 = s2d cell y-1
    (dy 1) and cell y (dy 0,1); tap (u, v, dy, dx) over cells
    (y-1+u, x-1+v) maps to original tap (2u+dy-1, 2v+dx-1), zero where
    that falls outside the 3x3 support (only (u,dy)=(0,0)). The
    input-channel axis is s2d order (dy, dx, c), matching
    models.layers.space_to_depth2. Parity-pinned in tests/test_quadstem.py.
    """
    k, _, cin, cout = np.shape(w)
    assert k == 3
    w = jnp.asarray(w, jnp.float32)
    w4 = jnp.zeros((2, 2, 2, 2, cin, cout), jnp.float32)  # [u,v,dy,dx,c,o]
    for u in range(2):
        for dy in range(2):
            ky = 2 * u + dy - 1
            if not 0 <= ky <= 2:
                continue
            for v in range(2):
                for dx in range(2):
                    kx = 2 * v + dx - 1
                    if not 0 <= kx <= 2:
                        continue
                    w4 = w4.at[u, v, dy, dx].set(w[ky, kx])
    return w4.reshape(2, 2, 4 * cin, cout)


def quad_kernel_transform(w):
    """[3,3,Cin,Cout] stride-2 torch-padded (k//2 = (1,1)) conv kernel ->
    [2,2,16*Cin,4*Cout]: a stride-1 2x2 conv over quad-layout cells (4x4
    original pixels per cell) computing a 2x2 OUTPUT quad jointly,
    cell-space padding ((1,0),(1,0)).

    Output quad pixel (a, b) of cell (R, C) is conv output (2R+a, 2C+b),
    reading original rows 4R + 2a + ky − 1 — i.e. quad cell row R+p with
    p = (2a+ky−1)//4 (floor; −1 → previous cell, covered by the lo pad)
    and in-cell offset (e, dy) = divmod((2a+ky−1) mod 4, 2). The kernel
    tap index is u = p+1 ∈ {0,1}. Input channels use the HOST-PACK order
    (e, dy, f, dx, c) — chosen so the ingest plane's relayout is four
    bulk row-strided copies (see host_s2d2_into), NOT the
    (e, f, dy, dx, c) order two applications of space_to_depth2 would
    give. Output channels are (a, b, Cout) — exactly the s2d layout of
    the produced feature map.
    """
    k, _, cin, cout = np.shape(w)
    assert k == 3
    w = jnp.asarray(w, jnp.float32)
    wq = jnp.zeros((2, 2, 2, 2, 2, 2, cin, 2, 2, cout), jnp.float32)
    # [u, v, e, dy, f, dx, c, a, b, o]
    for a in range(2):
        for ky in range(3):
            p, r = divmod(2 * a + ky - 1, 4)
            e, dy = divmod(r, 2)
            for b in range(2):
                for kx in range(3):
                    q, s = divmod(2 * b + kx - 1, 4)
                    f, dx = divmod(s, 2)
                    wq = wq.at[p + 1, q + 1, e, dy, f, dx, :, a, b, :].set(
                        w[ky, kx])
    return wq.reshape(2, 2, 16 * cin, 4 * cout)


def host_s2d2(px: np.ndarray) -> np.ndarray:
    """Quad-layout host relayout: [H,W,C] -> [H/4,W/4,16C]
    (or batched [B,H,W,C] -> [B,H/4,W/4,16C]).

    Channel order is (e, dy, f, dx, c) with original pixel
    (4R + 2e + dy, 4C + 2f + dx) — row-parities first, so that for each
    input ROW the destination bytes form contiguous 4C-byte runs: the
    whole relayout is four bulk strided copies (one per (e, dy)), ~4x
    fewer/larger memcpy runs than the space_to_depth2 channel order.
    The quad-stem conv weights are built for this exact order
    (quad_kernel_transform); PCIe bytes are unchanged vs the plain batch.
    """
    batched = px.ndim == 4
    if not batched:
        px = px[None]
    b, h, w, c = px.shape
    out = np.empty((b, h // 4, w // 4, 16 * c), np.uint8 if
                   px.dtype == np.uint8 else px.dtype)
    view = out.reshape(b, h // 4, w // 4, 2, 2, 2, 2, c)
    for e in range(2):
        for dy in range(2):
            # rows y with y % 4 == 2e + dy, reshaped (C, f, dx, c)
            view[:, :, :, e, dy] = px[:, 2 * e + dy::4].reshape(
                b, h // 4, w // 4, 2, 2, c)
    return out if batched else out[0]


def host_s2d2_inverse(xq: np.ndarray) -> np.ndarray:
    """Inverse of host_s2d2: [B,H/4,W/4,16C] (or unbatched) → [B,H,W,C].

    Host-side only (the int8 self-calibration path needs plain images back
    from an ingest plane that assembles batches in the quad layout)."""
    batched = xq.ndim == 4
    if not batched:
        xq = xq[None]
    b, hq, wq, cc = xq.shape
    c = cc // 16
    view = xq.reshape(b, hq, wq, 2, 2, 2, 2, c)
    px = np.empty((b, hq * 4, wq * 4, c), xq.dtype)
    for e in range(2):
        for dy in range(2):
            px[:, 2 * e + dy::4] = view[:, :, :, e, dy].reshape(
                b, hq, wq * 4, c)
    return px if batched else px[0]


def host_s2d2_into(px: np.ndarray, out: np.ndarray) -> None:
    """In-place form of host_s2d2: write the quad-layout relayout of
    [H,W,C] `px` straight into the preallocated [H/4,W/4,16C] `out` (a
    batch-buffer row). Native 12-byte-run copier when available (GIL
    released — parallelizes across ingest threads), else four bulk numpy
    strided copies."""
    from aerial_image_recognition_tpu.utils.native import pack_quad_native
    if pack_quad_native(px, out):
        return
    h, w, c = px.shape
    view = out.reshape(h // 4, w // 4, 2, 2, 2, 2, c)
    for e in range(2):
        for dy in range(2):
            view[:, :, e, dy] = px[2 * e + dy::4].reshape(
                h // 4, w // 4, 2, 2, c)


def fold_convbn(p, s, eps: float = 1e-3):
    """One ConvBN scope ({conv,bn} params + bn stats) -> (w, b) f32 deploy
    form (models.layers.fold_batchnorm algebra)."""
    k = jnp.asarray(p["conv"]["kernel"], jnp.float32)
    g = jnp.asarray(p["bn"]["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(s["bn"]["var"], jnp.float32) + eps)
    beta = jnp.asarray(p["bn"]["bias"], jnp.float32)
    mean = jnp.asarray(s["bn"]["mean"], jnp.float32)
    return k * g, beta - mean * g


def quad_stem_forward(variables, xq, *, act: str = "leaky",
                      in_scale=1.0 / 255.0, dtype=jnp.bfloat16,
                      stem_names=("stem0", "stem1"), bn_eps: float = 1e-5):
    """s2d^2 input [B,H/4,W/4,48] (uint8 or float) -> stem features
    [B,H/4,W/4,c1], numerically the standard stems applied to x/255 up to
    bf16 rounding (measured max-abs-diff 0.008 at activation scale 0.2).

    bn_eps must match the model family (yolov7: 1e-5, yolov8: 1e-3 —
    models/layers.ConvBN.bn_eps).
    """
    params, stats = variables["params"], variables["batch_stats"]
    w0, b0 = fold_convbn(params[stem_names[0]], stats[stem_names[0]],
                         eps=bn_eps)
    w1, b1 = fold_convbn(params[stem_names[1]], stats[stem_names[1]],
                         eps=bn_eps)
    w0q = quad_kernel_transform(w0)               # [2,2,48,4*c0]
    w1q = s2d_kernel_transform(w1)                # [2,2,4*c0,c1]
    b0q = jnp.tile(b0, 4)

    x = xq.astype(dtype)

    def conv2(v, w):
        # ((1,0),(1,0)) cell-space padding = torch k//2 padding of the
        # underlying stride-2 conv (see the kernel-transform docstrings)
        return jax.lax.conv_general_dilated(
            v, w.astype(v.dtype), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if act == "leaky":
        def act_fn(v):
            return jnp.where(v >= 0, v, v * jnp.asarray(0.1, v.dtype))
    elif act == "silu":
        act_fn = jax.nn.silu
    else:
        raise ValueError(f"unsupported stem activation {act!r}")

    scale = jnp.asarray(in_scale if in_scale is not None else 1.0, dtype)
    h = act_fn(conv2(x, w0q) * scale + b0q.astype(dtype))
    return act_fn(conv2(h, w1q) + b1.astype(dtype))
