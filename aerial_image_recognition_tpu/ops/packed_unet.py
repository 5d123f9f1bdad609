"""Packed (space-to-depth layout) lowering for XUnet's full-res stages.

Round-2 profiling (BASELINE.md, examples/profile_xunet_latency.py) showed
the 256² ends dominate XUnet-256 latency — enc0 ≈ 14 ms and dec2/dec3
≈ 37 ms of the ~80 ms batch-256 forward — for the same reason the yolov7
stems did: 3- and 32-channel convs fill 3/128 and 32/128 of the MXU's
lanes. Round 2 rejected this lowering on a ≤25-30% ESTIMATE; round 3
builds and MEASURES it (VERDICT r2 item 7, examples/ab_xunet_packed.py).

The lowering: keep the 256² feature maps in space_to_depth2 layout
[B,128,128,4C] (channel order (dy, dx, c), models/layers.space_to_depth2)
and run each full-res 3×3 conv as FOUR 2×2-cell convs — one per output
subpixel (a, b), each with its own one-sided cell padding:

    out(2Y+a, 2X+b) = Σ_{ky,kx} w[ky,kx] · in(2Y+a+ky−1, 2X+b+kx−1)
    row term: t = a+ky−1 = 2p + dy  ⇒  cell Y+p, subrow dy
    a = 0 ⇒ p ∈ {−1,0} (pad lo), a = 1 ⇒ p ∈ {0,1} (pad hi)

Per-cell MACs go 36·Cin·Cout → 64·Cin·Cout (1.78×) while lane occupancy
goes 4× — plus the 2× upsample becomes a channel tile and the 1×1 convs
above/below it collapse to quarter-size (computed once per duplicated
pixel instead of four times). Whether the trade wins is an empirical MXU
question; the A/B records the verdict in BASELINE.md.

Everything here is inference-form: ConvBN is folded to conv+bias first
(ops.quadstem.fold_convbn algebra, xunet bn_eps=1e-3).
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from aerial_image_recognition_tpu.ops.quadstem import fold_convbn


def host_s2d(px: np.ndarray) -> np.ndarray:
    """numpy space_to_depth2: [B,H,W,C] (or [H,W,C]) → [B,H/2,W/2,4C],
    channel order (dy, dx, c) — the layout the packed forward consumes."""
    batched = px.ndim == 4
    if not batched:
        px = px[None]
    b, h, w, c = px.shape
    x = px.reshape(b, h // 2, 2, w // 2, 2, c)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    out = x.reshape(b, h // 2, w // 2, 4 * c)
    return out if batched else out[0]


def s2d_unpack(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H/2,W/2,4C] s2d layout → [B,H,W,C] (depth-to-space)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def s2d_conv3x3_kernel(w, a: int, b: int) -> jnp.ndarray:
    """[3,3,Cin,Cout] full-res stride-1 (pad 1) conv kernel → the
    [2,2,4Cin,Cout] cell kernel computing output subpixel (a, b).
    Input channel axis is s2d order (dy, dx, c)."""
    k, _, cin, cout = np.shape(w)
    assert k == 3
    w = jnp.asarray(w, jnp.float32)
    kk = jnp.zeros((2, 2, 2, 2, cin, cout), jnp.float32)  # [u,v,dy,dx,c,o]
    for ky in range(3):
        t = a + ky - 1
        p, dy = divmod(t, 2)                  # python divmod: p∈{-1,0,1}
        u = p + 1 if a == 0 else p
        for kx in range(3):
            s = b + kx - 1
            q, dx = divmod(s, 2)
            v = q + 1 if b == 0 else q
            kk = kk.at[u, v, dy, dx].set(w[ky, kx])
    return kk.reshape(2, 2, 4 * cin, cout)


def s2d_conv3x3(x: jnp.ndarray, kernels, bias=None, act=None) -> jnp.ndarray:
    """Full-res 3×3 conv on an s2d-layout tensor.

    x: [B,H2,W2,4Cin]; kernels: {(a,b): [2,2,4Cin,Cout]} from
    s2d_conv3x3_kernel. Returns [B,H2,W2,4Cout] in s2d order."""
    outs = []
    for a in (0, 1):
        for b in (0, 1):
            pad = ((1, 0) if a == 0 else (0, 1),
                   (1, 0) if b == 0 else (0, 1))
            o = jax.lax.conv_general_dilated(
                x, kernels[(a, b)].astype(x.dtype), (1, 1), list(pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                o = o + bias.astype(x.dtype)
            if act is not None:
                o = act(o)
            outs.append(o)
    return jnp.concatenate(outs, axis=-1)


def _s2d_pool_to_standard(x: jnp.ndarray) -> jnp.ndarray:
    """2×2 stride-2 maxpool of the underlying full-res map = max over the
    four s2d subpixels → STANDARD layout [B,H2,W2,C]."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    return x.reshape(b, h2, w2, 4, c).max(axis=3)


def _conv(x, w, bias, act, stride=1):
    p = w.shape[0] // 2
    o = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (stride, stride), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    o = o + jnp.asarray(bias, x.dtype)
    return act(o) if act is not None else o


def fold_xunet(variables: Dict, eps: float = 1e-3) -> Dict:
    """XUnet variables → flat {scope: (w, b)} deploy weights (f32)."""
    params, stats = variables["params"], variables["batch_stats"]
    out = {}

    def walk(p, s, prefix):
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v:
                out[f"{prefix}{k}"] = fold_convbn(v, s[k], eps=eps)
            elif isinstance(v, dict) and "kernel" in v:      # plain conv
                out[f"{prefix}{k}"] = (jnp.asarray(v["kernel"], jnp.float32),
                                       jnp.asarray(v["bias"], jnp.float32))
            elif isinstance(v, dict):
                walk(v, s.get(k, {}), f"{prefix}{k}/")

    walk(params, stats, "")
    return out


def xunet_forward_packed(variables: Dict, x_s2d: jnp.ndarray,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inference XUnet-256 with enc0 and dec3 (the 256² stages) in packed
    s2d layout. x_s2d: [B,128,128,12] host-s2d uint8/float tiles (RAW
    pixels; /255 is folded into enc0's first conv). Returns mask logits in
    s2d layout [B,128,128,4] — s2d_unpack for [B,256,256,1].

    Numerically identical to the standard forward on x/255 up to bf16
    rounding (pinned by tests/test_packed_unet.py)."""
    relu = jax.nn.relu
    f = fold_xunet(variables)
    x = x_s2d.astype(dtype)
    scale = jnp.asarray(1.0 / 255.0, jnp.float32)

    def packed_block(v, scope, cin_scale=None):
        w1, b1 = f[f"{scope}/cv1"]
        if cin_scale is not None:
            w1 = w1 * cin_scale
        k1 = {(a, b): s2d_conv3x3_kernel(w1, a, b)
              for a in (0, 1) for b in (0, 1)}
        v = s2d_conv3x3(v, k1, b1, relu)
        w2, b2 = f[f"{scope}/cv2"]
        k2 = {(a, b): s2d_conv3x3_kernel(w2, a, b)
              for a in (0, 1) for b in (0, 1)}
        return s2d_conv3x3(v, k2, b2, relu)

    def std_block(v, scope):
        w1, b1 = f[f"{scope}/cv1"]
        v = _conv(v, w1, b1, relu)
        w2, b2 = f[f"{scope}/cv2"]
        return _conv(v, w2, b2, relu)

    # enc0 packed (the /255 normalize rides the first conv's weights)
    enc0 = packed_block(x, "enc0", cin_scale=scale)          # [B,128,128,128]
    v = _s2d_pool_to_standard(enc0)                          # [B,128,128,32]
    skips = []
    for i, scope in enumerate(("enc1", "enc2", "enc3")):
        v = std_block(v, scope)
        skips.append(v)
        v = jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    v = std_block(v, "bottleneck")
    for i, scope in enumerate(("dec0", "dec1", "dec2")):
        b_, h_, w_, c_ = v.shape
        v = jnp.broadcast_to(v[:, :, None, :, None, :],
                             (b_, h_, 2, w_, 2, c_)).reshape(
                                 b_, h_ * 2, w_ * 2, c_)
        wu, bu = f[f"up{i}"]
        v = _conv(v, wu, bu, relu)
        v = jnp.concatenate([v, skips[-(i + 1)]], axis=-1)
        v = std_block(v, scope)                              # dec2 → [B,128,128,64]

    # dec3 packed: the 2× upsample is a channel TILE in s2d layout, so
    # up3's 1×1 conv runs ONCE per source pixel (4× fewer MACs than the
    # standard graph, which convolves four duplicated pixels)
    wu, bu = f["up3"]
    u3 = relu(_conv(v, wu, bu, None))                        # [B,128,128,32]
    e = enc0.reshape(*enc0.shape[:3], 4, 32)
    u = jnp.broadcast_to(u3[:, :, :, None, :], e.shape)
    v = jnp.concatenate([u, e], axis=-1).reshape(
        *enc0.shape[:3], 4 * 64)                             # (dy,dx,[u3|e])
    v = packed_block(v, "dec3")                              # [B,128,128,128]
    # mask_out 1×1 per subpixel group (f32 logits)
    wm, bm = f["mask_out"]
    v32 = v.astype(jnp.float32).reshape(*v.shape[:3], 4, 32)
    logits = jnp.einsum("bhwgc,co->bhwgo", v32,
                        wm.reshape(32, -1)) + bm
    return logits.reshape(*v.shape[:3], -1)                  # [B,128,128,4·out]
