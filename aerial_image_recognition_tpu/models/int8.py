"""Post-training int8 quantization of the model trunks (TPU MXU path).

Covers every registry model: yolov7-tiny, yolov7-base, yolov8 n–x
(detectors → Int8Bundle) and XUnet-256 (segmentation → Int8XUnetBundle).
Each trunk is a separate transcription executed by the shared prepare/run
interpreter pair below; the scheme description that follows is written
for the flagship yolov7-tiny but applies to all four (leaky/relu fold the
requant into the epilogue; silu keeps it as a fused multiply).

The reference deploys through ONNX Runtime with a TensorRT config in its
archived snapshot (reference simple_detector.py arch notes; SURVEY §2.1) —
fp16/int8 engine builds are TensorRT's job there. The TPU-native analogue
is explicit s8×s8→s32 convolution on the MXU, which the v5e runs at 2× the
bf16 rate and which also halves the HBM bytes between layers (the measured
bound on the ELAN stages — BASELINE.md round-2 MFU analysis).

Scheme (standard PTQ, arranged so the int8 graph needs NO runtime rescales):
  * weights: per-output-channel symmetric int8, BatchNorm folded first
    (same math as models/layers.fold_batchnorm);
  * activations: per-tensor symmetric int8, scales from a calibration pass
    (absmax of every ConvBN output, captured via flax intermediates);
  * each producer's output scale is folded into every consumer's kernel
    slice for that producer's channels — so concatenations of differently
    scaled int8 tensors are PLAIN int8 concats, and max-pools / nearest
    upsamples pass int8 through untouched (value-preserving ⇒ scale-
    preserving);
  * leaky-relu is positively homogeneous (leaky(a·x) = a·leaky(x), a>0),
    so the requantize division folds into the conv epilogue constants:
      y_i8 = clip(round(leaky(conv_s32 · (s_w/s_out) + b/s_out)))
    — one fused elementwise chain per conv, int8 in / int8 out.

The stems stay bf16 (they are the quad-stem lowering's domain — 3-channel
input quantization would waste the MXU win there) and the three detect
heads stay f32 (logit-sensitive, ~1% of FLOPs). The trunk graph below
mirrors models/yolov7.YOLOv7._tiny exactly (elan1 → out3/4/5); a prepare/
run interpreter pair shares the single transcription, and
tests/test_int8.py pins detection-set parity against the bf16 model on the
trained fixture.
"""

from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# calibration


def flatten_intermediates(inter, prefix=()):
    """{'elan1': {'cv1': {'__call__': (arr,)}}} → {'elan1/cv1': arr}."""
    out = {}
    for key, val in inter.items():
        if key == "__call__":
            for v in val:
                if hasattr(v, "shape"):
                    out["/".join(prefix)] = v
        elif isinstance(val, dict):
            out.update(flatten_intermediates(val, prefix + (key,)))
    return out


def calibrate_absmax(bundle, batches: Sequence[Any],
                     model_size: Optional[int] = None) -> Dict[str, float]:
    """Run the standard bf16 forward over calibration batches, recording the
    absmax of every module output (keyed 'elan1/cv1'). batches: uint8
    [B,S,S,3] arrays (preprocessed here) or float arrays already in [0,1].
    """
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch
    size = model_size or bundle.spec.input_size
    absmax: Dict[str, float] = {}
    for imgs in batches:
        x = jnp.asarray(imgs)
        if x.dtype == jnp.uint8:
            x = preprocess_batch(x, out_size=size, dtype=jnp.float32)
        elif x.shape[1] != size or x.shape[2] != size:
            # float batches must also be calibrated at the model's input
            # resolution — activation absmax is resolution-dependent
            x = jax.image.resize(
                x.astype(jnp.float32),
                (x.shape[0], size, size, x.shape[3]), method="bilinear")
        _, mut = bundle.module.apply(
            bundle.params, x, train=False,
            capture_intermediates=True, mutable=["intermediates"])
        for key, v in flatten_intermediates(mut["intermediates"]).items():
            m = float(jnp.max(jnp.abs(v.astype(jnp.float32))))
            absmax[key] = max(absmax.get(key, 0.0), m)
    return absmax


def _pcq(wf: np.ndarray):
    """Per-output-channel symmetric int8 weight quantization (shared by the
    trunk prepare pass and the stem lowering — one scheme, one place)."""
    o = wf.shape[-1]
    sw = np.maximum(np.abs(wf).reshape(-1, o).max(axis=0), 1e-12) / 127.0
    return np.clip(np.round(wf / sw), -127, 127).astype(np.int8), sw


# ---------------------------------------------------------------------------
# the shared trunk graph (single transcription, two interpreters)


@dataclass
class QT:
    """A quantized tensor flowing through the trunk graph.

    run mode: v is the int8 array (s/c are bookkeeping).
    prepare mode: v is None; s is the static coding scale, c the channels.
    """
    v: Any
    s: float
    c: int


def _elan(g, prefix: str, x):
    """ELANTiny (models/yolov7.py:43-63): concat order [cv4,cv3,cv2,cv1]."""
    cv1 = g.conv(f"{prefix}/cv1", x, 1)
    cv2 = g.conv(f"{prefix}/cv2", x, 1)
    cv3 = g.conv(f"{prefix}/cv3", cv2, 3)
    cv4 = g.conv(f"{prefix}/cv4", cv3, 3)
    return g.conv(f"{prefix}/out", [cv4, cv3, cv2, cv1], 1)


def _sppcspc_tiny(g, prefix: str, x):
    """SPPCSPCTiny (models/yolov7.py:133-157, SPPF-equivalent chain)."""
    cv1 = g.conv(f"{prefix}/cv1", x, 1)
    cv2 = g.conv(f"{prefix}/cv2", x, 1)
    p5 = g.pool_same(cv2, 5)
    p9 = g.pool_same(p5, 5)
    p13 = g.pool_same(p9, 5)
    y = g.conv(f"{prefix}/cv3", [p13, p9, p5, cv2], 1)
    return g.conv(f"{prefix}/out", [y, cv1], 1)


def _tiny_trunk(g, x):
    """Mirror of YOLOv7._tiny from the P2 feature to the three head taps
    (models/yolov7.py:218-246). Returns (o3, o4, o5) QTs."""
    x = _elan(g, "elan1", x)
    x = g.pool2(x)                                   # P3/8
    p3 = _elan(g, "elan2", x)
    x = g.pool2(p3)                                  # P4/16
    p4 = _elan(g, "elan3", x)
    x = g.pool2(p4)                                  # P5/32
    p5 = _elan(g, "elan4", x)

    spp = _sppcspc_tiny(g, "sppcspc", p5)
    x = g.conv("up4_cv", spp, 1)
    x = g.up2(x)
    r4 = g.conv("route4", p4, 1)
    f4 = _elan(g, "head_elan4", [r4, x])
    x = g.conv("up3_cv", f4, 1)
    x = g.up2(x)
    r3 = g.conv("route3", p3, 1)
    f3 = _elan(g, "head_elan3", [r3, x])
    x = g.conv("down4_cv", f3, 3, stride=2)
    f4b = _elan(g, "pan_elan4", [x, f4])
    x = g.conv("down5_cv", f4b, 3, stride=2)
    f5b = _elan(g, "pan_elan5", [x, spp])
    o3 = g.conv("out3", f3, 3)
    o4 = g.conv("out4", f4b, 3)
    o5 = g.conv("out5", f5b, 3)
    return o3, o4, o5


def _elan_base(g, prefix: str, x, head: bool = False):
    """yolov7-base ELAN (models/yolov7.py:66-91): 4 chained 3×3 off cv2;
    backbone taps [m4,m2,cv2,cv1], head ('ELAN-H') taps all six."""
    cv1 = g.conv(f"{prefix}/cv1", x, 1)
    cv2 = g.conv(f"{prefix}/cv2", x, 1)
    m = cv2
    ms = []
    for i in range(4):
        m = g.conv(f"{prefix}/m{i + 1}", m, 3)
        ms.append(m)
    taps = ([ms[3], ms[2], ms[1], ms[0], cv2, cv1] if head
            else [ms[3], ms[1], cv2, cv1])
    return g.conv(f"{prefix}/out", taps, 1)


def _mpconv(g, prefix: str, x):
    """yolov7-base MP downsample (models/yolov7.py:94-109): maxpool and
    strided-conv branches, deferred concat [conv, pool]."""
    a = g.conv(f"{prefix}/pool_cv", g.pool2(x), 1)
    b = g.conv(f"{prefix}/pre_cv", x, 1)
    b = g.conv(f"{prefix}/down_cv", b, 3, stride=2)
    return [b, a]


def _sppcspc_base(g, prefix: str, x):
    """yolov7-base SPPCSPC (models/yolov7.py:112-130): parallel 5/9/13."""
    cv1 = g.conv(f"{prefix}/cv1", x, 1)
    cv3 = g.conv(f"{prefix}/cv3", cv1, 3)
    cv4 = g.conv(f"{prefix}/cv4", cv3, 1)
    pools = [cv4, g.pool_same(cv4, 5), g.pool_same(cv4, 9),
             g.pool_same(cv4, 13)]
    y1 = g.conv(f"{prefix}/cv5", pools, 1)
    y1 = g.conv(f"{prefix}/cv6", y1, 3)
    y2 = g.conv(f"{prefix}/cv2", x, 1)
    return g.conv(f"{prefix}/cv7", [y1, y2], 1)


def _v7base_trunk(g, x):
    """Mirror of YOLOv7._base from the P2 feature (stem3 output) through
    the RepConv deploy convs (models/yolov7.py:248-289). Returns
    (o3, o4, o5) QTs — the f32 detect heads run outside."""
    x = _elan_base(g, "elan1", x)
    x = _mpconv(g, "mp3", x)                         # P3/8
    p3 = _elan_base(g, "elan2", x)
    x = _mpconv(g, "mp4", p3)                        # P4/16
    p4 = _elan_base(g, "elan3", x)
    x = _mpconv(g, "mp5", p4)                        # P5/32
    p5 = _elan_base(g, "elan4", x)

    spp = _sppcspc_base(g, "sppcspc", p5)
    x = g.conv("up4_cv", spp, 1)
    x = g.up2(x)
    r4 = g.conv("route4", p4, 1)
    f4 = _elan_base(g, "head_elan4", [r4, x], head=True)
    x = g.conv("up3_cv", f4, 1)
    x = g.up2(x)
    r3 = g.conv("route3", p3, 1)
    f3 = _elan_base(g, "head_elan3", [r3, x], head=True)
    a = g.conv("pan4_pool_cv", g.pool2(f3), 1)
    b = g.conv("pan4_pre_cv", f3, 1)
    b = g.conv("pan4_down_cv", b, 3, stride=2)
    f4b = _elan_base(g, "pan_elan4", [b, a, f4], head=True)
    a = g.conv("pan5_pool_cv", g.pool2(f4b), 1)
    b = g.conv("pan5_pre_cv", f4b, 1)
    b = g.conv("pan5_down_cv", b, 3, stride=2)
    f5b = _elan_base(g, "pan_elan5", [b, a, spp], head=True)
    o3 = g.conv("rep3", f3, 3)       # RepConv deploy: conv+bias, no BN
    o4 = g.conv("rep4", f4b, 3)
    o5 = g.conv("rep5", f5b, 3)
    return o3, o4, o5


class _Prepare:
    """Walks the trunk graph building qparams from the f32 variables +
    calibration scales. Raises on any channel-count mismatch between the
    transcription and the checkpoint (the arch-differential safety net,
    applied to this second transcription)."""

    def __init__(self, variables, absmax: Dict[str, float],
                 bn_eps: float = 1e-5, act: str = "leaky"):
        self.p = variables["params"]
        self.stats = variables["batch_stats"]
        self.absmax = absmax
        self.bn_eps = bn_eps
        self.act = act
        self.qparams: Dict[str, Any] = {}
        # static per-tensor coding scales, keyed like qparams — _Run needs
        # them as python constants (residual adds, head dequant)
        self.scales: Dict[str, float] = {}

    def _node(self, tree, name):
        for part in name.split("/"):
            tree = tree[part]
        return tree

    def _s_out(self, name):
        if name not in self.absmax:
            raise KeyError(f"no calibration record for {name}")
        return max(self.absmax[name], 1e-12) / 127.0

    def conv(self, name, x, kernel, stride=1):
        parts = x if isinstance(x, list) else [x]
        node = self._node(self.p, name)
        k = np.asarray(node["conv"]["kernel"], np.float32)   # HWIO
        if "bn" in node:
            stats = self._node(self.stats, name)["bn"]
            gamma = np.asarray(node["bn"]["scale"], np.float32)
            beta = np.asarray(node["bn"]["bias"], np.float32)
            mean = np.asarray(stats["mean"], np.float32)
            var = np.asarray(stats["var"], np.float32)
            g = gamma / np.sqrt(var + self.bn_eps)
            wf = k * g                                        # O is last
            bf = beta - mean * g
        else:
            # BN-less ConvBN (e.g. yolov7-base RepConv deploy form):
            # plain conv + bias, same epilogue otherwise. copy(): the
            # scale fold below mutates wf in place and np.asarray of a
            # jax array is read-only
            wf = k.copy()
            bf = np.asarray(node["conv"].get(
                "bias", np.zeros(k.shape[-1])), np.float32)
        if k.shape[0] != kernel or sum(p.c for p in parts) != k.shape[2]:
            raise ValueError(
                f"{name}: transcription/checkpoint mismatch — kernel "
                f"{k.shape} vs k={kernel}, in_c={sum(p.c for p in parts)}")
        # fold each producer's coding scale into its kernel slice: the int8
        # concat then needs no runtime rescale
        off = 0
        for p in parts:
            wf[:, :, off:off + p.c, :] *= p.s
            off += p.c
        o = k.shape[3]
        w8, sw = _pcq(wf)
        s_out = self._s_out(name)
        if self.act in ("leaky", "relu"):
            # leaky/relu(a·t) = a·leaky/relu(t), a>0 ⇒ fold 1/s_out into m, b
            qp = {"w8": jnp.asarray(w8),
                  "m": jnp.asarray((sw / s_out).astype(np.float32)),
                  "b": jnp.asarray((bf / s_out).astype(np.float32))}
        else:
            # silu is not homogeneous: requant divide stays a separate
            # (still fused) multiply after the activation
            qp = {"w8": jnp.asarray(w8),
                  "m": jnp.asarray(sw.astype(np.float32)),
                  "b": jnp.asarray(bf.astype(np.float32)),
                  "inv": jnp.float32(1.0 / s_out)}
        self.qparams[name] = qp
        self.scales[name] = s_out
        return QT(None, s_out, o)

    def add(self, key, y, x):
        """Residual add (v8 Bottleneck): output coded at the calibrated
        scale of the enclosing module's output."""
        assert y.c == x.c, (key, y.c, x.c)
        s = self._s_out(key)
        self.scales[key] = s
        return QT(None, s, y.c)

    def split2(self, x):
        assert x.c % 2 == 0
        return QT(None, x.s, x.c // 2), QT(None, x.s, x.c // 2)

    def pool2(self, x):
        return x          # value-preserving ⇒ scale/channels unchanged

    def pool_same(self, x, k):
        return x

    def up2(self, x):
        return x


class _Run:
    """Executes the trunk graph on int8 arrays with prepared qparams.

    QT.s stays populated (scales are static per quantized bundle — they
    bake into the jitted graph as constants, e.g. in the residual add)."""

    def __init__(self, qparams, act: str = "leaky",
                 scales: Optional[Dict[str, float]] = None):
        self.q = qparams
        self.act = act
        self.scales = scales or {}

    def conv(self, name, x, kernel, stride=1):
        parts = x if isinstance(x, list) else [x]
        v = (parts[0].v if len(parts) == 1
             else jnp.concatenate([p.v for p in parts], axis=-1))
        qp = self.q[name]
        pad = kernel // 2
        r = lax.conv_general_dilated(
            v, qp["w8"], (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
        t = r.astype(jnp.float32) * qp["m"] + qp["b"]
        if self.act == "leaky":
            y = jax.nn.leaky_relu(t, 0.1)       # 1/s_out folded into m, b
        elif self.act == "relu":
            y = jax.nn.relu(t)                  # homogeneous like leaky
        else:
            y = jax.nn.silu(t) * qp["inv"]
        out = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        return QT(out, self.scales.get(name, 0.0), out.shape[-1])

    def add(self, key, y, x):
        s_m = self.scales[key]
        t = (y.v.astype(jnp.float32) * y.s + x.v.astype(jnp.float32) * x.s)
        out = jnp.clip(jnp.round(t / s_m), -127, 127).astype(jnp.int8)
        return QT(out, s_m, y.c)

    def split2(self, x):
        a, b = jnp.split(x.v, 2, axis=-1)
        return QT(a, x.s, a.shape[-1]), QT(b, x.s, b.shape[-1])

    def pool2(self, x):
        from flax import linen as nn
        return replace(x, v=nn.max_pool(x.v, (2, 2), strides=(2, 2),
                                        padding="VALID"))

    def pool_same(self, x, k):
        from flax import linen as nn
        return replace(x, v=nn.max_pool(x.v, (k, k), strides=(1, 1),
                                        padding="SAME"))

    def up2(self, x):
        from aerial_image_recognition_tpu.models.layers import upsample2
        return replace(x, v=upsample2(x.v))


# ---------------------------------------------------------------------------
# the yolov8 trunk graph (mirror of models/yolov8.YOLOv8.__call__, silu)


def _c2f(g, prefix: str, x, n: int, shortcut: bool):
    """C2f (models/yolov8.py:61-78): split cv1 in two, n chained e=1.0
    bottlenecks tapping the running tail, concat all, cv2."""
    y = g.conv(f"{prefix}/cv1", x, 1)
    y1, y2 = g.split2(y)
    ys = [y1, y2]
    for i in range(n):
        m = g.conv(f"{prefix}/m{i}/cv1", ys[-1], 3)
        m = g.conv(f"{prefix}/m{i}/cv2", m, 3)
        if shortcut:                      # e=1.0 ⇒ channels always match
            m = g.add(f"{prefix}/m{i}", m, ys[-1])
        ys.append(m)
    return g.conv(f"{prefix}/cv2", ys, 1)


def _sppf(g, prefix: str, x):
    y = g.conv(f"{prefix}/cv1", x, 1)
    p1 = g.pool_same(y, 5)
    p2 = g.pool_same(p1, 5)
    p3 = g.pool_same(p2, 5)
    return g.conv(f"{prefix}/cv2", [y, p1, p2, p3], 1)


def _v8_trunk(g, x, depth: float):
    """Mirror of YOLOv8.__call__ from the P2 feature to the three head
    taps' ConvBN towers (models/yolov8.py:145-168). Returns per-level
    (box_feat, cls_feat) QTs ready for the f32 output convs."""
    from aerial_image_recognition_tpu.models.yolov8 import _n
    x = _c2f(g, "c2f1", x, _n(3, depth), True)
    x = g.conv("down3", x, 3, stride=2)                       # P3/8
    p3 = _c2f(g, "c2f2", x, _n(6, depth), True)
    x = g.conv("down4", p3, 3, stride=2)                      # P4/16
    p4 = _c2f(g, "c2f3", x, _n(6, depth), True)
    x = g.conv("down5", p4, 3, stride=2)                      # P5/32
    x = _c2f(g, "c2f4", x, _n(3, depth), True)
    p5 = _sppf(g, "sppf", x)

    f4 = _c2f(g, "fpn4", [g.up2(p5), p4], _n(3, depth), False)
    f3 = _c2f(g, "fpn3", [g.up2(f4), p3], _n(3, depth), False)
    x = g.conv("pan_down4", f3, 3, stride=2)
    f4b = _c2f(g, "pan4", [x, f4], _n(3, depth), False)
    x = g.conv("pan_down5", f4b, 3, stride=2)
    f5b = _c2f(g, "pan5", [x, p5], _n(3, depth), False)

    outs = []
    for i, f in enumerate((f3, f4b, f5b)):
        b = g.conv(f"detect/box{i}_cv1", f, 3)
        b = g.conv(f"detect/box{i}_cv2", b, 3)
        c = g.conv(f"detect/cls{i}_cv1", f, 3)
        c = g.conv(f"detect/cls{i}_cv2", c, 3)
        outs.append((b, c))
    return outs


def _v8_raw_from_i8(params, p2_i8, depth: float, scales: Dict[str, float]):
    """int8 v8 trunk + f32 head output convs → raw per-level maps.

    scales: the prepare pass's static per-tensor coding scales — passed
    OUTSIDE the params pytree so they stay python constants under jit
    (the residual adds and head dequants bake them into the graph)."""
    q = params["q"]
    g = _Run(q["convs"], act="silu", scales=scales)
    pairs = _v8_trunk(g, QT(p2_i8, scales["__p2__"], p2_i8.shape[-1]),
                      depth)
    det = params["orig"]["params"]["detect"]
    outs = []
    for i, (b, c) in enumerate(pairs):
        bo = lax.conv_general_dilated(
            b.v.astype(jnp.float32) * b.s,
            jnp.asarray(det[f"box{i}_out"]["kernel"], jnp.float32), (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=_DN) \
            + det[f"box{i}_out"]["bias"]
        co = lax.conv_general_dilated(
            c.v.astype(jnp.float32) * c.s,
            jnp.asarray(det[f"cls{i}_out"]["kernel"], jnp.float32), (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=_DN) \
            + det[f"cls{i}_out"]["bias"]
        outs.append(jnp.concatenate([bo, co], axis=-1))
    return outs


# ---------------------------------------------------------------------------
# the XUnet-256 segmentation trunk (relu; third transcription, same scheme)


def _xunet_trunk(g, x):
    """Mirror of models/xunet.XUnet.__call__ from the enc0/cv1 feature to
    the dec3 output. relu is positively homogeneous, so every conv uses the
    zero-rescale epilogue; max-pools and nearest upsamples pass int8
    through untouched; the skip concats ride the producer-scale-folding
    scheme like every other concat. mask_out stays f32 in the bundle."""
    skips = []
    x = g.conv("enc0/cv2", x, 3)
    skips.append(x)
    x = g.pool2(x)
    for i in (1, 2, 3):
        x = g.conv(f"enc{i}/cv1", x, 3)
        x = g.conv(f"enc{i}/cv2", x, 3)
        skips.append(x)
        x = g.pool2(x)
    x = g.conv("bottleneck/cv1", x, 3)
    x = g.conv("bottleneck/cv2", x, 3)
    for i in range(4):
        x = g.up2(x)
        x = g.conv(f"up{i}", x, 1)
        x = g.conv(f"dec{i}/cv1", [x, skips[3 - i]], 3)
        x = g.conv(f"dec{i}/cv2", x, 3)
    return x


def _xunet_entry(variables, x, dtype=jnp.bfloat16, bn_eps=1e-3):
    """enc0/cv1 — the 3-channel float-image entry conv, mirrored from ConvBN
    (stride 1, pad k//2 == SAME, inference BN, relu) in the model dtype.
    Quantizing a 3-input-channel conv wastes the MXU win (same reasoning as
    the detector stems), so it stays bf16 and the int8 domain starts at its
    output."""
    p = variables["params"]["enc0"]["cv1"]
    st = variables["batch_stats"]["enc0"]["cv1"]["bn"]
    k = jnp.asarray(p["conv"]["kernel"], dtype)
    t = lax.conv_general_dilated(x.astype(dtype), k, (1, 1),
                                 ((1, 1), (1, 1)), dimension_numbers=_DN)
    g = (p["bn"]["scale"] * lax.rsqrt(st["var"] + bn_eps)).astype(dtype)
    t = (t - st["mean"].astype(dtype)) * g + p["bn"]["bias"].astype(dtype)
    return jax.nn.relu(t)


# ---------------------------------------------------------------------------
# stems (bf16) + head (f32) around the int8 trunk


def _stems_bf16(variables, x, dtype=jnp.bfloat16, bn_eps=1e-5,
                stem_names=("stem0", "stem1"), act="leaky",
                strides=None):
    """The stem ConvBNs, eagerly mirrored from ConvBN
    (models/layers.py:125-153: conv pad k//2 → inference BN → act).
    strides defaults to all-stride-2 (tiny/v8); yolov7-base passes
    (1, 2, 1, 2) for its four-conv stem."""
    p, s = variables["params"], variables["batch_stats"]
    strides = strides or (2,) * len(stem_names)
    x = x.astype(dtype)
    for nm, st in zip(stem_names, strides):
        k = jnp.asarray(p[nm]["conv"]["kernel"], dtype)
        x = lax.conv_general_dilated(x, k, (st, st), ((1, 1), (1, 1)),
                                     dimension_numbers=_DN)
        g = (p[nm]["bn"]["scale"]
             * lax.rsqrt(s[nm]["bn"]["var"] + bn_eps)).astype(dtype)
        x = (x - s[nm]["bn"]["mean"].astype(dtype)) * g \
            + p[nm]["bn"]["bias"].astype(dtype)
        x = jax.nn.leaky_relu(x, 0.1) if act == "leaky" else jax.nn.silu(x)
    return x


def _detect_heads(variables, feats_f32: List[jnp.ndarray]):
    """The three 1×1 f32 detect convs (models/yolov7.py:196-204)."""
    outs = []
    for i, f in enumerate(feats_f32):
        p = variables["params"][f"detect{i}"]
        o = lax.conv_general_dilated(
            f, jnp.asarray(p["kernel"], jnp.float32), (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=_DN) + p["bias"]
        outs.append(o)
    return outs


def _v7_raw_from_i8(params, p2_i8, trunk_fn=_tiny_trunk, act="leaky"):
    """int8 yolov7 trunk (tiny: leaky; base: silu incl. the BN-less
    RepConv deploy convs) + f32 detect heads — one dequant/head hookup
    for both variants."""
    q = params["q"]
    g = _Run(q["convs"], act=act)
    o3, o4, o5 = trunk_fn(g, QT(p2_i8, 0.0, p2_i8.shape[-1]))
    feats = [o.v.astype(jnp.float32) * sc
             for o, sc in zip((o3, o4, o5), q["out_scales"])]
    return _detect_heads(params["orig"], feats)


def _quantize_stems(variables, absmax, bn_eps=1e-5,
                    stem_names=("stem0", "stem1"), act="leaky"):
    """int8 lowering of the quad stems (ops/quadstem.py geometry).

    The uint8 s2d² input shifts to int8 EXACTLY (x−128 ≡ x XOR 128,
    bit-reinterpreted), so stem0's only quantization loss is its weights.
    The shift makes lax.conv's zero padding represent pixel 128 instead of
    the black pixels the f32 path pads with; the fix is a per-channel
    border-correction built from partial kernel sums — with lo-side-only
    ((1,0),(1,0)) cell padding there are exactly four cases
    (interior / top row / left col / corner):
        corr(y,x) = S − 1[y=0]·Sᵤ₀ − 1[x=0]·Sᵥ₀ + 1[y=0,x=0]·Sᵤ₀ᵥ₀
    entering inside the leaky epilogue (already scaled by 128/(255·s₀)).
    Stem1 pads int8 zeros ↔ activation 0.0 — exact under symmetric
    quantization, like every trunk conv.
    """
    from aerial_image_recognition_tpu.ops.quadstem import (
        fold_convbn, quad_kernel_transform, s2d_kernel_transform)
    p, st = variables["params"], variables["batch_stats"]
    n0, n1 = stem_names
    w0, b0 = fold_convbn(p[n0], st[n0], eps=bn_eps)
    w1, b1 = fold_convbn(p[n1], st[n1], eps=bn_eps)
    w0q = np.asarray(quad_kernel_transform(w0), np.float32)  # [2,2,48,4c0]
    w1q = np.asarray(s2d_kernel_transform(w1), np.float32)   # [2,2,4c0,c1]
    b0q = np.tile(np.asarray(b0, np.float32), 4)
    s0 = max(absmax[n0], 1e-12) / 127.0          # quad h ≡ relayout of it
    p2s = max(absmax[n1], 1e-12) / 127.0
    w08, sw0 = _pcq(w0q)
    w18, sw1 = _pcq(w1q)
    # partial sums of the FLOAT kernel over (u,v) tap subsets, channels in
    k_sum = w0q.sum(axis=2)                       # [2,2,O]
    S = k_sum.sum(axis=(0, 1))
    Su0 = k_sum[0].sum(axis=0)
    Sv0 = k_sum[:, 0].sum(axis=0)
    Suv = k_sum[0, 0]
    if act == "leaky":
        # homogeneity folds the requant divides into every constant
        return {
            "w0": jnp.asarray(w08),
            "m0": jnp.asarray(sw0 / (255.0 * s0)),
            "b0": jnp.asarray(b0q / s0),
            "corr": jnp.asarray(np.stack([S, Su0, Sv0, Suv])
                                * (128.0 / (255.0 * s0))),
            "w1": jnp.asarray(w18),
            "m1": jnp.asarray(sw1 * s0 / p2s),
            "b1": jnp.asarray(np.asarray(b1, np.float32) / p2s),
        }
    # silu: epilogue constants stay in activation units; requant divides
    # are separate (still fused) multiplies
    return {
        "w0": jnp.asarray(w08),
        "m0": jnp.asarray(sw0 / 255.0),
        "b0": jnp.asarray(b0q),
        "corr": jnp.asarray(np.stack([S, Su0, Sv0, Suv]) * (128.0 / 255.0)),
        "inv0": jnp.float32(1.0 / s0),
        "w1": jnp.asarray(w18),
        "m1": jnp.asarray(sw1 * s0),
        "b1": jnp.asarray(np.asarray(b1, np.float32)),
        "inv1": jnp.float32(1.0 / p2s),
    }


def _stems_int8(q, xq, act="leaky"):
    """u8 s2d² batch [B,H/4,W/4,48] → P2 feature as int8 (trunk coding)."""
    sq = q["stems"]
    x8 = lax.bitcast_convert_type(xq ^ jnp.uint8(128), jnp.int8)

    def conv2(v, w):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 0), (1, 0)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32)

    def act_req(t, inv_key):
        if act == "leaky":
            y = jax.nn.leaky_relu(t, 0.1)       # requant folded in consts
        else:
            y = jax.nn.silu(t) * sq[inv_key]
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    _, h, w, _ = xq.shape
    y0 = (jnp.arange(h) == 0).astype(jnp.float32)[:, None, None]
    x0 = (jnp.arange(w) == 0).astype(jnp.float32)[None, :, None]
    S, Su0, Sv0, Suv = (sq["corr"][i] for i in range(4))
    corr = S - y0 * Su0 - x0 * Sv0 + (y0 * x0) * Suv
    h1 = act_req(conv2(x8, sq["w0"]).astype(jnp.float32) * sq["m0"]
                 + corr + sq["b0"], "inv0")
    return act_req(conv2(h1, sq["w1"]).astype(jnp.float32) * sq["m1"]
                   + sq["b1"], "inv1")


# ---------------------------------------------------------------------------
# public surface


@dataclass
class Int8Bundle:
    """Drop-in for models.registry.ModelBundle (same forward contracts) with
    the detector trunk quantized (yolov7-tiny or yolov8 n–x).
    params = {"orig": variables, "q": {... int8 kernels + epilogue
    arrays ...}} — one pytree so jit / shard_map / device_put treat it like
    any other param tree. static_scales stays OUTSIDE the pytree (python
    floats baked into the traced graph)."""
    spec: Any
    module: Any
    params: Any
    static_scales: Any = None

    def supports_s2d2(self) -> bool:
        # tiny/v8 standard stems by construction; yolov7-base's four-conv
        # stem (strides 1,2,1,2) has no quad-stem lowering
        return getattr(self.module, "variant", "") != "base"

    def _p2_quantize(self, p2):
        q = self.params["q"]   # p2_scale is an array — fine, multiply only
        return jnp.clip(jnp.round(p2.astype(jnp.float32) / q["p2_scale"]),
                        -127, 127).astype(jnp.int8)

    def _raw_from_p2_i8(self, params, p2_i8):
        if self.spec.family == "yolov8":
            from aerial_image_recognition_tpu.models.yolov8 import SCALES
            depth = SCALES[self.module.scale][0]
            return _v8_raw_from_i8(params, p2_i8, depth, self.static_scales)
        if getattr(self.module, "variant", "") == "base":
            return _v7_raw_from_i8(params, p2_i8, trunk_fn=_v7base_trunk,
                                   act="silu")
        return _v7_raw_from_i8(params, p2_i8)

    def _decode(self, outs):
        from aerial_image_recognition_tpu.ops.decode import (
            decode_yolov7, decode_yolov8)
        if self.spec.family == "yolov8":
            return decode_yolov8(outs, self.spec.num_classes)
        return decode_yolov7(outs, self.module.anchors,
                             self.spec.num_classes)

    def forward(self, params, images):
        meta = _family_meta(self.spec, self.module)
        p2 = _stems_bf16(params["orig"], images, dtype=self.module.dtype,
                         bn_eps=meta["bn_eps"], stem_names=meta["stems"],
                         act=meta["act"], strides=meta["strides"])
        return self._decode(self._raw_from_p2_i8(
            params, self._p2_quantize(p2)))

    def forward_s2d2(self, params, xq, in_scale=1.0 / 255.0):
        if not self.supports_s2d2():
            raise NotImplementedError(
                "no quad-stem lowering for this stem geometry")
        meta = _family_meta(self.spec, self.module)
        if (xq.dtype == jnp.uint8 and "stems" in params["q"]
                and in_scale in (None, 1.0 / 255.0)):
            # fully-int8 entry: the u8→i8 shift is exact, so the stems'
            # only quantization loss is their weights (_quantize_stems)
            p2_i8 = _stems_int8(params["q"], xq, act=meta["act"])
        else:
            from aerial_image_recognition_tpu.ops.quadstem import (
                quad_stem_forward)
            p2 = quad_stem_forward(
                params["orig"], xq, act=meta["act"], in_scale=in_scale,
                dtype=self.module.dtype, stem_names=meta["stems"],
                bn_eps=meta["bn_eps"])
            p2_i8 = self._p2_quantize(p2)
        return self._decode(self._raw_from_p2_i8(params, p2_i8))


@dataclass
class Int8XUnetBundle:
    """Drop-in for the xunet ModelBundle (same forward contract: float
    images in, f32 mask logits out — make_segment_fn /
    pipeline.rasters.segment_geotiff consume it unchanged). enc0/cv1 stays
    bf16 (3-channel entry), the dec3 coding scale is folded into the f32
    mask_out kernel, everything between runs int8."""
    spec: Any
    module: Any
    params: Any
    static_scales: Any = None

    def forward(self, params, images):
        q = params["q"]
        t = _xunet_entry(params["orig"], images, dtype=self.module.dtype)
        s_in = self.static_scales["__entry__"]
        xi = jnp.clip(jnp.round(t.astype(jnp.float32) / s_in),
                      -127, 127).astype(jnp.int8)
        g = _Run(q["convs"], act="relu", scales=self.static_scales)
        out = _xunet_trunk(g, QT(xi, s_in, xi.shape[-1]))
        # f32 mask head; dec3's coding scale is pre-folded into the kernel
        return lax.conv_general_dilated(
            out.v.astype(jnp.float32), q["mask_kernel"], (1, 1),
            ((0, 0), (0, 0)), dimension_numbers=_DN) + q["mask_bias"]


def quantize_xunet(bundle, calib_batches: Sequence[Any],
                   model_size: Optional[int] = None,
                   absmax: Optional[Dict[str, float]] = None
                   ) -> Int8XUnetBundle:
    """Calibrate + quantize an XUnet segmentation ModelBundle."""
    if bundle.spec.family != "xunet":
        raise NotImplementedError("quantize_xunet: xunet bundles only")
    if absmax is None:
        absmax = calibrate_absmax(bundle, calib_batches, model_size)
    prep = _Prepare(bundle.params, absmax, bn_eps=1e-3, act="relu")
    base = np.asarray(
        bundle.params["params"]["enc0"]["cv1"]["conv"]["kernel"]).shape[-1]
    s_entry = max(absmax["enc0/cv1"], 1e-12) / 127.0
    out = _xunet_trunk(prep, QT(None, s_entry, base))
    p = bundle.params["params"]["mask_out"]
    q = {
        "convs": prep.qparams,
        # dequant fold: conv(x_i8·s, K) == conv(x_i8, K·s) for the 1×1 head
        "mask_kernel": jnp.asarray(
            np.asarray(p["kernel"], np.float32) * out.s),
        "mask_bias": jnp.asarray(p["bias"], jnp.float32),
    }
    scales = dict(prep.scales)
    scales["__entry__"] = s_entry
    return Int8XUnetBundle(spec=bundle.spec, module=bundle.module,
                           params={"orig": _prune_orig(bundle.params,
                                                       {"enc0"}),
                                   "q": q},
                           static_scales=scales)


def _prune_orig(variables, keep):
    """Drop the f32/bf16 trunk weights from the 'orig' tree the quantized
    bundle carries — the int8 graph reads only the stems, the detect
    heads (tiny/base: detect0-2; v8: the 'detect' subtree), and (xunet)
    enc0. Without this, build_detect_step(mesh=...) replicated the entire
    unused trunk to every chip (~90-260 MB for v8 l/x) alongside the int8
    kernels."""
    return {
        "params": {k: v for k, v in variables["params"].items()
                   if k in keep},
        "batch_stats": {k: v for k, v in
                        variables.get("batch_stats", {}).items()
                        if k in keep},
    }


def _family_meta(spec, module):
    """Stem scopes / strides / activation / BN eps per family (mirrors
    models.registry.ModelBundle._s2d2_meta, plus the yolov7-base stem
    geometry, which has no quad-stem lowering)."""
    if spec.family == "yolov8":
        return {"stems": ("stem", "down2"), "act": "silu", "bn_eps": 1e-3,
                "strides": (2, 2)}
    if getattr(module, "variant", "") == "base":
        return {"stems": ("stem0", "stem1", "stem2", "stem3"),
                "act": "silu", "bn_eps": 1e-5, "strides": (1, 2, 1, 2)}
    return {"stems": ("stem0", "stem1"), "act": "leaky", "bn_eps": 1e-5,
            "strides": (2, 2)}


def save_absmax(path: str, absmax: Dict[str, float]) -> None:
    """Persist a calibration (plain JSON — the TensorRT-calibration-cache
    analogue): calibrate once on representative imagery, reuse for every
    later run via cfg.extra['quantize_calib']."""
    import json
    with open(path, "w") as f:
        json.dump(absmax, f, indent=1, sort_keys=True)


def load_absmax(path: str) -> Dict[str, float]:
    import json
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def quantize_bundle(bundle, calib_batches: Sequence[Any],
                    model_size: Optional[int] = None,
                    absmax: Optional[Dict[str, float]] = None) -> Int8Bundle:
    """Calibrate + quantize a ModelBundle: detector families (yolov7-tiny
    with standard stems, any yolov8 scale) → Int8Bundle; xunet →
    Int8XUnetBundle (family-dispatched to quantize_xunet).

    calib_batches: a few representative uint8 [B,S,S,3] batches (or floats
    in [0,1]). Pass absmax= to reuse a saved calibration instead.
    """
    if bundle.spec.family == "xunet":
        return quantize_xunet(bundle, calib_batches, model_size,
                              absmax=absmax)
    variant = getattr(bundle.module, "variant", "")
    is_v7 = (bundle.spec.family == "yolov7" and variant == "tiny"
             and not getattr(bundle.module, "s2d_stem", False))
    is_v7base = bundle.spec.family == "yolov7" and variant == "base"
    is_v8 = bundle.spec.family == "yolov8"
    if not (is_v7 or is_v7base or is_v8):
        raise NotImplementedError(
            "int8 PTQ covers yolov7 tiny/base with the standard stems, "
            "yolov8 n–x, and xunet; the s2d_stem experiment keeps bf16")
    if absmax is None:
        absmax = calibrate_absmax(bundle, calib_batches, model_size)
    meta = _family_meta(bundle.spec, bundle.module)
    prep = _Prepare(bundle.params, absmax, bn_eps=meta["bn_eps"],
                    act=meta["act"])
    p2_key = meta["stems"][-1]        # the last stem conv emits P2
    p2_c = np.asarray(
        bundle.params["params"][p2_key]["conv"]["kernel"]).shape[-1]
    p2 = QT(None, max(absmax[p2_key], 1e-12) / 127.0, p2_c)
    if is_v8:
        from aerial_image_recognition_tpu.models.yolov8 import SCALES
        _v8_trunk(prep, p2, SCALES[bundle.module.scale][0])
        q = {"p2_scale": jnp.float32(p2.s), "convs": prep.qparams}
    else:
        trunk_fn = _v7base_trunk if is_v7base else _tiny_trunk
        o3, o4, o5 = trunk_fn(prep, p2)
        q = {
            "p2_scale": jnp.float32(p2.s),
            "convs": prep.qparams,
            "out_scales": [jnp.float32(o.s) for o in (o3, o4, o5)],
        }
    if not is_v7base:   # base's four-conv stem has no quad-stem lowering
        q["stems"] = _quantize_stems(
            bundle.params, absmax, bn_eps=meta["bn_eps"],
            stem_names=meta["stems"], act=meta["act"])
    keep = set(meta["stems"]) | {"detect", "detect0", "detect1", "detect2"}
    params = {"orig": _prune_orig(bundle.params, keep), "q": q}
    scales = dict(prep.scales)
    scales["__p2__"] = p2.s
    return Int8Bundle(spec=bundle.spec, module=bundle.module, params=params,
                      static_scales=scales)
