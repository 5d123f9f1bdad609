"""YOLOv7 family (tiny + base) in flax — the ITCVD car-detector architecture.

TPU-native reimplementation of the network inside the reference's
``car_aerial_detection_yolo7_ITCVD_deepness.onnx`` (executed opaquely via
onnxruntime at reference _script/gpu_handler.py:39-65 /
simple_detector.py:39-46). Structure follows the upstream yolov7-tiny.yaml /
yolov7.yaml block graphs (ELAN aggregation, MP-Conv transitions, SPPCSPC,
RepConv deploy form), so converted weights can be loaded name-for-name.

Contract matched (SURVEY.md §3.3): input [B,640,640,3] RGB /255 (NHWC here,
vs the reference's NCHW), raw outputs at strides 8/16/32 with
3·(5+nc) channels; decode + NMS produce the [B,N,5+nc] boxes the reference
reads at simple_detector.py:479. Batched — the reference was locked to
batch=1 (simple_detector.py:648-649); this rebuild jits at arbitrary B.
"""

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from aerial_image_recognition_tpu.models.layers import (
    ConvBN, MaxPoolSame, concat, maxpool2, upsample2,
)

# Upstream anchor priors (pixels at 640 input).
ANCHORS_TINY = (
    ((10, 13), (16, 30), (33, 23)),      # P3/8
    ((30, 61), (62, 45), (59, 119)),     # P4/16
    ((116, 90), (156, 198), (373, 326)), # P5/32
)
ANCHORS_BASE = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)
STRIDES = (8, 16, 32)
# upstream yolov7 uses nn.BatchNorm2d default eps (1e-5), unlike ultralytics
# v8's 1e-3 — must match for imported-weight parity (test_arch_differential)
BN_EPS = 1e-5


class ELANTiny(nn.Module):
    """yolov7-tiny ELAN: two 1×1 stems, two chained 3×3, concat all four."""
    c_mid: int
    c_out: int
    act: str = "leaky"
    dtype: Any = jnp.bfloat16
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x may be a LIST of feature maps (a deferred concat from the
        # caller); ConvBN owns the lowering choice — see its docstring for
        # the measured concat-vs-split trade-off.
        kw = dict(act=self.act, dtype=self.dtype, bn_eps=self.bn_eps)
        cv1 = ConvBN(self.c_mid, 1, name="cv1", **kw)(x, train)
        cv2 = ConvBN(self.c_mid, 1, name="cv2", **kw)(x, train)
        cv3 = ConvBN(self.c_mid, 3, name="cv3", **kw)(cv2, train)
        cv4 = ConvBN(self.c_mid, 3, name="cv4", **kw)(cv3, train)
        # Concat order [-1,-2,-3,-4] of the yaml graph
        return ConvBN(self.c_out, 1, name="out", **kw)(
            [cv4, cv3, cv2, cv1], train)


class ELAN(nn.Module):
    """yolov7 (base) ELAN. Backbone taps [m4,m2,cv2,cv1]; head ('ELAN-H',
    half-width inner convs) taps all six."""
    c_mid: int
    c_out: int
    head: bool = False
    act: str = "silu"
    dtype: Any = jnp.bfloat16
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act=self.act, dtype=self.dtype, bn_eps=self.bn_eps)
        c_inner = self.c_mid // 2 if self.head else self.c_mid
        cv1 = ConvBN(self.c_mid, 1, name="cv1", **kw)(x, train)
        cv2 = ConvBN(self.c_mid, 1, name="cv2", **kw)(x, train)
        m = cv2
        ms = []
        for i in range(4):
            m = ConvBN(c_inner, 3, name=f"m{i + 1}", **kw)(m, train)
            ms.append(m)
        if self.head:
            taps = [ms[3], ms[2], ms[1], ms[0], cv2, cv1]
        else:
            taps = [ms[3], ms[1], cv2, cv1]
        return ConvBN(self.c_out, 1, name="out", **kw)(taps, train)


class MPConv(nn.Module):
    """yolov7 downsample transition: maxpool and strided-conv branches."""
    c: int
    act: str = "silu"
    dtype: Any = jnp.bfloat16
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act=self.act, dtype=self.dtype, bn_eps=self.bn_eps)
        a = ConvBN(self.c, 1, name="pool_cv", **kw)(maxpool2(x), train)
        b = ConvBN(self.c, 1, name="pre_cv", **kw)(x, train)
        b = ConvBN(self.c, 3, stride=2, name="down_cv", **kw)(b, train)
        # deferred concat (yaml order [-1, -3]): the consumer is always an
        # ELAN whose 1×1 stems accept the list (ConvBN chooses the lowering)
        return [b, a]


class SPPCSPC(nn.Module):
    """yolov7 base SPP-CSP block (pools 5/9/13 in parallel)."""
    c_out: int
    act: str = "silu"
    dtype: Any = jnp.bfloat16
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act=self.act, dtype=self.dtype, bn_eps=self.bn_eps)
        c = self.c_out
        cv1 = ConvBN(c, 1, name="cv1", **kw)(x, train)
        cv3 = ConvBN(c, 3, name="cv3", **kw)(cv1, train)
        cv4 = ConvBN(c, 1, name="cv4", **kw)(cv3, train)
        pools = [cv4] + [MaxPoolSame(k)(cv4) for k in (5, 9, 13)]
        y1 = ConvBN(c, 1, name="cv5", **kw)(pools, train)
        y1 = ConvBN(c, 3, name="cv6", **kw)(y1, train)
        y2 = ConvBN(c, 1, name="cv2", **kw)(x, train)
        return ConvBN(self.c_out, 1, name="cv7", **kw)([y1, y2], train)


class SPPCSPCTiny(nn.Module):
    """yolov7-tiny SPP-CSP-lite.

    Upstream (yolov7-tiny.yaml) applies SP 5/9/13 in PARALLEL to the same
    1x1 conv; three CHAINED 5x5 stride-1 pools are feature-identical
    (max5∘max5 = max9, max5∘max5∘max5 = max13 — the SPPF equivalence)
    and cheaper on TPU. Round 1 wrongly chained 5→9→13 (effective
    5/13/25), which would have silently broken upstream-weight parity;
    fixed in round 2 (self-review)."""
    c_out: int
    act: str = "leaky"
    dtype: Any = jnp.bfloat16
    bn_eps: float = BN_EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act=self.act, dtype=self.dtype, bn_eps=self.bn_eps)
        c = self.c_out
        cv1 = ConvBN(c, 1, name="cv1", **kw)(x, train)
        cv2 = ConvBN(c, 1, name="cv2", **kw)(x, train)
        p5 = MaxPoolSame(5)(cv2)
        p9 = MaxPoolSame(5)(p5)       # = max9 of cv2
        p13 = MaxPoolSame(5)(p9)      # = max13 of cv2
        y = ConvBN(c, 1, name="cv3", **kw)([p13, p9, p5, cv2], train)
        return ConvBN(self.c_out, 1, name="out", **kw)([y, cv1], train)


class YOLOv7(nn.Module):
    """Full detector. variant ∈ {'tiny','base'}; returns raw per-level maps
    [B, H/s, W/s, 3·(5+nc)] for s in (8,16,32) — decode in ops.decode.

    s2d_stem: replace the strided stem conv with space-to-depth + stride-1
    conv (same output shape/receptive behavior, better MXU lane occupancy
    for the 3-channel input — see layers.space_to_depth2). Measured on v5e:
    within noise of the plain stem (28.4 vs 27.9 ms / 128×640² batch — XLA
    already handles the strided 3-channel conv well), kept as an opt-in for
    experimentation. Changes the stem parameter shape, so upstream weight
    import would need the corresponding kernel transform.
    """
    num_classes: int = 1
    variant: str = "tiny"
    dtype: Any = jnp.bfloat16
    s2d_stem: bool = False
    # from_p2: the input is already the P2/4 stem feature map
    # [B, H/4, W/4, 64] — the two stem ConvBNs are skipped. Used by the
    # quad-stem inference lowering (ops.quadstem computes the stems as
    # MXU-shaped 2x2 convs over host-relayouted s2d^2 input); the unused
    # stem0/stem1 params in a loaded checkpoint are simply ignored.
    from_p2: bool = False

    @property
    def anchors(self):
        return ANCHORS_TINY if self.variant == "tiny" else ANCHORS_BASE

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.variant == "tiny":
            feats = self._tiny(x, train)
        elif self.variant == "base":
            feats = self._base(x, train)
        else:
            raise ValueError(f"unknown yolov7 variant {self.variant!r}")
        no = 3 * (5 + self.num_classes)
        outs = []
        for i, f in enumerate(feats):
            # Detect = fused IDetect: plain 1×1 conv with bias, f32 output
            # (box/objectness logits are precision-sensitive).
            o = nn.Conv(no, (1, 1), use_bias=True, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=f"detect{i}")(
                            f.astype(jnp.float32))
            outs.append(o)
        return outs

    def _tiny(self, x, train):
        kw = dict(act="leaky", dtype=self.dtype, bn_eps=BN_EPS)
        if self.from_p2:
            assert not train, "from_p2 is an inference-only lowering"
        elif self.s2d_stem:
            from aerial_image_recognition_tpu.models.layers import space_to_depth2
            x = space_to_depth2(x)                                       # P1/2
            x = ConvBN(32, 3, stride=1, name="stem0", **kw)(x, train)
            x = ConvBN(64, 3, stride=2, name="stem1", **kw)(x, train)   # P2/4
        else:
            x = ConvBN(32, 3, stride=2, name="stem0", **kw)(x, train)   # P1/2
            x = ConvBN(64, 3, stride=2, name="stem1", **kw)(x, train)   # P2/4
        x = ELANTiny(32, 64, name="elan1", dtype=self.dtype)(x, train)
        x = maxpool2(x)                                                  # P3/8
        p3 = ELANTiny(64, 128, name="elan2", dtype=self.dtype)(x, train)
        x = maxpool2(p3)                                                 # P4/16
        p4 = ELANTiny(128, 256, name="elan3", dtype=self.dtype)(x, train)
        x = maxpool2(p4)                                                 # P5/32
        p5 = ELANTiny(256, 512, name="elan4", dtype=self.dtype)(x, train)

        spp = SPPCSPCTiny(256, name="sppcspc", dtype=self.dtype)(p5, train)
        x = ConvBN(128, 1, name="up4_cv", **kw)(spp, train)
        x = upsample2(x)
        r4 = ConvBN(128, 1, name="route4", **kw)(p4, train)
        f4 = ELANTiny(64, 128, name="head_elan4",
                      dtype=self.dtype)([r4, x], train)
        x = ConvBN(64, 1, name="up3_cv", **kw)(f4, train)
        x = upsample2(x)
        r3 = ConvBN(64, 1, name="route3", **kw)(p3, train)
        f3 = ELANTiny(32, 64, name="head_elan3",
                      dtype=self.dtype)([r3, x], train)
        x = ConvBN(128, 3, stride=2, name="down4_cv", **kw)(f3, train)
        f4b = ELANTiny(64, 128, name="pan_elan4",
                       dtype=self.dtype)([x, f4], train)
        x = ConvBN(256, 3, stride=2, name="down5_cv", **kw)(f4b, train)
        f5b = ELANTiny(128, 256, name="pan_elan5",
                       dtype=self.dtype)([x, spp], train)
        o3 = ConvBN(128, 3, name="out3", **kw)(f3, train)
        o4 = ConvBN(256, 3, name="out4", **kw)(f4b, train)
        o5 = ConvBN(512, 3, name="out5", **kw)(f5b, train)
        return [o3, o4, o5]

    def _base(self, x, train):
        kw = dict(act="silu", dtype=self.dtype, bn_eps=BN_EPS)
        dt = self.dtype
        x = ConvBN(32, 3, name="stem0", **kw)(x, train)
        x = ConvBN(64, 3, stride=2, name="stem1", **kw)(x, train)       # P1/2
        x = ConvBN(64, 3, name="stem2", **kw)(x, train)
        x = ConvBN(128, 3, stride=2, name="stem3", **kw)(x, train)      # P2/4
        x = ELAN(64, 256, name="elan1", dtype=dt)(x, train)
        x = MPConv(128, name="mp3", dtype=dt)(x, train)                 # P3/8
        p3 = ELAN(128, 512, name="elan2", dtype=dt)(x, train)
        x = MPConv(256, name="mp4", dtype=dt)(p3, train)                # P4/16
        p4 = ELAN(256, 1024, name="elan3", dtype=dt)(x, train)
        x = MPConv(512, name="mp5", dtype=dt)(p4, train)                # P5/32
        p5 = ELAN(256, 1024, name="elan4", dtype=dt)(x, train)

        spp = SPPCSPC(512, name="sppcspc", dtype=dt)(p5, train)
        x = ConvBN(256, 1, name="up4_cv", **kw)(spp, train)
        x = upsample2(x)
        r4 = ConvBN(256, 1, name="route4", **kw)(p4, train)
        f4 = ELAN(256, 256, head=True, name="head_elan4",
                  dtype=dt)([r4, x], train)
        x = ConvBN(128, 1, name="up3_cv", **kw)(f4, train)
        x = upsample2(x)
        r3 = ConvBN(128, 1, name="route3", **kw)(p3, train)
        f3 = ELAN(128, 128, head=True, name="head_elan3",
                  dtype=dt)([r3, x], train)
        # PAN downsample transitions concat [conv-branch, pool-branch, skip]
        a = ConvBN(128, 1, name="pan4_pool_cv", **kw)(maxpool2(f3), train)
        b = ConvBN(128, 1, name="pan4_pre_cv", **kw)(f3, train)
        b = ConvBN(128, 3, stride=2, name="pan4_down_cv", **kw)(b, train)
        f4b = ELAN(256, 256, head=True, name="pan_elan4",
                   dtype=dt)([b, a, f4], train)
        a = ConvBN(256, 1, name="pan5_pool_cv", **kw)(maxpool2(f4b), train)
        b = ConvBN(256, 1, name="pan5_pre_cv", **kw)(f4b, train)
        b = ConvBN(256, 3, stride=2, name="pan5_down_cv", **kw)(b, train)
        f5b = ELAN(512, 512, head=True, name="pan_elan5",
                   dtype=dt)([b, a, spp], train)
        # RepConv deploy form = single fused 3×3 conv (+bias) + SiLU.
        o3 = ConvBN(256, 3, use_bn=False, name="rep3", **kw)(f3, train)
        o4 = ConvBN(512, 3, use_bn=False, name="rep4", **kw)(f4b, train)
        o5 = ConvBN(1024, 3, use_bn=False, name="rep5", **kw)(f5b, train)
        return [o3, o4, o5]
