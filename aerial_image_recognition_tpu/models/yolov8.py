"""YOLOv8 family (n/s/m/l/x) in flax — the Tokyo 2-class (Car/Truck) detector.

TPU-native reimplementation of the network inside the reference's
``yolov8_tokyo_checkpoint.onnx`` — produced by ultralytics YOLOv8l training in
x_arch/01_train_tokyo.ipynb cell 14 (300 epochs, imgsz 768, nc=2 per the
class remap {Car,Van,Car-Trailer}→Car, {Pickup,Truck,Trailer,Bus}→Truck in
cell 2) and consumed via onnxruntime in x_arch/02_analyze_images cell 6.

Anchor-free decoupled head with Distribution Focal Loss (DFL) box regression:
each level emits 4·reg_max box-distribution logits + nc class logits; decode
(ops.decode.decode_yolov8) takes the per-bin softmax expectation → ltrb
distances from the anchor point → xywh. Output contract after decode+NMS
matches the [B,N,4+nc] boxes the reference notebook reads.
"""

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aerial_image_recognition_tpu.models.layers import ConvBN, concat, upsample2

# depth_multiple, width_multiple, ratio (ultralytics yolov8.yaml scales)
SCALES = {
    "n": (1 / 3, 0.25, 2.0),
    "s": (1 / 3, 0.50, 2.0),
    "m": (2 / 3, 0.75, 1.5),
    "l": (1.0, 1.00, 1.0),
    "x": (1.0, 1.25, 1.0),
}
STRIDES = (8, 16, 32)
REG_MAX = 16


def _r(c, w):
    return max(16, int(round(c * w / 8)) * 8) if c * w > 16 else int(c * w)


def _n(n, d):
    return max(1, round(n * d))


class Bottleneck(nn.Module):
    c_out: int
    shortcut: bool = True
    k1: int = 3
    k2: int = 3
    e: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c_out * self.e)
        y = ConvBN(c_, self.k1, name="cv1", dtype=self.dtype)(x, train)
        y = ConvBN(self.c_out, self.k2, name="cv2", dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.c_out:
            y = y + x
        return y


class C2f(nn.Module):
    """Cross-stage partial with 2 convs and progressive bottleneck taps."""
    c_out: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c_out // 2
        y = ConvBN(2 * c_, 1, name="cv1", dtype=self.dtype)(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        ys = [y1, y2]
        for i in range(self.n):
            ys.append(Bottleneck(c_, shortcut=self.shortcut, e=1.0,
                                 name=f"m{i}", dtype=self.dtype)(ys[-1], train))
        return ConvBN(self.c_out, 1, name="cv2", dtype=self.dtype)(
            concat(ys), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast (3 chained 5×5 stride-1 maxpools)."""
    c_out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, name="cv1", dtype=self.dtype)(x, train)
        p1 = nn.max_pool(y, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBN(self.c_out, 1, name="cv2", dtype=self.dtype)(
            concat([y, p1, p2, p3]), train)


class DetectHead(nn.Module):
    """Decoupled anchor-free head: per level box(4·reg_max) + cls(nc) logits."""
    num_classes: int
    ch: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.num_classes, 100))
        outs = []
        for i, f in enumerate(feats):
            b = ConvBN(c2, 3, name=f"box{i}_cv1", dtype=self.dtype)(f, train)
            b = ConvBN(c2, 3, name=f"box{i}_cv2", dtype=self.dtype)(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), use_bias=True, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=f"box{i}_out")(
                            b.astype(jnp.float32))
            c = ConvBN(c3, 3, name=f"cls{i}_cv1", dtype=self.dtype)(f, train)
            c = ConvBN(c3, 3, name=f"cls{i}_cv2", dtype=self.dtype)(c, train)
            c = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                        dtype=jnp.float32, param_dtype=jnp.float32,
                        name=f"cls{i}_out")(c.astype(jnp.float32))
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class YOLOv8(nn.Module):
    """Returns raw per-level maps [B, H/s, W/s, 4·REG_MAX + nc], s ∈ 8/16/32."""
    num_classes: int = 2
    scale: str = "l"
    dtype: Any = jnp.bfloat16
    # from_p2: input is already the P2/4 stem feature [B,H/4,W/4,c2] — the
    # quad-stem inference lowering (ops.quadstem) computed stem+down2 as
    # 2x2 convs over host-relayouted s2d^2 input; unused stem params in a
    # loaded checkpoint are ignored.
    from_p2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        d, w, r = SCALES[self.scale]
        dt = self.dtype
        c1, c2, c3, c4, c5 = (_r(64, w), _r(128, w), _r(256, w), _r(512, w),
                              _r(512 * r, w))
        if self.from_p2:
            assert not train, "from_p2 is an inference-only lowering"
        else:
            x = ConvBN(c1, 3, stride=2, name="stem", dtype=dt)(x, train)  # P1/2
            x = ConvBN(c2, 3, stride=2, name="down2", dtype=dt)(x, train)  # P2/4
        x = C2f(c2, _n(3, d), True, name="c2f1", dtype=dt)(x, train)
        x = ConvBN(c3, 3, stride=2, name="down3", dtype=dt)(x, train)    # P3/8
        p3 = C2f(c3, _n(6, d), True, name="c2f2", dtype=dt)(x, train)
        x = ConvBN(c4, 3, stride=2, name="down4", dtype=dt)(p3, train)   # P4/16
        p4 = C2f(c4, _n(6, d), True, name="c2f3", dtype=dt)(x, train)
        x = ConvBN(c5, 3, stride=2, name="down5", dtype=dt)(p4, train)   # P5/32
        x = C2f(c5, _n(3, d), True, name="c2f4", dtype=dt)(x, train)
        p5 = SPPF(c5, name="sppf", dtype=dt)(x, train)

        # FPN top-down
        x = concat([upsample2(p5), p4])
        f4 = C2f(c4, _n(3, d), False, name="fpn4", dtype=dt)(x, train)
        x = concat([upsample2(f4), p3])
        f3 = C2f(c3, _n(3, d), False, name="fpn3", dtype=dt)(x, train)
        # PAN bottom-up
        x = ConvBN(c3, 3, stride=2, name="pan_down4", dtype=dt)(f3, train)
        f4b = C2f(c4, _n(3, d), False, name="pan4", dtype=dt)(
            concat([x, f4]), train)
        x = ConvBN(c4, 3, stride=2, name="pan_down5", dtype=dt)(f4b, train)
        f5b = C2f(c5, _n(3, d), False, name="pan5", dtype=dt)(
            concat([x, p5]), train)

        return DetectHead(self.num_classes, (f3.shape[-1],), name="detect",
                          dtype=dt)([f3, f4b, f5b], train)
