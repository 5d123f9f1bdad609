"""Detect-head decode: raw per-level feature maps → (boxes, scores).

Replicates what the reference's ONNX graphs bake in before their [1,N,5+nc]
output (SURVEY.md §3.3 contract, read at reference simple_detector.py:479):
anchor-grid decode for YOLOv7, DFL-expectation decode for YOLOv8. Both emit a
unified (boxes [B,A,4] cxcywh-pixels, scores [B,A,nc]) pair consumed by
ops.nms. Everything is static-shaped and jit/pjit-traceable.
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.yolov7 import STRIDES as V7_STRIDES
from aerial_image_recognition_tpu.models.yolov8 import STRIDES as V8_STRIDES
from aerial_image_recognition_tpu.models.yolov8 import REG_MAX


def _grid(h: int, w: int):
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return gx, gy


def decode_yolov7(outs: List[jnp.ndarray],
                  anchors: Sequence[Sequence[Tuple[float, float]]],
                  num_classes: int,
                  strides: Sequence[int] = V7_STRIDES):
    """YOLOv5/v7-style decode: xy = (2σ−0.5 + grid)·stride, wh = (2σ)²·anchor.

    outs[i]: [B, H, W, 3·(5+nc)] raw logits. Returns
    (boxes [B, A, 4] cx,cy,w,h in input pixels; scores [B, A, nc] = obj·cls).
    """
    boxes_all, scores_all = [], []
    for out, anc, s in zip(outs, anchors, strides):
        b, h, w, _ = out.shape
        y = jax.nn.sigmoid(out.reshape(b, h, w, 3, 5 + num_classes))
        gx, gy = _grid(h, w)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]   # [1,H,W,1,2]
        anc_a = jnp.asarray(anc, dtype=jnp.float32)[None, None, None, :, :]
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(s)
        wh = (y[..., 2:4] * 2.0) ** 2 * anc_a
        if num_classes == 1:
            # single-class: confidence is objectness alone (upstream yolo
            # semantics — no class loss is trained at nc=1, and the
            # reference thresholds on column 4 directly,
            # simple_detector.py:480)
            scores = y[..., 4:5]
        else:
            scores = y[..., 4:5] * y[..., 5:]
        boxes_all.append(jnp.concatenate([xy, wh], -1).reshape(b, -1, 4))
        scores_all.append(scores.reshape(b, -1, num_classes))
    return jnp.concatenate(boxes_all, 1), jnp.concatenate(scores_all, 1)


def decode_yolov8(outs: List[jnp.ndarray], num_classes: int,
                  strides: Sequence[int] = V8_STRIDES):
    """Anchor-free DFL decode: per-side softmax expectation over REG_MAX bins
    → ltrb distances from cell centers → cxcywh pixels; scores = σ(cls).

    outs[i]: [B, H, W, 4·REG_MAX + nc] raw logits.
    """
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    boxes_all, scores_all = [], []
    for out, s in zip(outs, strides):
        b, h, w, _ = out.shape
        box_logits = out[..., : 4 * REG_MAX].reshape(b, h, w, 4, REG_MAX)
        ltrb = jnp.einsum("bhwsk,k->bhws",
                          jax.nn.softmax(box_logits, axis=-1), bins)
        gx, gy = _grid(h, w)
        cx = gx[None, :, :] + 0.5
        cy = gy[None, :, :] + 0.5
        x1 = cx - ltrb[..., 0]
        y1 = cy - ltrb[..., 1]
        x2 = cx + ltrb[..., 2]
        y2 = cy + ltrb[..., 3]
        boxes = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1],
                          axis=-1) * float(s)
        scores = jax.nn.sigmoid(out[..., 4 * REG_MAX:])
        boxes_all.append(boxes.reshape(b, -1, 4))
        scores_all.append(scores.reshape(b, -1, num_classes))
    return jnp.concatenate(boxes_all, 1), jnp.concatenate(scores_all, 1)
