"""Detection losses (YOLOv7 anchor-based, YOLOv8 anchor-free, XUnet BCE).

The reference has no in-repo training loop (training lives in the archived
Colab notebook x_arch/01_train_tokyo.ipynb, which calls ultralytics); this
module gives the TPU framework a first-party training path. Assignment is
the v5/v7-style wh-ratio rule vectorized with static shapes: targets are a
padded [B, T, 5] tensor (cls, cx, cy, w, h in input pixels; cls = −1 pads),
all matching/scatter happens with masked scatter-max/gather — no
data-dependent shapes, so the whole step jits and shards cleanly.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.yolov7 import STRIDES


def bce_logits(logits, labels):
    """Numerically stable sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def ciou(box_a, box_b, eps: float = 1e-7):
    """Complete IoU between cxcywh boxes (broadcasting)."""
    ax1, ay1 = box_a[..., 0] - box_a[..., 2] / 2, box_a[..., 1] - box_a[..., 3] / 2
    ax2, ay2 = box_a[..., 0] + box_a[..., 2] / 2, box_a[..., 1] + box_a[..., 3] / 2
    bx1, by1 = box_b[..., 0] - box_b[..., 2] / 2, box_b[..., 1] - box_b[..., 3] / 2
    bx2, by2 = box_b[..., 0] + box_b[..., 2] / 2, box_b[..., 1] + box_b[..., 3] / 2
    iw = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    ih = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    inter = iw * ih
    union = (box_a[..., 2] * box_a[..., 3] + box_b[..., 2] * box_b[..., 3]
             - inter + eps)
    iou = inter / union
    # enclosing box diagonal
    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((box_a[..., 0] - box_b[..., 0]) ** 2
            + (box_a[..., 1] - box_b[..., 1]) ** 2)
    v = (4 / jnp.pi**2) * (jnp.arctan(box_b[..., 2] / (box_b[..., 3] + eps))
                           - jnp.arctan(box_a[..., 2] / (box_a[..., 3] + eps))) ** 2
    alpha = v / (1.0 - iou + v + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def yolov7_loss(outs: List[jnp.ndarray], targets: jnp.ndarray,
                anchors, num_classes: int,
                strides: Sequence[int] = STRIDES,
                box_w: float = 0.05, obj_w: float = 1.0, cls_w: float = 0.5,
                anchor_t: float = 4.0, obj_iou_scored: bool = False,
                obj_pos_weight: float = 1.0):
    """outs[i] [B,Hi,Wi,3·(5+nc)] raw logits; targets [B,T,5] padded.

    Returns (scalar loss, metrics dict). Per level: targets are matched to
    anchors by wh-ratio < anchor_t at the cell containing the box center;
    box CIoU + objectness BCE + class BCE.

    obj_iou_scored: True = v5/v7-style detached-IoU objectness targets
    (requires warm box predictions or large data — with few positives the
    all-zero initial targets collapse the objectness head); False (default)
    = classic binary targets at matched cells, which trains robustly from
    scratch on small data.
    """
    tcls = targets[..., 0]
    txy = targets[..., 1:3]
    twh = targets[..., 3:5]
    tvalid = tcls >= 0
    b_total, t_total = tcls.shape

    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    obj_balance = (4.0, 1.0, 0.4)  # v7's per-level objectness weights

    for li, (out, anc, s) in enumerate(zip(outs, anchors, strides)):
        b, h, w, _ = out.shape
        p = out.reshape(b, h, w, 3, 5 + num_classes).astype(jnp.float32)

        anc_a = jnp.asarray(anc, dtype=jnp.float32)          # [3,2]
        ratio = twh[..., None, :] / anc_a[None, None]        # [B,T,3,2]
        ratio = jnp.maximum(ratio, 1.0 / (ratio + 1e-9))
        match = (jnp.max(ratio, axis=-1) < anchor_t) & tvalid[..., None]

        cell = jnp.floor(txy / s)
        cx = jnp.clip(cell[..., 0].astype(jnp.int32), 0, w - 1)
        cy = jnp.clip(cell[..., 1].astype(jnp.int32), 0, h - 1)

        # Gather predictions at matched cells: [B,T,3,5+nc]
        bi = jnp.arange(b)[:, None, None]
        ki = jnp.arange(3)[None, None, :]
        pm = p[bi, cy[..., None], cx[..., None], ki]

        sig = jax.nn.sigmoid(pm)
        pxy = (sig[..., 0:2] * 2.0 - 0.5 + jnp.stack([cx, cy], -1)[..., None, :]) * s
        pwh = (sig[..., 2:4] * 2.0) ** 2 * anc_a[None, None]
        pbox = jnp.concatenate([pxy, pwh], -1)
        tbox = jnp.concatenate([txy, twh], -1)[..., None, :] * jnp.ones((1, 1, 3, 1))

        iou = ciou(pbox, tbox)                                # [B,T,3]
        mf = match.astype(jnp.float32)
        n_match = jnp.maximum(mf.sum(), 1.0)
        total_box += ((1.0 - iou) * mf).sum() / n_match

        # Class BCE at matched cells
        if num_classes > 1:
            onehot = jax.nn.one_hot(jnp.maximum(tcls, 0).astype(jnp.int32),
                                    num_classes)
            cls_l = bce_logits(pm[..., 5:], onehot[..., None, :]).sum(-1)
            total_cls += (cls_l * mf).sum() / n_match

        # Objectness map: scatter targets into [B,H,W,3]
        if obj_iou_scored:
            iou_score = jnp.clip(jax.lax.stop_gradient(iou), 0.0, 1.0) * mf
        else:
            iou_score = mf
        flat_idx = ((bi * h + cy[..., None]) * w + cx[..., None]) * 3 + ki
        flat_idx = jnp.where(match, flat_idx, -1)             # dropped OOB
        tobj = jnp.zeros((b * h * w * 3,), jnp.float32)
        tobj = tobj.at[flat_idx.reshape(-1)].max(
            iou_score.reshape(-1), mode="drop")
        tobj = tobj.reshape(b, h, w, 3)
        obj_bce = bce_logits(p[..., 4], tobj)
        if obj_pos_weight != 1.0:
            # positives are ~1e-3 of cells on sparse scenes; weighting keeps
            # their gradient from drowning in the background sea
            w_map = jnp.where(tobj > 0, obj_pos_weight, 1.0)
            obj_bce = obj_bce * w_map / w_map.mean()
        total_obj += obj_balance[li] * obj_bce.mean()

    loss = box_w * total_box + obj_w * total_obj + cls_w * total_cls
    return loss, {"box": total_box, "obj": total_obj, "cls": total_cls}


def yolov8_loss(outs: List[jnp.ndarray], targets: jnp.ndarray,
                num_classes: int,
                strides: Sequence[int] = STRIDES,
                box_w: float = 7.5, cls_w: float = 0.5, dfl_w: float = 1.5):
    """Anchor-free detection loss for the YOLOv8 head.

    Simplified assignment relative to ultralytics' task-aligned learning:
    each target is assigned to the cell containing its center at every
    level whose size band it falls in (√(w·h) ∈ [2s, 16s); the bands
    deliberately OVERLAP ~4x, so mid-sized boxes supervise 2 levels —
    multi-level assignment stands in for TAL's top-k candidates) —
    deterministic, fully vectorized, static-shaped. Validated end to end:
    fake-world yolov8n reaches mAP50 1.0 / mAP50-95 0.83 (STATUS.md).
    Losses: CIoU (box), distribution focal loss on the ltrb bin
    histograms, BCE (cls).
    """
    from aerial_image_recognition_tpu.models.yolov8 import REG_MAX

    tcls = targets[..., 0]
    txy = targets[..., 1:3]
    twh = targets[..., 3:5]
    tvalid = tcls >= 0
    size = jnp.sqrt(jnp.maximum(twh[..., 0] * twh[..., 1], 1e-6))

    total_box = 0.0
    total_cls = 0.0
    total_dfl = 0.0
    for li, (out, s) in enumerate(zip(outs, strides)):
        b, h, w, _ = out.shape
        p = out.astype(jnp.float32)
        # level assignment by size band
        lo = 0.0 if li == 0 else 2.0 * s
        hi = jnp.inf if li == len(outs) - 1 else 16.0 * s
        match = tvalid & (size >= lo) & (size < hi)

        cell = jnp.floor(txy / s)
        cx = jnp.clip(cell[..., 0].astype(jnp.int32), 0, w - 1)
        cy = jnp.clip(cell[..., 1].astype(jnp.int32), 0, h - 1)
        bi = jnp.arange(b)[:, None]
        pm = p[bi, cy, cx]                      # [B,T,4·REG_MAX+nc]

        # DFL decode at matched cells
        box_logits = pm[..., :4 * REG_MAX].reshape(*pm.shape[:-1], 4, REG_MAX)
        bins = jnp.arange(REG_MAX, dtype=jnp.float32)
        ltrb = jnp.einsum("btsk,k->bts",
                          jax.nn.softmax(box_logits, -1), bins)
        anchor = jnp.stack([cx, cy], -1).astype(jnp.float32) + 0.5
        px1y1 = (anchor - ltrb[..., 0:2]) * s
        px2y2 = (anchor + ltrb[..., 2:4]) * s
        pbox = jnp.concatenate([(px1y1 + px2y2) / 2, px2y2 - px1y1], -1)
        tbox = jnp.concatenate([txy, twh], -1)

        mf = match.astype(jnp.float32)
        n_match = jnp.maximum(mf.sum(), 1.0)
        iou = ciou(pbox, tbox)
        total_box += ((1.0 - iou) * mf).sum() / n_match

        # DFL: cross-entropy against the two bins bracketing the true
        # ltrb distances from the anchor point (stride units, clamped)
        ax = cx.astype(jnp.float32) + 0.5
        ay = cy.astype(jnp.float32) + 0.5
        t_l = ax - (txy[..., 0] - twh[..., 0] / 2) / s
        t_t = ay - (txy[..., 1] - twh[..., 1] / 2) / s
        t_r = (txy[..., 0] + twh[..., 0] / 2) / s - ax
        t_b = (txy[..., 1] + twh[..., 1] / 2) / s - ay
        t_ltrb = jnp.clip(jnp.stack([t_l, t_t, t_r, t_b], -1),
                          0.0, REG_MAX - 1.001)
        lo_bin = jnp.floor(t_ltrb)
        frac = t_ltrb - lo_bin
        logp = jax.nn.log_softmax(box_logits, axis=-1)
        lo_i = lo_bin.astype(jnp.int32)
        lp_lo = jnp.take_along_axis(logp, lo_i[..., None], -1)[..., 0]
        lp_hi = jnp.take_along_axis(logp, (lo_i + 1)[..., None], -1)[..., 0]
        dfl = -((1.0 - frac) * lp_lo + frac * lp_hi).mean(-1)
        total_dfl += (dfl * mf).sum() / n_match

        # classification BCE over the FULL anchor map with zero targets at
        # unassigned cells. YOLOv8 has no objectness channel — cls sigmoid IS
        # the confidence (ops/decode.py) — so background cells need negative
        # supervision or the model never learns to suppress background
        # (upstream ultralytics computes BCE over all anchors likewise).
        onehot = jax.nn.one_hot(jnp.maximum(tcls, 0).astype(jnp.int32),
                                num_classes)
        flat_idx = (bi * h + cy) * w + cx                     # [B,T]
        flat_idx = jnp.where(match, flat_idx, -1)
        tmap = jnp.zeros((b * h * w, num_classes), jnp.float32)
        tmap = tmap.at[flat_idx.reshape(-1)].max(
            onehot.reshape(-1, num_classes)
            * mf.reshape(-1)[:, None], mode="drop")
        tmap = tmap.reshape(b, h, w, num_classes)
        total_cls += bce_logits(p[..., 4 * REG_MAX:], tmap).sum() / n_match

    loss = box_w * total_box + dfl_w * total_dfl + cls_w * total_cls
    return loss, {"box": total_box, "dfl": total_dfl, "cls": total_cls}


def xunet_loss(logits: jnp.ndarray, masks: jnp.ndarray):
    """Per-pixel BCE + soft-dice for the segmentation head."""
    bce = bce_logits(logits, masks).mean()
    p = jax.nn.sigmoid(logits)
    inter = (p * masks).sum((1, 2, 3))
    dice = 1.0 - (2 * inter + 1.0) / (p.sum((1, 2, 3)) + masks.sum((1, 2, 3)) + 1.0)
    return bce + dice.mean(), {"bce": bce, "dice": dice.mean()}
