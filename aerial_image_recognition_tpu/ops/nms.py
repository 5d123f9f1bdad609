"""Batched class-aware NMS with static shapes (jit/pjit-traceable).

Performs what the reference's ONNX export bakes into the graph (SURVEY.md
§3.3: "NMS already baked in"; only confidence thresholding remains in python
at reference simple_detector.py:480). Exact greedy NMS — highest remaining
score wins, IoU>threshold neighbors of the same class are suppressed — via a
lax.scan of max_det suppression rounds over a top-K preselection, which is
the TPU-friendly formulation (static shapes, no data-dependent control flow).

A numpy reference implementation lives in tests for golden comparison.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    """Fixed-slot detection batch (invalid slots masked, not removed)."""
    boxes: jnp.ndarray    # [B, D, 4] cx,cy,w,h (input pixels)
    scores: jnp.ndarray   # [B, D]
    classes: jnp.ndarray  # [B, D] int32
    valid: jnp.ndarray    # [B, D] bool


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of cxcywh boxes: [N,4] × [M,4] → [N,M]."""
    ax1 = boxes_a[:, 0] - boxes_a[:, 2] / 2
    ay1 = boxes_a[:, 1] - boxes_a[:, 3] / 2
    ax2 = boxes_a[:, 0] + boxes_a[:, 2] / 2
    ay2 = boxes_a[:, 1] + boxes_a[:, 3] / 2
    bx1 = boxes_b[:, 0] - boxes_b[:, 2] / 2
    by1 = boxes_b[:, 1] - boxes_b[:, 3] / 2
    bx2 = boxes_b[:, 0] + boxes_b[:, 2] / 2
    by2 = boxes_b[:, 1] + boxes_b[:, 3] / 2
    ix = jnp.maximum(0.0, jnp.minimum(ax2[:, None], bx2[None, :])
                     - jnp.maximum(ax1[:, None], bx1[None, :]))
    iy = jnp.maximum(0.0, jnp.minimum(ay2[:, None], by2[None, :])
                     - jnp.maximum(ay1[:, None], by1[None, :]))
    inter = ix * iy
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _nms_single(top_boxes, top_scores, top_cls, num_classes, conf_threshold,
                iou_threshold, max_det, class_aware):
    """One image, preselected candidates: boxes [K,4], scores [K],
    classes [K] → fixed max_det slots."""
    iou = iou_matrix(top_boxes, top_boxes)
    if class_aware and num_classes > 1:
        same = top_cls[:, None] == top_cls[None, :]
        iou = jnp.where(same, iou, 0.0)

    def round_fn(avail_scores, _):
        i = jnp.argmax(avail_scores)
        s = avail_scores[i]
        suppress = iou[i] > iou_threshold
        nxt = jnp.where(suppress, -1.0, avail_scores).at[i].set(-1.0)
        return nxt, (i, s)

    _, (pick_idx, pick_score) = jax.lax.scan(
        round_fn, jnp.where(top_scores >= conf_threshold, top_scores, -1.0),
        None, length=max_det)

    valid = pick_score >= conf_threshold
    return Detections(
        boxes=jnp.where(valid[:, None], top_boxes[pick_idx], 0.0),
        scores=jnp.where(valid, pick_score, 0.0),
        classes=jnp.where(valid, top_cls[pick_idx], -1),
        valid=valid,
    )


def _nms_fixpoint(top_boxes, top_scores, top_cls, conf, iou_threshold,
                  max_det, class_aware):
    """Exact greedy NMS without the serial pick loop (whole batch at once).

    Greedy NMS has a closed fixpoint characterization: box i survives iff
    no higher-priority surviving box overlaps it (priority = score desc,
    index asc — exactly argmax's tie rule in the sequential forms). The
    dependency graph is acyclic (strictly higher priority), so Jacobi
    iteration from all-survive converges to the unique fixpoint in
    longest-suppression-chain rounds (a handful on real tile loads, vs
    max_det serial rounds for the scan/Pallas forms). Each round is one
    fused [B,K,K] masked any-reduce — VPU-shaped work with no
    data-dependent control flow inside.

    top_boxes [B,K,4], top_scores [B,K], top_cls [B,K] → Detections.
    Bit-identical picks to _nms_single / nms_suppress_pallas for any input
    (survivors in score order ARE the greedy pick sequence; lax.top_k and
    argmax share the lowest-index tie rule).
    """
    b, k = top_scores.shape
    s = jnp.where(top_scores >= conf, top_scores.astype(jnp.float32), -1.0)
    iou = jax.vmap(lambda bx: iou_matrix(bx, bx))(top_boxes)
    if class_aware:
        same = top_cls[:, :, None] == top_cls[:, None, :]
        iou = jnp.where(same, iou, 0.0)
    lane = jnp.arange(k, dtype=jnp.int32)
    # dom[b,i,j]: j may suppress i (overlaps and strictly higher priority)
    beats = (s[:, None, :] > s[:, :, None]) | (
        (s[:, None, :] == s[:, :, None]) & (lane[None, :] < lane[:, None]))
    dom = (iou > iou_threshold) & beats

    def cond(state):
        return state[1]

    def body(state):
        kept, _ = state
        new = ~jnp.any(dom & kept[:, None, :], axis=2)
        return new, jnp.any(new != kept)

    kept, _ = jax.lax.while_loop(cond, body,
                                 (jnp.ones_like(s, dtype=bool), True))
    d = min(max_det, k)
    pick_score, pick_idx = jax.lax.top_k(jnp.where(kept, s, -1.0), d)
    if d < max_det:                       # fewer candidates than slots
        pad = max_det - d
        pick_score = jnp.pad(pick_score, ((0, 0), (0, pad)),
                             constant_values=-1.0)
        pick_idx = jnp.pad(pick_idx, ((0, 0), (0, pad)))
    valid = pick_score >= conf
    out_boxes = jnp.take_along_axis(top_boxes, pick_idx[..., None], axis=1)
    out_cls = jnp.take_along_axis(top_cls, pick_idx, axis=1)
    return Detections(
        boxes=jnp.where(valid[..., None], out_boxes, 0.0),
        scores=jnp.where(valid, pick_score, 0.0),
        classes=jnp.where(valid, out_cls, -1),
        valid=valid,
    )


def box_voting(det: Detections, cand_boxes: jnp.ndarray,
               cand_scores: jnp.ndarray, cand_cls: jnp.ndarray, *,
               vote_iou: float, conf_threshold: float,
               class_aware: bool) -> Detections:
    """Score-weighted box refinement of NMS survivors (box voting,
    Gkioxari & Girshick "Hypercolumns"-era detection refinement; weighted
    box fusion family): each kept box is replaced by the score-weighted
    mean of every candidate box that overlaps it at IoU >= vote_iou (same
    class when class_aware), including the suppressed near-duplicates NMS
    discarded. Recovers localization precision that argmax-keep throws
    away — built for the coarse-scale regime where the round-5 accuracy
    A/B measured box misfit as the binding error (BASELINE.md).

    det: the NMS output. cand_*: the preselected candidate set the
    suppression ran over ([B,K,4] / [B,K] / [B,K]). Scores, classes and
    validity pass through unchanged; only boxes move.
    """
    w_mask = cand_scores >= conf_threshold                      # [B,K]
    if class_aware:
        same = det.classes[:, :, None] == cand_cls[:, None, :]  # [B,D,K]
    else:
        same = True
    iou = jax.vmap(iou_matrix)(det.boxes, cand_boxes)           # [B,D,K]
    m = (iou >= vote_iou) & same & w_mask[:, None, :]
    w = jnp.where(m, cand_scores[:, None, :].astype(jnp.float32), 0.0)
    tot = jnp.sum(w, axis=2, keepdims=True)                     # [B,D,1]
    # precision=HIGHEST: on TPU the default matmul precision rounds f32
    # einsum operands to bf16 on the MXU — at 640-px coordinates that is a
    # ±2 px ULP, the whole IoU-0.5 margin of a 9×4 px car. The round-5
    # on-chip A/B measured exactly that as a mAP50 collapse (0.703→0.297)
    # before this pin; CPU (full-precision einsum) never showed it.
    voted = jnp.einsum("bdk,bkc->bdc", w, cand_boxes.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST) \
        / jnp.maximum(tot, 1e-9)
    # invalid slots keep zeros; a valid box always matches itself, but
    # guard tot==0 anyway (degenerate zero-area boxes)
    keep_orig = (tot <= 0.0) | ~det.valid[..., None]
    new_boxes = jnp.where(keep_orig, det.boxes,
                          voted.astype(det.boxes.dtype))
    return det._replace(boxes=new_boxes)


@partial(jax.jit, static_argnames=("num_classes", "max_det", "pre_topk",
                                   "class_aware", "use_pallas",
                                   "iou_threshold", "preselect",
                                   "suppression", "vote_iou"))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *,
                num_classes: int,
                conf_threshold: float = 0.3,
                iou_threshold: float = 0.45,
                max_det: int = 128,
                pre_topk: int = 512,
                class_aware: bool = True,
                use_pallas: bool = None,
                preselect: str = "exact",
                suppression: str = None,
                vote_iou: float = None) -> Detections:
    """boxes [B,A,4] cxcywh, scores [B,A,nc] → Detections with D=max_det.

    preselect: 'exact' (lax.top_k) or 'approx' (lax.approx_max_k — the
    TPU-native partial sort; ~same results since only near-threshold
    candidates can be missed). On TPU the suppression tail runs as the
    fused Pallas kernel (ops.pallas_kernels.nms_suppress_pallas); elsewhere
    as the lax.scan formulation. Both are exact greedy NMS with identical
    tie behavior for a given preselect.

    vote_iou: when set, survivors' boxes are refined by score-weighted
    box voting over the preselected candidates at this IoU gate
    (box_voting above); None = off.
    """
    from aerial_image_recognition_tpu.ops.pallas_kernels import (
        nms_suppress_pallas, pallas_available)

    if use_pallas is None:
        use_pallas = pallas_available()
    if suppression is None:
        suppression = "pallas" if use_pallas else "scan"
    conf = jnp.asarray(conf_threshold, dtype=scores.dtype)

    b, a, _ = boxes.shape
    k = min(pre_topk, a)
    best = jnp.max(scores, axis=-1)                       # [B, A]
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    if preselect == "approx" and k < a:
        top_scores, idx = jax.lax.approx_max_k(best, k)
    else:
        top_scores, idx = jax.lax.top_k(best, k)          # [B, K]
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_cls = jnp.take_along_axis(cls, idx, axis=1)

    if suppression not in ("fixpoint", "scan", "pallas"):
        raise ValueError(f"unknown nms suppression {suppression!r} "
                         "(expected 'pallas', 'scan' or 'fixpoint')")
    if suppression == "fixpoint":
        # threshold in scores.dtype, matching the scan path's cast — keeps
        # the bit-identical-picks guarantee for bf16 direct callers too
        det = _nms_fixpoint(top_boxes, top_scores, top_cls, conf,
                            jnp.asarray(iou_threshold, dtype=scores.dtype),
                            max_det, class_aware and num_classes > 1)
    elif suppression == "scan" or not use_pallas:
        iou_t = jnp.asarray(iou_threshold, dtype=scores.dtype)
        det = jax.vmap(
            lambda tb, ts, tc: _nms_single(tb, ts, tc, num_classes, conf,
                                           iou_t, max_det, class_aware)
        )(top_boxes, top_scores, top_cls)
    else:
        masked = jnp.where(top_scores >= conf,
                           top_scores.astype(jnp.float32), -1.0)
        pidx, pconf, pcls = nms_suppress_pallas(
            top_boxes.astype(jnp.float32).transpose(0, 2, 1), masked,
            top_cls, iou_threshold=float(iou_threshold), max_det=max_det,
            class_aware=class_aware and num_classes > 1,
            interpret=not pallas_available())  # CPU: interpreter-mode kernel
        valid = pconf >= conf
        out_boxes = jnp.take_along_axis(top_boxes, pidx[..., None], axis=1)
        det = Detections(
            boxes=jnp.where(valid[..., None], out_boxes, 0.0),
            scores=jnp.where(valid, pconf, 0.0),
            classes=jnp.where(valid, pcls, -1),
            valid=valid,
        )
    if vote_iou is not None:
        det = box_voting(det, top_boxes, top_scores, top_cls,
                         vote_iou=float(vote_iou),
                         conf_threshold=conf_threshold,
                         class_aware=class_aware and num_classes > 1)
    return det
