"""Pallas TPU kernels for the detection hot path.

``nms_suppress_pallas`` fuses the entire per-image NMS tail — box corner
conversion, the K×K IoU matrix, and the greedy suppression scan — into one
kernel that keeps everything in VMEM (K=512 → the IoU matrix is 1 MB,
comfortably on-chip), instead of the XLA formulation that materializes the
IoU matrix in HBM and re-reads a row every scan round. One grid program per
image; the batch dimension is the grid.

Layouts are TPU-shaped: boxes arrive as [B, 4, K] (coordinate-major, so
every vector the VPU touches is a [1, K] row with K on the 128-wide lane
dimension). Falls back to interpret mode off-TPU so tests run on CPU.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, cls_ref, idx_ref, conf_ref,
                cls_out_ref, iou_scr, avail_scr, *, max_det: int,
                iou_threshold: float, class_aware: bool, group: int):
    """Grouped NMS: one grid program handles `group` images. The greedy
    suppression loop is inherently serial per image (each round's pick
    depends on the previous suppressions), so a 1-image program is
    latency-bound on max_det tiny VPU rounds; processing G images per round
    amortizes that fixed per-round cost G× (G·K·K IoU scratch must fit
    VMEM: G=8, K=512 → 8 MB of the ~16 MB budget)."""
    k = boxes_ref.shape[2]

    def col(v):                               # [1,K] → [K,1]
        return jnp.swapaxes(v, 0, 1)

    for g in range(group):
        bx = boxes_ref[g]                     # [4, K] cx,cy,w,h rows
        cx, cy = bx[0:1, :], bx[1:2, :]
        hw, hh = bx[2:3, :] * 0.5, bx[3:4, :] * 0.5
        x1, x2 = cx - hw, cx + hw             # [1, K] rows
        y1, y2 = cy - hh, cy + hh
        ix = jnp.maximum(0.0, jnp.minimum(col(x2), x2)
                         - jnp.maximum(col(x1), x1))      # [K, K]
        iy = jnp.maximum(0.0, jnp.minimum(col(y2), y2)
                         - jnp.maximum(col(y1), y1))
        inter = ix * iy
        area = (x2 - x1) * (y2 - y1)          # [1, K]
        iou = inter / jnp.maximum(col(area) + area - inter, 1e-9)
        if class_aware:
            cls = cls_ref[g]                  # [1, K] int32
            iou = jnp.where(col(cls) == cls, iou, 0.0)
        # Stage in VMEM scratch — Mosaic only lowers dynamic slicing
        # through refs, not on values.
        iou_scr[g] = iou
    avail_scr[:] = scores_ref[:, 0, :]        # [G, K]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def round_fn(d, _):
        for g in range(group):                # static unroll over the group
            av = avail_scr[g:g + 1, :]        # [1, K]
            i = jnp.argmax(av)                # flat == column (row 0)
            # scalar picks land in SMEM outputs (VMEM can't take scalar
            # stores); values are extracted by reductions, not dynamic
            # scalar reads
            idx_ref[0, g, d] = i.astype(jnp.int32)
            conf_ref[0, g, d] = jnp.max(av)
            if class_aware:
                cls_out_ref[0, g, d] = jnp.sum(
                    jnp.where(lane == i, cls_ref[g], 0)).astype(jnp.int32)
            else:
                cls_out_ref[0, g, d] = jnp.int32(0)
            row = iou_scr[g, pl.ds(i, 1), :]  # [1, K]
            avail_scr[g:g + 1, :] = jnp.where(
                (row > iou_threshold) | (lane == i), -1.0, av)
        return 0

    jax.lax.fori_loop(0, max_det, round_fn, 0, unroll=False)


@partial(jax.jit, static_argnames=("iou_threshold", "max_det", "class_aware",
                                   "interpret", "group"))
def nms_suppress_pallas(boxes_t: jnp.ndarray, scores: jnp.ndarray,
                        classes: jnp.ndarray, *, iou_threshold: float = 0.45,
                        max_det: int = 128, class_aware: bool = True,
                        interpret: bool = False, group: int = 0
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """boxes_t [B,4,K] (coordinate-major cxcywh), scores [B,K] (−1 marks
    below-threshold slots), classes [B,K] int32
    → (idx [B,D], conf [B,D], cls [B,D]).

    group: images per grid program (0 → auto: largest of 8/4/2/1 dividing B
    that keeps the IoU scratch within VMEM). Grouping amortizes the serial
    greedy-round cost across G images; results are identical for any group.
    """
    b, four, k = boxes_t.shape
    assert four == 4
    if group <= 0:
        # IoU scratch is G·K²·4 B; with input blocks + compiler overhead the
        # whole program must fit the ~16 MB scoped-VMEM limit, so cap the
        # scratch at ~6 MB (G=4 for K=512 — G=8 was measured to OOM at
        # 17.53 M/16 M).
        budget = 6 * 1024 * 1024 // (k * k * 4)
        group = next((g for g in (8, 4, 2, 1)
                      if b % g == 0 and g <= max(budget, 1)), 1)
    kernel = partial(_nms_kernel, max_det=max_det,
                     iou_threshold=float(iou_threshold),
                     class_aware=class_aware, group=group)
    nb = b // group
    idx3, conf3, cls3 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((group, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, group, max_det), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, max_det), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, group, max_det), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # outputs are [nb, group, max_det] so every block's trailing two
        # dims equal the array dims (Mosaic tiling constraint)
        out_shape=[
            jax.ShapeDtypeStruct((nb, group, max_det), jnp.int32),
            jax.ShapeDtypeStruct((nb, group, max_det), jnp.float32),
            jax.ShapeDtypeStruct((nb, group, max_det), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, k, k), jnp.float32),  # IoU matrices
            pltpu.VMEM((group, k), jnp.float32),     # availability vectors
        ],
        interpret=interpret,
    )(boxes_t, scores.reshape(b, 1, k), classes.reshape(b, 1, k))
    return (idx3.reshape(b, max_det), conf3.reshape(b, max_det),
            cls3.reshape(b, max_det))


def pallas_available() -> bool:
    """True on a real TPU backend (Mosaic); CPU paths use interpret mode."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
