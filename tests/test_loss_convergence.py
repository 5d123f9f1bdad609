"""Loss-math convergence: optimizing raw logits through the loss must
recover the exact target boxes via the decode path.

This validates the full loss↔decode consistency loop (assignment, CIoU
gradients, objectness scatter, sigmoid parameterization) without the
network in the way — the same check that caught nothing wrong in the loss
when full-network training stalled (a recipe issue, see STATUS.md).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from aerial_image_recognition_tpu.models.yolov7 import ANCHORS_TINY
from aerial_image_recognition_tpu.ops.decode import decode_yolov7, decode_yolov8
from aerial_image_recognition_tpu.ops.losses import yolov7_loss, yolov8_loss


def test_yolov7_loss_recovers_boxes():
    B, S = 2, 96
    shapes = [(B, S // 8, S // 8, 18), (B, S // 16, S // 16, 18),
              (B, S // 32, S // 32, 18)]
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    outs = [0.01 * jax.random.normal(k, sh) for k, sh in zip(keys, shapes)]
    tgts = np.full((B, 4, 5), -1.0, np.float32)
    tgts[:, 0] = (0, 30.0, 40.0, 9.0, 4.5)
    tgts[:, 1] = (0, 70.0, 20.0, 9.0, 4.5)
    tgts = jnp.asarray(tgts)

    g_fn = jax.jit(jax.value_and_grad(
        lambda o: yolov7_loss(o, tgts, ANCHORS_TINY, 1)[0]))
    tx = optax.adam(5e-2)
    st = tx.init(outs)
    for _ in range(300):
        _, g = g_fn(outs)
        upd, st = tx.update(g, st, outs)
        outs = optax.apply_updates(outs, upd)

    boxes, scores = decode_yolov7(outs, ANCHORS_TINY, 1)
    for b in range(B):
        order = jnp.argsort(-scores[b, :, 0])[:2]
        got = np.asarray(boxes[b][order])
        want = {(30.0, 40.0), (70.0, 20.0)}
        for g_box in got:
            match = min(want, key=lambda w: abs(w[0] - g_box[0]))
            assert abs(g_box[0] - match[0]) < 1.0
            assert abs(g_box[2] - 9.0) < 1.0      # width recovered
            assert abs(g_box[3] - 4.5) < 1.0      # height recovered
        assert float(scores[b, order[0], 0]) > 0.25


def test_yolov8_loss_recovers_boxes():
    B, S, nc = 1, 64, 2
    shapes = [(B, S // 8, S // 8, 64 + nc), (B, S // 16, S // 16, 64 + nc),
              (B, S // 32, S // 32, 64 + nc)]
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    outs = [0.01 * jax.random.normal(k, sh) for k, sh in zip(keys, shapes)]
    tgts = np.full((B, 4, 5), -1.0, np.float32)
    tgts[:, 0] = (0, 20.0, 24.0, 10.0, 8.0)
    tgts[:, 1] = (1, 44.0, 44.0, 12.0, 9.0)
    tgts = jnp.asarray(tgts)

    g_fn = jax.jit(jax.value_and_grad(
        lambda o: yolov8_loss(o, tgts, nc)[0]))
    tx = optax.adam(5e-2)
    st = tx.init(outs)
    for _ in range(300):
        _, g = g_fn(outs)
        upd, st = tx.update(g, st, outs)
        outs = optax.apply_updates(outs, upd)

    boxes, scores = decode_yolov8(outs, nc)
    best = jnp.max(scores[0], axis=-1)
    order = jnp.argsort(-best)[:2]
    got = np.asarray(boxes[0][order])
    cls = np.asarray(jnp.argmax(scores[0], -1)[order])
    centers = {tuple(np.round(g_box[:2]).astype(int)) for g_box in got}
    assert (20, 24) in centers and (44, 44) in centers
    assert set(cls) == {0, 1}
    for g_box in got:
        assert 6.0 < g_box[2] < 16.0 and 5.0 < g_box[3] < 13.0
    # background suppression: v8 has no objectness channel, cls sigmoid IS
    # the confidence, so unmatched anchors must receive negative supervision
    # and converge to ~zero score (round-1 loss omitted this — advisor
    # finding: inflated false positives)
    n_confident = int((np.asarray(best) > 0.25).sum())
    assert n_confident <= 6, f"{n_confident} anchors confident; background not suppressed"
    background_mean = float(jnp.sort(best)[: best.shape[0] - 8].mean())
    assert background_mean < 0.05
