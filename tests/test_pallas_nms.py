"""Pallas NMS kernel vs the lax.scan formulation (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from aerial_image_recognition_tpu.ops.nms import batched_nms


def _random_problem(rng, b=3, n=300, nc=1):
    boxes = np.stack([
        rng.uniform(0, 640, (b, n)), rng.uniform(0, 640, (b, n)),
        rng.uniform(5, 60, (b, n)), rng.uniform(5, 60, (b, n))],
        axis=-1).astype(np.float32)
    boxes[:, n // 2:] = boxes[:, : n // 2] \
        + rng.normal(0, 3, (b, n // 2, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n, nc)).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("nc,class_aware", [(1, True), (3, True)])
def test_pallas_kernel_matches_scan(rng, nc, class_aware):
    boxes, scores = _random_problem(rng, nc=nc)
    kw = dict(num_classes=nc, conf_threshold=0.3, iou_threshold=0.45,
              max_det=64, pre_topk=256, class_aware=class_aware)
    ref = batched_nms(boxes, scores, use_pallas=False, **kw)
    got = batched_nms(boxes, scores, use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.boxes)[np.asarray(got.valid)],
        np.asarray(ref.boxes)[np.asarray(ref.valid)], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(ref.classes))


def test_pallas_kernel_empty_input(rng):
    boxes = jnp.zeros((2, 128, 4), jnp.float32)
    scores = jnp.zeros((2, 128, 1), jnp.float32)   # all below threshold
    det = batched_nms(boxes, scores, num_classes=1, conf_threshold=0.3,
                      max_det=16, pre_topk=128, use_pallas=True)
    assert int(det.valid.sum()) == 0
    assert int((det.classes == -1).sum()) == 2 * 16


def test_grouped_nms_odd_batches(rng):
    """Auto-grouping must handle batch sizes with no large divisor (B=6 →
    group 2, B=7 → group 1) and agree with the scan path."""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.nms import batched_nms

    for b in (6, 7):
        boxes = rng.uniform(0, 600, (b, 64, 4)).astype(np.float32)
        boxes[..., 2:] = rng.uniform(5, 40, (b, 64, 2))
        scores = rng.uniform(0, 1, (b, 64, 1)).astype(np.float32)
        ref = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          num_classes=1, conf_threshold=0.3, max_det=16,
                          pre_topk=64, use_pallas=False)
        got = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          num_classes=1, conf_threshold=0.3, max_det=16,
                          pre_topk=64, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(ref.valid),
                                      np.asarray(got.valid))
        np.testing.assert_allclose(
            np.asarray(ref.scores), np.asarray(got.scores), rtol=1e-6)
