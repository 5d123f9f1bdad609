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


def test_fast_nms_defaults_match_exact_on_trained_load():
    """Round-2 default flip (approx_max_k preselect, pre_topk 256,
    max_det 64) must yield the IDENTICAL detection set as the conservative
    config (exact top-k, 512, 128) on realistic trained-weight loads — the
    speedup is only allowed to differ on sub-threshold candidates."""
    import os
    import jax
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "yolov7_tiny_fakeworld.npz")
    if not os.path.exists(fixture):
        pytest.skip("trained fixture not present")
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=500, seed=9)
    import math
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    tiles, bnds = [], []
    for k in range(8):
        lon, lat, _ = world.cars[k * 11]
        bbox = (lon - 4.8 * m2lon, lat - 4.8 * m2lat,
                lon + 4.8 * m2lon, lat + 4.8 * m2lat)
        tiles.append(world.render(bbox, 96, 96))
        bnds.append(bbox)
    imgs = jnp.asarray(np.stack(tiles))
    bnds = jnp.asarray(np.asarray(bnds, np.float32))

    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(fixture))

    fast_cfg = DetectorConfig(dtype="float32", confidence_threshold=0.3)
    slow_cfg = DetectorConfig(dtype="float32", confidence_threshold=0.3,
                              max_detections_per_tile=128,
                              extra={"nms_preselect": "exact",
                                     "nms_pre_topk": 512})
    fast = jax.jit(make_detect_fn(bundle, fast_cfg, model_size=96))
    slow = jax.jit(make_detect_fn(bundle, slow_cfg, model_size=96))
    det_f, lon_f, lat_f = fast(bundle.params, imgs, bnds)
    det_s, lon_s, lat_s = slow(bundle.params, imgs, bnds)

    vf, vs = np.asarray(det_f.valid), np.asarray(det_s.valid)
    assert vf.sum() == vs.sum() > 10
    for b in range(vf.shape[0]):
        pf = sorted(zip(np.asarray(lon_f[b])[vf[b]].tolist(),
                        np.asarray(lat_f[b])[vf[b]].tolist(),
                        np.asarray(det_f.scores[b])[vf[b]].tolist()))
        ps = sorted(zip(np.asarray(lon_s[b])[vs[b]].tolist(),
                        np.asarray(lat_s[b])[vs[b]].tolist(),
                        np.asarray(det_s.scores[b])[vs[b]].tolist()))
        np.testing.assert_allclose(np.asarray(pf), np.asarray(ps),
                                   rtol=0, atol=1e-7)


@pytest.mark.parametrize("nc,class_aware", [(1, True), (3, True)])
def test_fixpoint_matches_scan(rng, nc, class_aware):
    """The Jacobi-fixpoint suppression must reproduce greedy NMS exactly
    (same picks, scores, classes, validity) on clustered random loads."""
    boxes, scores = _random_problem(rng, nc=nc)
    kw = dict(num_classes=nc, conf_threshold=0.3, iou_threshold=0.45,
              max_det=64, pre_topk=256, class_aware=class_aware)
    ref = batched_nms(boxes, scores, use_pallas=False, **kw)
    got = batched_nms(boxes, scores, suppression="fixpoint", **kw)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.boxes)[np.asarray(got.valid)],
        np.asarray(ref.boxes)[np.asarray(ref.valid)], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(ref.classes))


def test_fixpoint_suppression_chain():
    """The case that separates exact greedy from one-shot matrix NMS: a
    chain A>B>C where A suppresses B, so C must SURVIVE (its only
    higher-scoring overlapper was itself suppressed). Jacobi iteration must
    run past the first round to get this right."""
    # 6 boxes in a row: consecutive pairs IoU 0.60, one-apart 0.33 — only
    # immediate neighbors suppress at threshold 0.45
    n = 6
    boxes = np.zeros((1, n, 4), np.float32)
    for i in range(n):
        boxes[0, i] = (10.0 * i, 50.0, 40.0, 40.0)   # stride 10, size 40
    scores = np.linspace(0.9, 0.6, n, dtype=np.float32).reshape(1, n, 1)
    det = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      num_classes=1, conf_threshold=0.3, iou_threshold=0.45,
                      max_det=8, pre_topk=n, suppression="fixpoint")
    ref = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      num_classes=1, conf_threshold=0.3, iou_threshold=0.45,
                      max_det=8, pre_topk=n, use_pallas=False)
    # greedy keeps the even-indexed boxes: 0 kills 1, 2 kills 3, 4 kills 5
    kept_x = sorted(np.asarray(det.boxes[0, :, 0])[np.asarray(det.valid[0])])
    assert kept_x == [0.0, 20.0, 40.0]
    np.testing.assert_array_equal(np.asarray(det.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(det.scores), np.asarray(ref.scores))


def test_fixpoint_empty_input():
    boxes = jnp.zeros((2, 64, 4), jnp.float32)
    scores = jnp.zeros((2, 64, 1), jnp.float32)
    det = batched_nms(boxes, scores, num_classes=1, conf_threshold=0.3,
                      max_det=16, pre_topk=64, suppression="fixpoint")
    assert int(det.valid.sum()) == 0
    assert int((det.classes == -1).sum()) == 2 * 16


def test_unknown_suppression_rejected():
    boxes = jnp.zeros((1, 8, 4), jnp.float32)
    scores = jnp.zeros((1, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="unknown nms suppression"):
        batched_nms(boxes, scores, num_classes=1, conf_threshold=0.3,
                    max_det=4, pre_topk=8, suppression="fixpont")


# --- box voting (ops/nms.box_voting, extra.box_voting knob) ---------------


def _voting_oracle(det, cand_boxes, cand_scores, cand_cls, vote_iou, conf,
                   class_aware):
    """Numpy reference: score-weighted mean of IoU>=gate same-class
    candidates above conf, per kept box."""
    from aerial_image_recognition_tpu.ops.metrics import iou_xywh
    out = np.array(det.boxes, np.float64)
    for b in range(out.shape[0]):
        for d in range(out.shape[1]):
            if not det.valid[b, d]:
                continue
            ious = iou_xywh(np.asarray(det.boxes[b, d])[None],
                            np.asarray(cand_boxes[b]))[0]
            m = (ious >= vote_iou) & (np.asarray(cand_scores[b]) >= conf)
            if class_aware:
                m &= np.asarray(cand_cls[b]) == int(det.classes[b, d])
            w = np.where(m, np.asarray(cand_scores[b], np.float64), 0.0)
            if w.sum() > 0:
                out[b, d] = (w[:, None]
                             * np.asarray(cand_boxes[b], np.float64)
                             ).sum(0) / w.sum()
    return out.astype(np.float32)


@pytest.mark.parametrize("nc", [1, 3])
def test_box_voting_matches_numpy_oracle(rng, nc):
    boxes, scores = _random_problem(rng, nc=nc)
    kw = dict(num_classes=nc, conf_threshold=0.3, iou_threshold=0.45,
              max_det=64, pre_topk=256, class_aware=True, use_pallas=False)
    plain = batched_nms(boxes, scores, **kw)
    voted = batched_nms(boxes, scores, vote_iou=0.5, **kw)
    # scores/classes/valid pass through untouched
    np.testing.assert_array_equal(np.asarray(voted.valid),
                                  np.asarray(plain.valid))
    np.testing.assert_allclose(np.asarray(voted.scores),
                               np.asarray(plain.scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(voted.classes),
                                  np.asarray(plain.classes))
    # boxes match the oracle built from the same preselection
    import jax
    best = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    ts, idx = jax.lax.top_k(best, 256)
    tb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    tc = jnp.take_along_axis(cls, idx, axis=1)
    want = _voting_oracle(plain, tb, ts, tc, 0.5, 0.3,
                          class_aware=nc > 1)
    got = np.asarray(voted.boxes)
    v = np.asarray(voted.valid)
    np.testing.assert_allclose(got[v], want[v], rtol=1e-4, atol=1e-3)
    # and at least one box actually moved (duplicate-heavy problem)
    assert np.abs(got[v] - np.asarray(plain.boxes)[v]).max() > 1e-3


def test_box_voting_isolated_box_unmoved(rng):
    # one isolated high-score box: voting average contains only itself
    boxes = jnp.asarray([[[100.0, 100.0, 20.0, 10.0]]
                         + [[500.0 + 40 * k, 500.0, 8.0, 8.0]
                            for k in range(7)]], jnp.float32)
    scores = jnp.asarray(
        np.concatenate([[0.9], np.full(7, 0.01)])[None, :, None],
        jnp.float32)
    kw = dict(num_classes=1, conf_threshold=0.3, max_det=8, pre_topk=8,
              use_pallas=False)
    plain = batched_nms(boxes, scores, **kw)
    voted = batched_nms(boxes, scores, vote_iou=0.5, **kw)
    np.testing.assert_allclose(np.asarray(voted.boxes),
                               np.asarray(plain.boxes), atol=1e-5)


def test_box_voting_merges_toward_weighted_mean():
    # two same-class candidates overlapping heavily: NMS keeps the 0.6,
    # voting pulls it toward the score-weighted mean of both
    boxes = jnp.asarray([[[100.0, 100.0, 20.0, 20.0],
                          [104.0, 100.0, 20.0, 20.0]]], jnp.float32)
    scores = jnp.asarray([[[0.6], [0.4]]], jnp.float32)
    kw = dict(num_classes=1, conf_threshold=0.3, iou_threshold=0.45,
              max_det=4, pre_topk=2, use_pallas=False)
    plain = batched_nms(boxes, scores, **kw)
    voted = batched_nms(boxes, scores, vote_iou=0.5, **kw)
    assert int(plain.valid.sum()) == 1          # the pair was suppressed
    want_cx = (0.6 * 100.0 + 0.4 * 104.0) / 1.0
    got = np.asarray(voted.boxes)[0, 0]
    np.testing.assert_allclose(got, [want_cx, 100.0, 20.0, 20.0],
                               rtol=1e-5)
