"""Differential architecture test: vendored upstream specs vs the flax models.

The in-environment substitute for real-weight parity goldens (the blobs are
DNS-blocked — STATUS.md): models/upstream_spec.py vendors the upstream yaml
layer tables as DATA and executes them with an independent torch
interpreter; here we generate random upstream-named state dicts, import
them through models/import_torch's hand-typed mapping into the flax
models, and assert the raw detect maps agree. Any silent transcription
divergence — wrong concat order, wrong from-index, wrong padding, wrong BN
epsilon, a wrong weight-mapping entry — shows up as a numeric mismatch.
This is the test that would have auto-caught the round-1 SPPCSPCTiny bug
(models/yolov7.py:126-149) and the round-3 stride-2 SAME-vs-torch padding
bug it did catch on first run.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aerial_image_recognition_tpu.models.upstream_spec import (
    YOLOV7_BASE_SPEC, YOLOV7_TINY_SPEC, make_state_dict, run_spec_torch,
    yolov8_spec)
from aerial_image_recognition_tpu.models.import_torch import (
    import_torch_state, yolov7_base_mapping, yolov7_detect_from_torch,
    yolov7_tiny_mapping, yolov8_mapping)
from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
from aerial_image_recognition_tpu.models.yolov8 import YOLOv8


def _rel_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6))


def _assert_levels_match(flax_outs, torch_outs, tol: float):
    assert len(flax_outs) == len(torch_outs)
    for lvl, (f, t) in enumerate(zip(flax_outs, torch_outs)):
        f = np.asarray(f)                       # NHWC
        t = np.transpose(t, (0, 2, 3, 1))       # NCHW → NHWC
        assert f.shape == t.shape, (lvl, f.shape, t.shape)
        err = _rel_err(f, t)
        assert err < tol, f"level {lvl}: rel err {err:.2e} ≥ {tol}"


@pytest.mark.parametrize("variant,spec,detect_idx,mapping_fn", [
    ("tiny", YOLOV7_TINY_SPEC, 77, yolov7_tiny_mapping),
    ("base", YOLOV7_BASE_SPEC, 105, yolov7_base_mapping),
])
def test_yolov7_differential(variant, spec, detect_idx, mapping_fn):
    nc = 1
    sd = make_state_dict(spec, nc=nc, seed=7)
    x = np.random.default_rng(1).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)

    torch_outs = run_spec_torch(spec, sd, x, nc=nc,
                                family=f"yolov7_{variant}")

    variables = import_torch_state(sd, mapping_fn())
    variables = yolov7_detect_from_torch(sd, variables,
                                         detect_idx=detect_idx)
    model = YOLOv7(num_classes=nc, variant=variant, dtype=jnp.float32)
    flax_outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            train=False)
    _assert_levels_match(flax_outs, torch_outs, tol=2e-4)


@pytest.mark.parametrize("scale", ["n", "m"])
def test_yolov8_differential(scale):
    # n: width 0.25 / ratio 2.0, depth 1; m: width 0.75 / ratio 1.5,
    # depth 2-4 — together they exercise every channel/depth resolution rule
    nc = 2
    spec = yolov8_spec(scale)
    sd = make_state_dict(spec, nc=nc, seed=11)
    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 64, 64)).astype(
        np.float32)

    torch_outs = run_spec_torch(spec, sd, x, nc=nc, family="yolov8")

    # deliberately re-derived by hand (NOT import_torch.yolov8_n_c2f):
    # the differential test must not share the depth table with the code
    # under test, or a wrong table would validate itself
    d = {"n": 1 / 3, "s": 1 / 3, "m": 2 / 3, "l": 1.0, "x": 1.0}[scale]
    n3, n6 = max(1, round(3 * d)), max(1, round(6 * d))
    n_c2f = {"c2f1": n3, "c2f2": n6, "c2f3": n6, "c2f4": n3,
             "fpn4": n3, "fpn3": n3, "pan4": n3, "pan5": n3}
    variables = import_torch_state(sd, yolov8_mapping(n_c2f))
    model = YOLOv8(num_classes=nc, scale=scale, dtype=jnp.float32)
    flax_outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            train=False)
    _assert_levels_match(flax_outs, torch_outs, tol=2e-4)


def test_yolov7_decode_differential():
    """ops.decode.decode_yolov7 vs an independent transcription of the
    upstream (I)Detect inference decode: y = σ(x); xy = (2y−0.5+grid)·s;
    wh = (2y)²·anchor — the math the reference's ONNX graph bakes in
    before its [1,N,5+nc] output (SURVEY §3.3)."""
    import torch

    from aerial_image_recognition_tpu.models.yolov7 import ANCHORS_TINY
    from aerial_image_recognition_tpu.ops.decode import decode_yolov7

    nc = 3          # multi-class so the obj·cls score path is exercised
    rng = np.random.default_rng(5)
    outs = []
    for s, (h, w) in zip((8, 16, 32), ((8, 8), (4, 4), (2, 2))):
        outs.append(rng.normal(0, 2, (2, h, w, 3 * (5 + nc))).astype(
            np.float32))

    boxes, scores = decode_yolov7([jnp.asarray(o) for o in outs],
                                  ANCHORS_TINY, nc)

    ref_boxes, ref_scores = [], []
    with torch.no_grad():
        for o, anc, s in zip(outs, ANCHORS_TINY, (8, 16, 32)):
            b, h, w, _ = o.shape
            y = torch.sigmoid(torch.from_numpy(o).reshape(
                b, h, w, 3, 5 + nc))
            gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            grid = torch.stack([gx, gy], -1).float()[None, :, :, None, :]
            a = torch.tensor(anc, dtype=torch.float32)[
                None, None, None, :, :]
            xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * s
            wh = (y[..., 2:4] * 2.0) ** 2 * a
            ref_boxes.append(torch.cat([xy, wh], -1).reshape(b, -1, 4))
            ref_scores.append((y[..., 4:5] * y[..., 5:]).reshape(b, -1, nc))
    rb = np.concatenate([t.numpy() for t in ref_boxes], 1)
    rs = np.concatenate([t.numpy() for t in ref_scores], 1)
    np.testing.assert_allclose(np.asarray(boxes), rb, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), rs, rtol=1e-5, atol=1e-6)


def test_yolov8_decode_differential():
    """ops.decode.decode_yolov8 vs an independent transcription of the
    ultralytics DFL decode (softmax-expectation over reg_max bins →
    dist2bbox from cell centers, σ(cls) scores)."""
    import torch
    import torch.nn.functional as F

    from aerial_image_recognition_tpu.ops.decode import decode_yolov8

    nc, reg_max = 2, 16
    rng = np.random.default_rng(6)
    outs = []
    for h, w in ((8, 8), (4, 4), (2, 2)):
        outs.append(rng.normal(0, 2, (2, h, w, 4 * reg_max + nc)).astype(
            np.float32))

    boxes, scores = decode_yolov8([jnp.asarray(o) for o in outs], nc)

    rb_all, rs_all = [], []
    with torch.no_grad():
        for o, s in zip(outs, (8, 16, 32)):
            b, h, w, _ = o.shape
            t = torch.from_numpy(o)
            dist = F.softmax(t[..., :4 * reg_max].reshape(
                b, h, w, 4, reg_max), dim=-1) @ torch.arange(
                    reg_max, dtype=torch.float32)
            gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            cx = gx.float()[None] + 0.5
            cy = gy.float()[None] + 0.5
            x1 = cx - dist[..., 0]
            y1 = cy - dist[..., 1]
            x2 = cx + dist[..., 2]
            y2 = cy + dist[..., 3]
            bx = torch.stack([(x1 + x2) / 2, (y1 + y2) / 2,
                              x2 - x1, y2 - y1], -1) * s
            rb_all.append(bx.reshape(b, -1, 4).numpy())
            rs_all.append(torch.sigmoid(
                t[..., 4 * reg_max:]).reshape(b, -1, nc).numpy())
    np.testing.assert_allclose(np.asarray(boxes),
                               np.concatenate(rb_all, 1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores),
                               np.concatenate(rs_all, 1),
                               rtol=1e-5, atol=1e-6)


def test_v8_spec_channels_match_flax_shapes():
    """The spec's independent channel arithmetic (ultralytics
    make_divisible/min(max_channels)) must agree with models/yolov8._r for
    every scale — otherwise imported real weights would shape-mismatch."""
    from aerial_image_recognition_tpu.models.upstream_spec import (
        V8_SCALES, _mdiv8)
    from aerial_image_recognition_tpu.models.yolov8 import SCALES, _r
    for sc, (d, w, maxc) in V8_SCALES.items():
        _, w2, r2 = SCALES[sc]
        for base in (64, 128, 256, 512, 1024):
            spec_c = _mdiv8(min(base, maxc) * w)
            ours = _r(512 * r2 if base == 1024 else base, w2)
            assert spec_c == ours, (sc, base, spec_c, ours)


# ---------------------------------------------------------------------------
# end2end export-wrapper differential (VERDICT r3 item 1): the reference
# consumes an exported graph with decode+NMS baked in (simple_detector.py:
# 479-504, SURVEY §3.3). upstream_spec.end2end_torch is an independent
# transcription of that wrapper (torch decode + sequential numpy greedy NMS);
# here the repo's FULL head→final-detections path (flax forward → ops.decode
# → ops.nms.batched_nms) must reproduce its detection set on random
# upstream-named weights — so a dropped-in real blob passes IoU≥0.99 on the
# first try.

def _boxes_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise IoU of paired cxcywh boxes: [N,4] × [N,4] → [N]."""
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix = np.maximum(0.0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    iy = np.maximum(0.0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    inter = ix * iy
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / np.maximum(union, 1e-9)


def _assert_detection_sets_match(dets, ref_rows, *, conf, min_iou=0.99):
    """dets: ops.nms.Detections for one image; ref_rows: [N,6] from
    end2end_torch. Detections within 2e-3 of the confidence threshold are
    excluded from the count check on BOTH sides (the two conv stacks agree
    to ~2e-4 rel, so scores straddling the threshold may legitimately flip)
    — every kept pair must still match in box (IoU≥0.99), score and class."""
    margin = 2e-3
    v = np.asarray(dets.valid)
    ours = np.concatenate([
        np.asarray(dets.boxes)[v],
        np.asarray(dets.scores)[v][:, None],
        np.asarray(dets.classes)[v][:, None].astype(np.float32)], axis=1)
    ours = ours[np.argsort(-ours[:, 4], kind="stable")]
    ours_solid = ours[ours[:, 4] >= conf + margin]
    ref_solid = ref_rows[ref_rows[:, 4] >= conf + margin]
    assert len(ours_solid) == len(ref_solid), (
        len(ours_solid), len(ref_solid))
    if len(ref_solid) == 0:
        return
    iou = _boxes_iou(ours_solid[:, :4], ref_solid[:, :4])
    assert float(iou.min()) >= min_iou, float(iou.min())
    np.testing.assert_allclose(ours_solid[:, 4], ref_solid[:, 4], atol=2e-3)
    np.testing.assert_array_equal(ours_solid[:, 5], ref_solid[:, 5])


@pytest.mark.parametrize("suppression", ["scan", "fixpoint"])
@pytest.mark.parametrize("variant,spec,detect_idx,mapping_fn,nc", [
    # nc=1 is the real deepness ITCVD blob's config (conf = objectness alone);
    # nc=3 exercises the obj·cls composition + class-aware NMS on v7
    ("tiny", YOLOV7_TINY_SPEC, 77, yolov7_tiny_mapping, 1),
    ("tiny", YOLOV7_TINY_SPEC, 77, yolov7_tiny_mapping, 3),
    ("base", YOLOV7_BASE_SPEC, 105, yolov7_base_mapping, 1),
])
def test_yolov7_end2end_differential(variant, spec, detect_idx, mapping_fn,
                                     nc, suppression):
    from aerial_image_recognition_tpu.models.upstream_spec import (
        end2end_torch)
    from aerial_image_recognition_tpu.models.yolov7 import (
        ANCHORS_BASE, ANCHORS_TINY)
    from aerial_image_recognition_tpu.ops.decode import decode_yolov7
    from aerial_image_recognition_tpu.ops.nms import batched_nms

    conf, iou_t, max_det = 0.3, 0.45, 64
    sd = make_state_dict(spec, nc=nc, seed=13)
    x = np.random.default_rng(3).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)

    raw = run_spec_torch(spec, sd, x, nc=nc, family=f"yolov7_{variant}")
    ref = end2end_torch(raw, nc=nc, family=f"yolov7_{variant}",
                        conf_threshold=conf, iou_threshold=iou_t,
                        max_det=max_det)

    variables = import_torch_state(sd, mapping_fn())
    variables = yolov7_detect_from_torch(sd, variables,
                                         detect_idx=detect_idx)
    model = YOLOv7(num_classes=nc, variant=variant, dtype=jnp.float32)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    anchors = ANCHORS_TINY if variant == "tiny" else ANCHORS_BASE
    boxes, scores = decode_yolov7(outs, anchors, nc)
    dets = batched_nms(boxes, scores, num_classes=nc, conf_threshold=conf,
                       iou_threshold=iou_t, max_det=max_det, pre_topk=512,
                       use_pallas=False, suppression=suppression)
    for b in range(x.shape[0]):
        one = type(dets)(*(np.asarray(f)[b] for f in dets))
        _assert_detection_sets_match(one, ref[b], conf=conf)


@pytest.mark.parametrize("suppression", ["scan", "fixpoint"])
def test_yolov8_end2end_differential(suppression):
    from aerial_image_recognition_tpu.models.upstream_spec import (
        end2end_torch)
    from aerial_image_recognition_tpu.ops.decode import decode_yolov8
    from aerial_image_recognition_tpu.ops.nms import batched_nms

    nc, conf, iou_t, max_det = 2, 0.3, 0.45, 64
    spec = yolov8_spec("n")
    sd = make_state_dict(spec, nc=nc, seed=17)
    x = np.random.default_rng(4).uniform(0, 1, (2, 3, 64, 64)).astype(
        np.float32)

    raw = run_spec_torch(spec, sd, x, nc=nc, family="yolov8")
    ref = end2end_torch(raw, nc=nc, family="yolov8", conf_threshold=conf,
                        iou_threshold=iou_t, max_det=max_det)

    d = 1 / 3
    n3, n6 = max(1, round(3 * d)), max(1, round(6 * d))
    n_c2f = {"c2f1": n3, "c2f2": n6, "c2f3": n6, "c2f4": n3,
             "fpn4": n3, "fpn3": n3, "pan4": n3, "pan5": n3}
    variables = import_torch_state(sd, yolov8_mapping(n_c2f))
    model = YOLOv8(num_classes=nc, scale="n", dtype=jnp.float32)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    boxes, scores = decode_yolov8(outs, nc)
    dets = batched_nms(boxes, scores, num_classes=nc, conf_threshold=conf,
                       iou_threshold=iou_t, max_det=max_det, pre_topk=512,
                       use_pallas=False, suppression=suppression)
    for b in range(x.shape[0]):
        one = type(dets)(*(np.asarray(f)[b] for f in dets))
        _assert_detection_sets_match(one, ref[b], conf=conf)
