"""Segmentation serving plane: POST /segment with dynamic batching.

The reference ships the XUnet-256 building-segmentation model as an
artifact only (ramp_XUnet_256.onnx — SURVEY §1; never wired to any code in
the snapshot). Here it gets a first-class serving surface: the trained
fake-world fixture must serve masks through the HTTP plane at the same
quality the offline path demonstrates (tests/test_segmentation_quality.py),
coalesce concurrent requests into batches, resize arbitrary input sizes
(reference resize-anything contract, _script/gpu_handler.py:74-76) and
return masks at the request's own resolution.
"""

import base64
import concurrent.futures as cf
import io
import math
import os

import numpy as np
import pytest
import requests
from PIL import Image

from aerial_image_recognition_tpu.fetch.fake import FakeWorld
from aerial_image_recognition_tpu.pipeline.serve import DetectionServer

SEG_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "xunet_fakeworld.npz")
DET_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                           "yolov7_tiny_fakeworld.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(SEG_FIXTURE),
                                reason="trained xunet fixture not present")

# Must match examples/train_xunet_fakeworld.py's world
WORLD = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                  n_cars=150, n_buildings=120, seed=4)
TILE_M = 64.0
SIZE = 256


def _tiny_detect_step():
    """Small detect plane so the server builds fast on CPU (the segment
    plane is what's under test)."""
    import jax
    import jax.numpy as jnp

    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.pipeline.inference import (
        DetectStep, make_detect_fn)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    cfg = DetectorConfig(confidence_threshold=0.4, dtype="float32")
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    if os.path.exists(DET_FIXTURE):
        bundle.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), load_params(DET_FIXTURE))
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=96))
    return DetectStep(bundle=bundle, fn=fn, batch=4, input_size=96,
                      model_size=96)


@pytest.fixture(scope="module")
def server():
    srv = DetectionServer(detect_step=_tiny_detect_step(),
                          segment_params=SEG_FIXTURE, segment_batch=8,
                          max_wait_ms=30.0).start(warmup=False)
    yield srv
    srv.stop()


_BBOXES = None


def _candidate_bboxes():
    """Held-out tile bboxes (seed the training run never used) that
    actually contain buildings (≥3% ground-truth coverage) — random tiles
    can land on empty ground, where mask IoU is undefined. Memoized and
    computed lazily: 32 mask renders at pytest COLLECTION time would tax
    every suite run even when this module is skipped or deselected."""
    global _BBOXES
    if _BBOXES is not None:
        return _BBOXES
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from train_xunet_fakeworld import build_tiles
    out = []
    for bbox in build_tiles(WORLD, 32, size=SIZE, tile_m=TILE_M, seed=321):
        if WORLD.render_mask(bbox, SIZE, SIZE).mean() >= 0.03:
            out.append(bbox)
    assert len(out) >= 8, "fake world unexpectedly sparse"
    _BBOXES = out
    return out


def _tile(k, size=SIZE):
    bboxes = _candidate_bboxes()
    bbox = bboxes[k % len(bboxes)]
    img = WORLD.render(bbox, size, size)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    return buf.getvalue(), bbox


def _decode_mask(payload):
    raw = base64.b64decode(payload["mask_png"])
    m = np.asarray(Image.open(io.BytesIO(raw)))
    return m > 127


def test_segment_mask_quality(server):
    h = requests.get(server.url + "/healthz", timeout=10).json()
    assert h["segment"] is True
    body, bbox = _tile(0)
    r = requests.post(server.url + "/segment", data=body, timeout=120)
    assert r.status_code == 200, r.text
    payload = r.json()
    assert payload["shape"] == [SIZE, SIZE]
    mask = _decode_mask(payload)
    truth = WORLD.render_mask(bbox, SIZE, SIZE).astype(bool)
    inter = (mask & truth).sum()
    union = (mask | truth).sum()
    assert union > 0
    iou = inter / union
    assert iou >= 0.8, f"served mask IoU {iou:.3f}"
    assert abs(payload["coverage"] - mask.mean()) < 1e-6


def test_segment_resizes_and_returns_request_resolution(server):
    # a 320-px request must be resized to the model size on ingest and
    # the mask returned at 320 px
    body, bbox = _tile(1)
    img = np.asarray(Image.open(io.BytesIO(body)))
    big = np.asarray(Image.fromarray(img).resize((320, 320), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(big).save(buf, "JPEG", quality=95)
    r = requests.post(server.url + "/segment",
                      params={"polygons": "1"}, data=buf.getvalue(),
                      timeout=120)
    assert r.status_code == 200, r.text
    payload = r.json()
    assert payload["shape"] == [320, 320]
    mask = _decode_mask(payload)
    assert mask.shape == (320, 320)
    truth = WORLD.render_mask(bbox, 320, 320).astype(bool)
    iou = (mask & truth).sum() / max((mask | truth).sum(), 1)
    assert iou >= 0.7, f"resized-path IoU {iou:.3f}"
    # polygons: boundary rings in request-resolution pixel coords
    assert payload["polygons"], "no polygons returned for a tile with buildings"
    for ring in payload["polygons"]:
        arr = np.asarray(ring)
        assert arr.ndim == 2 and arr.shape[1] == 2
        assert arr.min() >= -1 and arr.max() <= 320
    stats = requests.get(server.url + "/stats", timeout=10).json()
    assert stats["resized"] >= 1


def test_segment_coalesces_concurrent_requests(server):
    before = requests.get(server.url + "/stats", timeout=10).json()

    def one(k):
        body, _ = _tile(k)
        return requests.post(server.url + "/segment", data=body,
                             timeout=120)

    with cf.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(one, range(8)))
    for r in results:
        assert r.status_code == 200, r.text
    after = requests.get(server.url + "/stats", timeout=10).json()
    assert after["segment_requests"] - before["segment_requests"] == 8
    # 8 concurrent requests must not take 8 batches; the per-plane counter
    # is immune to concurrent detect-plane traffic
    seg_before = before["planes"]["segment"]["batches"]
    seg_after = after["planes"]["segment"]["batches"]
    assert seg_after - seg_before <= 6


def test_segment_404_when_not_enabled():
    srv = DetectionServer(detect_step=_tiny_detect_step(),
                          max_wait_ms=5.0).start(warmup=False)
    try:
        r = requests.post(srv.url + "/segment", data=b"x", timeout=10)
        assert r.status_code == 404
    finally:
        srv.stop()


def test_detect_plane_still_serves_alongside_segment(server):
    """Both planes on one server: a detect request answered while the
    segment plane exists (threads and queues are independent)."""
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    lon, lat = WORLD.center_lon, WORLD.center_lat
    bbox = (lon - 4.8 * m2lon, lat - 4.8 * m2lat,
            lon + 4.8 * m2lon, lat + 4.8 * m2lat)
    img = WORLD.render(bbox, 96, 96)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    r = requests.post(server.url + "/detect",
                      params={"west": bbox[0], "south": bbox[1],
                              "east": bbox[2], "north": bbox[3]},
                      data=buf.getvalue(), timeout=120)
    assert r.status_code == 200, r.text
    assert "detections" in r.json()
