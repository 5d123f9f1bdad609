"""Detection serving endpoint: dynamic batching HTTP service."""

import concurrent.futures as cf
import io
import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import requests
from PIL import Image

from aerial_image_recognition_tpu.fetch.fake import FakeWorld
from aerial_image_recognition_tpu.models.registry import create_model, load_params
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn)
from aerial_image_recognition_tpu.pipeline.serve import DetectionServer
from aerial_image_recognition_tpu.runtime.config import DetectorConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov7_tiny_fakeworld.npz")
WORLD = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                  n_cars=400, seed=4)
M2LON = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
M2LAT = 1.0 / 111319.9


def _server():
    cfg = DetectorConfig(confidence_threshold=0.4, dtype="float32")
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(FIXTURE))
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=96))
    step = DetectStep(bundle=bundle, fn=fn, batch=8, input_size=96,
                      model_size=96)
    return DetectionServer(detect_step=step, max_wait_ms=30.0).start()


def _tile_jpeg(k):
    lon, lat, _ = WORLD.cars[k * 7]
    bbox = (lon - 4.8 * M2LON, lat - 4.8 * M2LAT,
            lon + 4.8 * M2LON, lat + 4.8 * M2LAT)
    img = WORLD.render(bbox, 96, 96)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    return buf.getvalue(), bbox, (lon, lat)


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="trained fixture not present")
def test_serve_detects_and_batches():
    srv = _server()
    try:
        h = requests.get(srv.url + "/healthz", timeout=10).json()
        assert h["ok"] and h["input_size"] == 96

        def one(k):
            body, bbox, truth = _tile_jpeg(k)
            r = requests.post(
                srv.url + "/detect",
                params={"west": bbox[0], "south": bbox[1],
                        "east": bbox[2], "north": bbox[3]},
                data=body, timeout=60)
            return r, truth

        # concurrent requests must coalesce into batches
        with cf.ThreadPoolExecutor(8) as pool:
            results = list(pool.map(one, range(8)))
        hits = 0
        for r, (tlon, tlat) in results:
            assert r.status_code == 200, r.text
            dets = r.json()["detections"]
            assert dets, "no detections on a tile centered on a car"
            d_m = min(np.hypot((d["lon"] - tlon) / M2LON,
                               (d["lat"] - tlat) / M2LAT) for d in dets)
            hits += d_m < 2.0
        assert hits >= 6

        stats = requests.get(srv.url + "/stats", timeout=10).json()
        assert stats["requests"] == 8
        assert stats["batches"] < 8, "no batching happened"

        # probes: wrong size, garbage body, missing bounds
        r = requests.post(srv.url + "/detect",
                          params={"west": 0, "south": 0, "east": 1,
                                  "north": 1},
                          data=_small_png(), timeout=10)
        assert r.status_code == 400 and "expected 96x96" in r.text
        r = requests.post(srv.url + "/detect",
                          params={"west": 0, "south": 0, "east": 1,
                                  "north": 1},
                          data=b"not an image", timeout=10)
        assert r.status_code == 400
        r = requests.post(srv.url + "/detect", data=b"", timeout=10)
        assert r.status_code == 400 and "query params" in r.text
        r = requests.get(srv.url + "/nope", timeout=10)
        assert r.status_code == 404
    finally:
        srv.stop()


def _small_png():
    buf = io.BytesIO()
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(buf, "PNG")
    return buf.getvalue()
