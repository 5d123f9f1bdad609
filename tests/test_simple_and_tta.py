"""SimpleDetector facade + TTA variation stack tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
from aerial_image_recognition_tpu.gio.geojson import write_geojson, read_geojson
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.ops.augment import (
    DEFAULT_VARIATIONS, apply_variation, expand_tta, merge_tta_scores,
)
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn,
)
from aerial_image_recognition_tpu.pipeline.simple import SimpleDetector
from aerial_image_recognition_tpu.runtime.config import DetectorConfig


@pytest.fixture(scope="module")
def server():
    srv = FakeTileServer(FakeWorld(center_lon=21.0, center_lat=52.2,
                                   extent_deg=0.003, n_cars=20, seed=3))
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def tiny_step():
    cfg = DetectorConfig(confidence_threshold=0.3)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    return DetectStep(bundle=bundle, fn=fn, batch=8, input_size=96,
                      model_size=64)


def test_simple_detector_run(tmp_path, server, tiny_step, monkeypatch):
    monkeypatch.setattr(XYZFetcher, "window_px",
                        lambda self, lat, m=None: 96)
    aoi = {"type": "FeatureCollection", "features": [{
        "type": "Feature", "properties": {},
        "geometry": {"type": "Polygon", "coordinates": [[
            [20.9988, 52.1988], [21.0012, 52.1988], [21.0012, 52.2012],
            [20.9988, 52.2012], [20.9988, 52.1988]]]}}]}
    frame = str(tmp_path / "aoi.geojson")
    write_geojson(aoi, frame)

    det = SimpleDetector("yolov7_itcvd", str(tmp_path / "out"),
                         xyz_url=server.xyz_template, zoom=17,
                         detect_step=tiny_step, num_workers=8,
                         fetcher=XYZFetcher(server.xyz_template, zoom=17,
                                            num_workers=8, subdomains=("",)))
    out = det.run(frame, spacing_meters=60.0, batch_size=8,
                  force_restart=True)
    assert out["points"] >= 9
    assert os.path.exists(out["output"])
    doc = read_geojson(out["output"])
    assert doc["metadata"]["grid_points"] == out["points"]
    det.close()


def test_simple_get_image_contract(server, tiny_step, monkeypatch):
    monkeypatch.setattr(XYZFetcher, "window_px",
                        lambda self, lat, m=None: 96)
    det = SimpleDetector("yolov7_itcvd", "/tmp/simple_out",
                         detect_step=tiny_step,
                         fetcher=XYZFetcher(server.xyz_template, zoom=17,
                                            num_workers=8, subdomains=("",)))
    img, preview, bounds = det.get_image(52.2, 21.0)
    assert img.dtype == np.uint8
    assert set(bounds) == {"west", "south", "east", "north"}
    assert preview["spatial_info"]["center"]["lat"] == 52.2
    assert preview["image_info"]["crop_size"] == img.shape[0]
    det.close()


# ----------------------------------------------------------------- TTA

def test_variations_shapes_and_ranges():
    x = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    for name, _ in DEFAULT_VARIATIONS:
        y = apply_variation(x, name)
        assert y.shape == x.shape
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0 + 1e-6


def test_brightness_monotone():
    x = jnp.full((1, 8, 8, 3), 0.5)
    y = apply_variation(x, "brightness_1.4")
    assert float(y.mean()) == pytest.approx(0.7, abs=1e-6)


def test_expand_and_merge():
    b = 3
    x = jnp.ones((b, 16, 16, 3)) * 0.4
    xv, w = expand_tta(x)
    v = len(DEFAULT_VARIATIONS)
    assert xv.shape == (b * v, 16, 16, 3)
    assert w.shape == (v,)
    # variation-major: first block is the originals
    np.testing.assert_allclose(np.asarray(xv[:b]), np.asarray(x))

    scores = jnp.ones((b * v, 10, 1)) * 0.5
    merged = merge_tta_scores(scores, w, b)
    assert merged.shape == (b, 10, 1)
    # max over weighted identical scores = max weight (1.0) * 0.5
    assert float(merged[0, 0, 0]) == pytest.approx(0.5)


def test_tta_detect_fn_compiles():
    cfg = DetectorConfig(confidence_threshold=0.3)
    cfg.extra["tta"] = True
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    imgs = jnp.zeros((2, 64, 64, 3), dtype=jnp.uint8)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (2, 1))
    det, lon, lat = fn(bundle.params, imgs, bounds)
    assert det.boxes.shape[0] == 2
