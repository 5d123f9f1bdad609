"""Resolution sweep harness (test_configurations.py parity), hermetic."""

import os

import jax
import jax.numpy as jnp
import pytest

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
from aerial_image_recognition_tpu.gio.geojson import write_geojson
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn,
)
from aerial_image_recognition_tpu.pipeline.sweep import run_sweep
from aerial_image_recognition_tpu.runtime.config import DetectorConfig


def test_sweep_two_resolutions(tmp_path, monkeypatch):
    srv = FakeTileServer(FakeWorld(center_lon=21.0, center_lat=52.2,
                                   extent_deg=0.002, n_cars=8, seed=2))
    srv.start()
    try:
        monkeypatch.setattr(XYZFetcher, "window_px",
                            lambda self, lat, m=None: 96)
        cfg = DetectorConfig(confidence_threshold=0.3)
        bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
        fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
        step = DetectStep(bundle=bundle, fn=fn, batch=4, input_size=96,
                          model_size=64)
        fetcher = XYZFetcher(srv.xyz_template, zoom=17, num_workers=8,
                             subdomains=("",))
        aoi = {"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [[
                [20.999, 52.199], [21.001, 52.199], [21.001, 52.201],
                [20.999, 52.201], [20.999, 52.199]]]}}]}
        frame = str(tmp_path / "aoi.geojson")
        write_geojson(aoi, frame)

        out = run_sweep(str(tmp_path),
                        {"frame_path": frame, "use_xyz": True,
                         "xyz_url": srv.xyz_template,
                         "batch_size": 8, "device_batch": 4,
                         "checkpoint_interval": 10**9},
                        tile_sizes=(100.0, 50.0),
                        fetcher=fetcher, detect_step=step)
        assert len(out) == 2
        assert all("error" not in r for r in out)
        # finer tiles ⇒ more tiles scanned
        assert out[1]["tiles"] > out[0]["tiles"]
        assert out[0]["cm_per_px"] == pytest.approx(15.62, abs=0.01)
        # per-config output prefixes
        assert os.path.exists(os.path.join(
            str(tmp_path), "output", "detections_100m_results.geojson"))
        fetcher.close()
    finally:
        srv.stop()
