"""WMTS-fed city scan through the full orchestrator (fake server)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.wmts import WMTSFetcher
from aerial_image_recognition_tpu.gio.geojson import write_geojson, read_geojson
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.detector import CarDetector
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn,
)
from aerial_image_recognition_tpu.runtime.config import DetectorConfig


def test_wmts_city_scan(tmp_path):
    srv = FakeTileServer(FakeWorld(center_lon=21.0, center_lat=52.2,
                                   extent_deg=0.002, n_cars=10, seed=9))
    srv.start()
    try:
        cfg = DetectorConfig(confidence_threshold=0.3)
        bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
        fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
        step = DetectStep(bundle=bundle, fn=fn, batch=4, input_size=768,
                          model_size=64)

        aoi = {"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [[
                [20.9992, 52.1992], [21.0008, 52.1992], [21.0008, 52.2008],
                [20.9992, 52.2008], [20.9992, 52.1992]]]}}]}
        frame = str(tmp_path / "aoi.geojson")
        write_geojson(aoi, frame)

        fetcher = WMTSFetcher(srv.base_url + "/wmts", layer="fake",
                              matrix_set="FAKE2180", crs=2180,
                              num_workers=8)
        det = CarDetector(str(tmp_path), {
            "frame_path": frame,
            "wmts_url": srv.base_url + "/wmts",
            "wmts_layer": "fake",
            "tile_size_meters": 128.0,
            "batch_size": 8, "device_batch": 4,
            "duplicate_distance": 1.0,
            "checkpoint_interval": 10**9,
        }, fetcher=fetcher, detect_step=step)
        out = det.detect(force_restart=True)
        assert out["tiles"] >= 2
        assert os.path.exists(os.path.join(
            str(tmp_path), "output", "detections_results.geojson"))
        fetcher.close()
    finally:
        srv.stop()
