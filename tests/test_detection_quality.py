"""Detection-quality integration test with a REAL (trained) detector.

Uses the committed fake-world YOLOv7-tiny weights (trained in-framework on
TPU to mAP50=0.96 — see STATUS.md) to run the full CarDetector pipeline
over the synthetic city and verify what no shape test can: detections land
within meters of the true car positions after fetch → mosaic → batched
inference → NMS → georeferencing → cross-tile dedup.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
from aerial_image_recognition_tpu.gio.geojson import write_geojson, read_geojson
from aerial_image_recognition_tpu.models.registry import create_model, load_params
from aerial_image_recognition_tpu.pipeline.detector import CarDetector
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn,
)
from aerial_image_recognition_tpu.runtime.config import DetectorConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov7_tiny_fakeworld.npz")

# Must match the training world (tools in STATUS.md / /tmp/learn_tpu.py)
WORLD = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                  n_cars=400, seed=4)
M2LON = 1.0 / (111319.9 * np.cos(np.radians(52.2)))
M2LAT = 1.0 / 111319.9


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="trained fixture not present")
def test_city_scan_finds_real_cars(tmp_path):
    srv = FakeTileServer(WORLD)
    srv.start()
    try:
        cfg = DetectorConfig(confidence_threshold=0.4,
                             nms_iou_threshold=0.45,
                             duplicate_distance=2.0)
        bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
        bundle.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), load_params(FIXTURE))
        fn = jax.jit(make_detect_fn(bundle, cfg, model_size=96))
        step = DetectStep(bundle=bundle, fn=fn, batch=16, input_size=96,
                          model_size=96)

        # ~190 × 130 m AOI in the middle of the world
        half_lon = 95 * M2LON
        half_lat = 65 * M2LAT
        aoi_ring = [[21.0 - half_lon, 52.2 - half_lat],
                    [21.0 + half_lon, 52.2 - half_lat],
                    [21.0 + half_lon, 52.2 + half_lat],
                    [21.0 - half_lon, 52.2 + half_lat],
                    [21.0 - half_lon, 52.2 - half_lat]]
        frame = str(tmp_path / "aoi.geojson")
        write_geojson({"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon",
                         "coordinates": [aoi_ring]}}]}, frame)

        # WMS at 96 px / 48 m = the exact 0.5 m/px the detector was
        # trained at (the fake server renders any bbox at any size)
        fetcher = WMSFetcher(srv.base_url + "/wms", layer="fake",
                             size=(96, 96), num_workers=8,
                             submit_spacing=0.0)
        det = CarDetector(str(tmp_path), {
            "frame_path": frame,
            "tile_size_meters": 48.0,
            "tile_overlap": 0.25,
            "confidence_threshold": 0.4,
            "duplicate_distance": 2.0,
            "batch_size": 32, "device_batch": 16,
            "checkpoint_interval": 10**9,
        }, fetcher=fetcher, detect_step=step)
        out = det.detect(force_restart=True)
        fetcher.close()

        doc = read_geojson(os.path.join(str(tmp_path), "output",
                                        "detections_results.geojson"))
        found = np.array([f["geometry"]["coordinates"]
                          for f in doc["features"]], dtype=np.float64)
        assert len(found) > 0, "trained detector found nothing"

        # ground truth: cars inside the AOI (with a 5 m interior margin —
        # boundary cars may be clipped by the outermost tiles)
        margin_lon, margin_lat = 5 * M2LON, 5 * M2LAT
        cars = WORLD.cars
        inside = ((np.abs(cars[:, 0] - 21.0) < half_lon - margin_lon)
                  & (np.abs(cars[:, 1] - 52.2) < half_lat - margin_lat))
        true_pos = cars[inside][:, :2]
        assert len(true_pos) >= 5, "test world too sparse — adjust AOI"

        # metric distances between every true car and nearest detection
        def to_m(lonlat):
            return np.stack([(lonlat[:, 0] - 21.0) / M2LON,
                             (lonlat[:, 1] - 52.2) / M2LAT], axis=1)
        t_m = to_m(true_pos)
        f_m = to_m(found)
        d = np.sqrt(((t_m[:, None, :] - f_m[None, :, :]) ** 2).sum(-1))
        nearest = d.min(axis=1)
        recall_3m = float((nearest < 3.0).mean())
        assert recall_3m >= 0.8, f"recall@3m {recall_3m:.2f}, dists {np.round(sorted(nearest)[-5:],1)}"
        # localization: matched detections within ~1.5 m median
        assert float(np.median(nearest[nearest < 3.0])) < 1.5

        # precision: most detections correspond to a true car
        d_found = d.min(axis=0)
        precision_3m = float((d_found < 3.0).mean())
        assert precision_3m >= 0.7, f"precision@3m {precision_3m:.2f}"

        # dedup: no two kept detections within the 2 m radius
        dd = np.sqrt(((f_m[:, None, :] - f_m[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(dd, 1e9)
        assert dd.min() > 2.0 - 1e-6
    finally:
        srv.stop()
