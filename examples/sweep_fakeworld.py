"""Run the resolution sweep (test_configurations.py parity) for real on
the TPU chip against the hermetic fake world, with the committed trained
yolov7-tiny weights.

The fixture was trained at 0.5 m/px, so the sweep brackets that ground
resolution: 640-px tiles at 480/320/240 m = 0.75/0.50/0.375 m/px. The
expected signature (reference test_configurations.py behavior) is a
detection-count peak at the trained resolution.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/sweep_fakeworld.py
"""
import json
import math
import os
import tempfile

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
from aerial_image_recognition_tpu.gio.geojson import write_geojson
from aerial_image_recognition_tpu.pipeline.sweep import run_sweep

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "yolov7_tiny_fakeworld.npz")


def main():
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    srv = FakeTileServer(world)
    srv.start()
    base = tempfile.mkdtemp(prefix="sweep_")
    try:
        m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
        m2lat = 1.0 / 111319.9
        half_lon, half_lat = 450 * m2lon, 300 * m2lat
        ring = [[21.0 - half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 - half_lat]]
        frame = os.path.join(base, "aoi.geojson")
        write_geojson({"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [ring]}}]},
            frame)

        fetcher = WMSFetcher(srv.base_url + "/wms", layer="fake",
                             size=(640, 640), num_workers=8,
                             submit_spacing=0.0)
        results = run_sweep(base, {
            "frame_path": frame,
            "params_path": os.path.abspath(FIXTURE),
            "confidence_threshold": 0.4,
            "duplicate_distance": 2.0,
            "tile_overlap": 0.2,
            "batch_size": 64,
            "device_batch": 16,
            "checkpoint_interval": 10**9,
        }, tile_sizes=(480.0, 320.0, 240.0), fetcher=fetcher)
        fetcher.close()
        print(json.dumps(results, indent=1))
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
