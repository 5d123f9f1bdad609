"""City-scale full-scan artifact: ≥25k tiles through the REAL pipeline.

VERDICT r3 item 7: the step-level bench and the 10k-tile CPU soak both
exist; this runs ONE full CarDetector scan (fake server → fetch plane →
H2D → fused TPU step → georef → periodic dedup+checkpoint → GeoJSON) at
the 640-px production geometry on the actual chip, recording the phase
breakdown (fetch / H2D / compute / dedup / checkpoint) and the JSONL event
log, so the "compute-bound at ~3.5k t/s off the tunnel" claim rests on a
full-scan artifact rather than a batch-loop extrapolation.

Reference workflow being mirrored: simple_detector.py:705-930 (grid →
batches → detect → periodic checkpoint+dedup → final dedup → GeoJSON).

Caveat recorded with the numbers: the hermetic fake server renders and
JPEG-encodes 640-px tiles in-process (~100 ms/tile single-thread), so the
WALL clock of this scan is fetch-bound by the fake server itself — the
honest compute/H2D rates come from run_pipeline's per-batch stats, which
time the device dispatch→readback and the device_put separately.

Usage (on the TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python examples/city_scale_scan.py \
        [--tiles 25600] [--out /tmp/city_scale]
"""

import argparse
import json
import math
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=25600,
                    help="minimum tile count for the generated AOI")
    ap.add_argument("--out", default="/tmp/city_scale")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tile-m", type=float, default=64.0)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--workers", type=int, default=24)
    ap.add_argument("--params", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "yolov7_tiny_fakeworld.npz"),
        help="trained checkpoint (.npz); the fakeworld fixture's 0.1 m/px "
             "GSD matches the 640 px / 64 m production geometry")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np

    from aerial_image_recognition_tpu.fetch.fake import (FakeTileServer,
                                                         FakeWorld)
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    from aerial_image_recognition_tpu.gio.geojson import write_geojson
    from aerial_image_recognition_tpu.pipeline.detector import CarDetector

    os.makedirs(args.out, exist_ok=True)
    print("devices:", jax.devices())

    # AOI sized to >= args.tiles tiles: grid step = tile_m * (1 - overlap)
    overlap = 0.2
    step_m = args.tile_m * (1 - overlap)
    n_side = math.ceil(math.sqrt(args.tiles))
    half_m = n_side * step_m / 2 + args.tile_m
    lat0, lon0 = 52.2, 21.0
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(lat0)))
    m2lat = 1.0 / 111319.9

    world = FakeWorld(center_lon=lon0, center_lat=lat0,
                      extent_deg=2 * half_m * m2lat, n_cars=20000, seed=11)
    srv = FakeTileServer(world)
    srv.start()

    ring = [[lon0 - half_m * m2lon, lat0 - half_m * m2lat],
            [lon0 + half_m * m2lon, lat0 - half_m * m2lat],
            [lon0 + half_m * m2lon, lat0 + half_m * m2lat],
            [lon0 - half_m * m2lon, lat0 + half_m * m2lat],
            [lon0 - half_m * m2lon, lat0 - half_m * m2lat]]
    frame = os.path.join(args.out, "aoi.geojson")
    write_geojson({"type": "FeatureCollection", "features": [{
        "type": "Feature", "properties": {},
        "geometry": {"type": "Polygon", "coordinates": [ring]}}]}, frame)

    fetcher = WMSFetcher(srv.base_url + "/wms", layer="fake",
                         size=(args.size, args.size),
                         num_workers=args.workers, submit_spacing=0.0)
    det = CarDetector(args.out, {
        "frame_path": frame,
        "params_path": os.path.abspath(args.params),
        "tile_size_meters": args.tile_m,
        "tile_overlap": overlap,
        "confidence_threshold": 0.5,
        "duplicate_distance": 2.0,
        "batch_size": args.batch,
        "device_batch": args.batch,
        "checkpoint_interval": 2000,       # reference cadence
        "event_log": os.path.join(args.out, "events.jsonl"),
        "extra": {"progress": False},
    }, fetcher=fetcher)

    t0 = time.time()
    res = det.detect(force_restart=True)
    wall = time.time() - t0
    fetcher.close()
    srv.stop()

    timings = res["timings"]
    summary = {
        "tiles": res["tiles"],
        "detections": res["detections"],
        "wall_s": round(wall, 1),
        "phase_timings_s": {k: round(v, 2) for k, v in timings.items()},
        "event_log": os.path.join(args.out, "events.jsonl"),
        "output": res["output"],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
