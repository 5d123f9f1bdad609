"""Hermetic end-to-end city-scan test: fake tile server → CarDetector →
GeoJSON/shapefile outputs, plus checkpoint/resume and dedup semantics."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.gio.geojson import write_geojson, read_geojson
from aerial_image_recognition_tpu.gio.shapefile import read_shapefile
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.detector import CarDetector
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, make_detect_fn,
)
from aerial_image_recognition_tpu.runtime.config import DetectorConfig
from aerial_image_recognition_tpu.post.dedup import dedup_records, dedup_host


WORLD = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.004,
                  n_cars=30, seed=11)
# ~0.004° ≈ 440 m AOI around the fake world center
AOI = {"type": "FeatureCollection", "features": [{
    "type": "Feature", "properties": {},
    "geometry": {"type": "Polygon", "coordinates": [[
        [20.998, 52.198], [21.002, 52.198], [21.002, 52.202],
        [20.998, 52.202], [20.998, 52.198]]]},
}]}


@pytest.fixture(scope="module")
def server():
    srv = FakeTileServer(WORLD)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def tiny_step():
    """Real YOLOv7-tiny graph at 64-px model size (CPU-affordable), batch 8."""
    cfg = DetectorConfig(confidence_threshold=0.3)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    return DetectStep(bundle=bundle, fn=fn, batch=8, input_size=96,
                      model_size=64)


def _detector(tmp_path, server, tiny_step, **cfg):
    base = str(tmp_path)
    frame = os.path.join(base, "aoi.geojson")
    write_geojson(AOI, frame)
    conf = {
        "frame_path": frame,
        "use_xyz": True,
        "xyz_url": server.xyz_template,
        "zoom": 17,
        "tile_size_meters": 64.0,
        "tile_overlap": 0.2,
        "batch_size": 16,
        "device_batch": 8,
        "num_workers": 8,
        "duplicate_distance": 1.0,
        "checkpoint_interval": 10**9,
        "event_log": os.path.join(base, "events.jsonl"),
    }
    conf.update(cfg)
    det = CarDetector(base, conf, detect_step=tiny_step)
    return det, base


def _patch_window(monkeypatch):
    """Pin the XYZ window to the step's 96-px input regardless of zoom."""
    from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
    monkeypatch.setattr(XYZFetcher, "window_px",
                        lambda self, lat, m=None: 96)


def test_full_scan_produces_outputs(tmp_path, server, tiny_step, monkeypatch):
    _patch_window(monkeypatch)
    det, base = _detector(tmp_path, server, tiny_step)
    out = det.detect(force_restart=True)
    assert out["tiles"] > 20
    res_path = os.path.join(base, "output", "detections_results.geojson")
    assert os.path.exists(res_path)
    doc = read_geojson(res_path)
    assert doc["metadata"]["count"] == len(doc["features"])
    assert "phase_timings" in doc["metadata"]
    assert doc["metadata"]["fetch_stats"]["successes"] > 0
    # coverage layer written
    assert os.path.exists(os.path.join(base, "output",
                                       "detections_coverage.geojson"))
    # checkpoint cleared on success
    assert det.config.checkpoint_interval  # sanity
    assert not os.path.exists(os.path.join(
        base, "output", "checkpoints", "detections_processing_state.json"))
    # event log has grid + done events
    kinds = [json.loads(l)["kind"]
             for l in open(os.path.join(base, "events.jsonl"))]
    assert "grid" in kinds and "done" in kinds
    # shapefile emitted if there were detections (random weights may or may
    # not fire above threshold — only check consistency)
    if doc["features"]:
        shp = read_shapefile(os.path.join(base, "output",
                                          "detections_results.shp"))
        assert len(shp) == len(doc["features"])
    # all detections are inside (or within a tile of) the scanned bounds
    for f in doc["features"]:
        lon, lat = f["geometry"]["coordinates"]
        assert 20.997 < lon < 21.003 and 52.197 < lat < 52.203


def test_checkpoint_resume(tmp_path, server, tiny_step, monkeypatch):
    _patch_window(monkeypatch)
    det, base = _detector(tmp_path, server, tiny_step,
                          checkpoint_interval=16)

    # Abort the scan partway: raise after the second batch via a wrapper step
    calls = {"n": 0}
    orig_fn = tiny_step.fn

    class AbortingStep(DetectStep):
        def __call__(self, images, bounds):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("injected crash")
            return orig_fn(self.bundle.params, images, bounds)

    det._detect_step = AbortingStep(
        bundle=tiny_step.bundle, fn=tiny_step.fn, batch=tiny_step.batch,
        input_size=tiny_step.input_size, model_size=tiny_step.model_size)

    with pytest.raises(RuntimeError, match="injected crash"):
        det.detect(force_restart=True)

    state_path = os.path.join(base, "output", "checkpoints",
                              "detections_processing_state.json")
    assert os.path.exists(state_path)
    state = json.load(open(state_path))
    assert 0 < state["processed_count"]

    # Resume completes the scan and clears the checkpoint
    det2, _ = _detector(tmp_path, server, tiny_step,
                        checkpoint_interval=16)
    out = det2.detect(force_restart=False)
    assert out["tiles"] == state["total_tiles"]
    assert not os.path.exists(state_path)


def test_resume_refuses_changed_grid(tmp_path, server, tiny_step, monkeypatch):
    _patch_window(monkeypatch)
    det, base = _detector(tmp_path, server, tiny_step, checkpoint_interval=16)
    from aerial_image_recognition_tpu.runtime.checkpoint import (
        CheckpointManager, CheckpointState)
    ckpt = CheckpointManager(os.path.join(base, "output", "checkpoints"),
                             prefix="detections")
    ckpt.save(CheckpointState(processed_count=5, total_tiles=10,
                              detections=[], grid_fingerprint="bogus"))
    with pytest.raises(RuntimeError, match="grid mismatch"):
        det.detect(force_restart=False)


def test_dedup_semantics_match_reference_rule():
    # two detections 0.5 m apart → lower-confidence one suppressed;
    # third 5 m away survives
    recs = [
        {"lon": 21.0, "lat": 52.2, "confidence": 0.9},
        {"lon": 21.0 + 0.5 / (111319.9 * np.cos(np.radians(52.2))),
         "lat": 52.2, "confidence": 0.8},
        {"lon": 21.0 + 5.0 / (111319.9 * np.cos(np.radians(52.2))),
         "lat": 52.2, "confidence": 0.7},
    ]
    out = dedup_records(recs, radius_m=1.0)
    assert [r["confidence"] for r in out] == [0.9, 0.7]


def test_dedup_host_matches_bruteforce(rng):
    n = 400
    lon = 21.0 + rng.random(n) * 0.001
    lat = 52.2 + rng.random(n) * 0.001
    conf = rng.random(n)
    keep = dedup_host(lon, lat, conf, radius_m=2.0)

    # brute force oracle
    from aerial_image_recognition_tpu.geo import tm_forward, utm_params
    p = utm_params(34)
    x, y = tm_forward(lon, lat, p)
    order = np.argsort(-conf, kind="stable")
    kept_idx = []
    expect = np.zeros(n, bool)
    for i in order:
        if all((x[i]-x[j])**2 + (y[i]-y[j])**2 > 4.0 for j in kept_idx):
            kept_idx.append(i)
            expect[i] = True
    np.testing.assert_array_equal(keep, expect)


def test_full_scan_data_parallel_matches_single_device(
        tmp_path, server, monkeypatch):
    """Hermetic multi-chip city scan: the production data-parallel step
    (build_detect_step(mesh=...) over the 8-CPU virtual mesh) must produce
    the same final detection set as the single-device scan."""
    from aerial_image_recognition_tpu.parallel.mesh import make_mesh
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)

    _patch_window(monkeypatch)
    cfg = DetectorConfig(confidence_threshold=0.003)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)

    def scan(step, sub):
        det, base = _detector(tmp_path.joinpath(sub), server, step)
        out = det.detect(force_restart=True)
        doc = read_geojson(os.path.join(
            str(tmp_path / sub), "output", "detections_results.geojson"))
        return out, doc

    single = build_detect_step(cfg, batch=8, bundle=bundle, src_size=96,
                               model_size=64)
    dp = build_detect_step(cfg, batch=8, bundle=bundle, src_size=96,
                           model_size=64, mesh=make_mesh())
    out_s, doc_s = scan(single, "single")
    out_d, doc_d = scan(dp, "dp")
    assert out_d["tiles"] == out_s["tiles"]
    assert len(doc_d["features"]) == len(doc_s["features"]) > 0
    pts_s = sorted((round(f["geometry"]["coordinates"][0], 7),
                    round(f["geometry"]["coordinates"][1], 7))
                   for f in doc_s["features"])
    pts_d = sorted((round(f["geometry"]["coordinates"][0], 7),
                    round(f["geometry"]["coordinates"][1], 7))
                   for f in doc_d["features"])
    assert pts_s == pts_d
