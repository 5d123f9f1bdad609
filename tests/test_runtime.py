"""Runtime layer: config, checkpoints (both formats), observability."""

import json
import os
import time

import pytest

from aerial_image_recognition_tpu.runtime.config import (
    DEFAULT_CONFIG, DetectorConfig,
)
from aerial_image_recognition_tpu.runtime.checkpoint import (
    CheckpointManager, CheckpointState, grid_fingerprint,
)
from aerial_image_recognition_tpu.runtime.observability import (
    DeviceMonitor, EventLog, PhaseTimer,
)


DETS = [{"lon": 21.0, "lat": 52.2, "confidence": 0.9},
        {"lon": 21.001, "lat": 52.201, "confidence": 0.5}]


def test_config_reference_key_parity():
    # every key of the reference DEFAULT_CONFIG (_script/config.py:3-29)
    # must exist with the same defaults where meaningful
    for key, want in [
        ("wms_url", "https://service.pdok.nl/hwh/luchtfotorgb/wms/v1_0"),
        ("wms_layer", "Actueel_orthoHR"), ("wms_srs", "EPSG:4326"),
        ("tile_size_meters", 64.0), ("confidence_threshold", 0.3),
        ("tile_overlap", 0.2), ("batch_size", 64),
        ("checkpoint_interval", 2000), ("num_workers", 25),
        ("queue_size", 64), ("frame_path", "amsterdam.shp"),
        ("output_prefix", "detections"),
    ]:
        assert DEFAULT_CONFIG[key] == want, key


def test_config_from_dict_extra_and_merge():
    cfg = DetectorConfig.from_dict({"tile_size_meters": 32.0,
                                    "custom_knob": 7})
    assert cfg.tile_size_meters == 32.0
    assert cfg.extra["custom_knob"] == 7
    merged = cfg.merged({"batch_size": 128})
    assert merged.batch_size == 128 and merged.tile_size_meters == 32.0


def test_config_validation():
    with pytest.raises(ValueError):
        DetectorConfig.from_dict({"tile_overlap": 1.5})
    with pytest.raises(ValueError):
        DetectorConfig.from_dict({"model_family": "resnet"})


@pytest.mark.parametrize("style", ["split", "combined"])
def test_checkpoint_roundtrip(tmp_path, style):
    mgr = CheckpointManager(str(tmp_path), prefix="t", style=style)
    state = CheckpointState(processed_count=42, total_tiles=100,
                            detections=DETS, grid_fingerprint="fp1")
    mgr.save(state)
    back = mgr.load()
    assert back.processed_count == 42
    assert back.total_tiles == 100
    assert back.grid_fingerprint == "fp1"
    assert len(back.detections) == 2
    assert back.detections[0]["confidence"] == pytest.approx(0.9)
    mgr.clear()
    assert mgr.load() is None


def test_checkpoint_atomicity(tmp_path):
    mgr = CheckpointManager(str(tmp_path), prefix="t")
    mgr.save(CheckpointState(1, 10, DETS))
    # no stray .tmp files after save
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_grid_fingerprint_sensitivity():
    b = (20.98, 52.19, 21.02, 52.21)
    f1 = grid_fingerprint(b, 64.0, 0.2, 100)
    assert f1 != grid_fingerprint(b, 64.0, 0.2, 101)
    assert f1 != grid_fingerprint(b, 32.0, 0.2, 100)
    assert f1 == grid_fingerprint(tuple(b), 64.0, 0.2, 100)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    t.add("b", 2.0)
    rep = t.report()
    assert rep["a"] >= 0.01 and rep["b"] == 2.0
    assert "Phase breakdown" in t.format_report()
    assert "b" in t.format_report()


def test_event_log(tmp_path):
    p = str(tmp_path / "ev.jsonl")
    log = EventLog(p)
    log.emit("grid", tiles=5)
    log.emit("done", detections=2)
    rows = [json.loads(l) for l in open(p)]
    assert [r["kind"] for r in rows] == ["grid", "done"]
    assert rows[0]["tiles"] == 5 and "ts" in rows[0]


def test_device_monitor_sample_and_thread(tmp_path):
    p = str(tmp_path / "mon.jsonl")
    mon = DeviceMonitor(interval=0.05, log_path=p, print_line=False)
    s = mon.sample()
    assert "ts" in s and ("hbm_used_mb" in s or "device_error" in s)
    mon.start()
    time.sleep(0.2)
    mon.stop()
    assert os.path.exists(p) and len(open(p).readlines()) >= 1
