"""Hex heatmap layer + multiscale inference option."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.post.heatmap import hex_heatmap, _hex_of, _hex_center


def test_hex_of_center_identity():
    for q, r in [(0, 0), (3, 2), (-2, 5), (7, -3)]:
        cx, cy = _hex_center(q, r, 50.0)
        assert _hex_of(cx, cy, 50.0) == (q, r)


def test_hex_heatmap_counts(tmp_path):
    m2lon = 1.0 / (111319.9 * np.cos(np.radians(52.2)))
    m2lat = 1.0 / 111319.9
    records = []
    # cluster A: 5 points within ~10 m; cluster B: 3 points ~400 m away
    for i in range(5):
        records.append({"lon": 21.0 + i * 2 * m2lon, "lat": 52.2,
                        "confidence": 0.8})
    for i in range(3):
        records.append({"lon": 21.0 + (400 + i * 2) * m2lon, "lat": 52.2,
                        "confidence": 0.4})
    out_path = str(tmp_path / "hex.geojson")
    fc = hex_heatmap(records, hex_size_m=50.0, output_geojson=out_path)
    counts = sorted(f["properties"]["count"] for f in fc["features"])
    assert sum(counts) == 8
    assert counts[-1] == 5          # the dense cluster lands in one hex
    assert len(fc["features"]) >= 2
    # hexes are valid closed rings near the data
    ring = fc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) == 7
    import os
    assert os.path.exists(out_path)


def test_hex_heatmap_empty():
    fc = hex_heatmap([], hex_size_m=25.0)
    assert fc["features"] == []


def test_multiscale_detect_compiles_and_unions():
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    cfg = DetectorConfig(confidence_threshold=0.3)
    cfg.extra["multiscale"] = [0.5, 1.0, 1.5]
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    imgs = jnp.zeros((2, 64, 64, 3), dtype=jnp.uint8)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (2, 1))
    det, lon, lat = fn(bundle.params, imgs, bounds)
    assert det.boxes.shape == (2, cfg.max_detections_per_tile, 4)
    # all surviving boxes are expressed in the base 64-px frame
    valid = np.asarray(det.valid)
    if valid.any():
        assert float(np.asarray(det.boxes)[valid][:, 0].max()) <= 64.0 + 32
