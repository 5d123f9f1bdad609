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


def _ms_detect(extra, imgs, bounds, conf=0.002):
    # conf sits just under the untrained prior-init objectness (~0.01) so
    # an untrained model still yields detections to compare
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    cfg = DetectorConfig(confidence_threshold=conf)
    cfg.extra.update(extra)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    return fn(bundle.params, imgs, bounds)


def _det_set(det):
    valid = np.asarray(det.valid)
    boxes = np.asarray(det.boxes, np.float32)
    scores = np.asarray(det.scores, np.float32)
    out = []
    for k in range(valid.shape[0]):
        rows = np.concatenate(
            [boxes[k][valid[k]], scores[k][valid[k]][:, None]], axis=1)
        out.append(rows[np.lexsort(rows.T)])
    return out


def test_multiscale_weights_zero_offscale_equals_single_scale():
    """multiscale_weights [0,1,0] zeroes the off-scale scores, so the kept
    detection set must equal plain single-scale inference — pins that the
    weights hit exactly the per-scale score tensors and nothing else."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (2, 1))
    det_s, _, _ = _ms_detect({}, imgs, bounds)
    det_m, _, _ = _ms_detect(
        {"multiscale": [0.5, 1.0, 1.5],
         "multiscale_weights": [0.0, 1.0, 0.0],
         # single-scale runs without voting; disable the multiscale-default
         # voting so the comparison isolates the WEIGHTS contract
         "box_voting": 0}, imgs, bounds)
    assert np.asarray(det_s.valid).sum() > 0   # untrained but low conf
    for a, b in zip(_det_set(det_s), _det_set(det_m)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_multiscale_default_box_voting_is_05():
    """Unset extra.box_voting defaults to the 0.5-gate vote under
    multiscale (round-5 on-chip A/B winner, artifacts/accuracy_r5/
    box_voting.json) — pinned by equality with the explicit 0.5 run; an
    explicit 0 disables (differs from the default on duplicate-heavy
    input); single-scale stays vote-free (equality with explicit 0)."""
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (2, 1))
    ms = {"multiscale": [0.5, 1.0, 1.5]}
    det_d, _, _ = _ms_detect(dict(ms), imgs, bounds)
    det_e, _, _ = _ms_detect(dict(ms, box_voting=0.5), imgs, bounds)
    det_0, _, _ = _ms_detect(dict(ms, box_voting=0), imgs, bounds)
    assert np.asarray(det_d.valid).sum() > 0
    for a, b in zip(_det_set(det_d), _det_set(det_e)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # voting moves at least some kept box on the untrained duplicate-heavy
    # output (scores/classes/valid are pass-through, boxes differ)
    assert any(np.abs(a - b).max() > 1e-6
               for a, b in zip(_det_set(det_d), _det_set(det_0)))
    det_s, _, _ = _ms_detect({}, imgs, bounds)
    det_s0, _, _ = _ms_detect({"box_voting": 0}, imgs, bounds)
    for a, b in zip(_det_set(det_s), _det_set(det_s0)):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_multiscale_default_weights_are_offscale_08():
    """With no explicit multiscale_weights the step applies 0.8 to every
    non-native scale (the round-5 on-chip sweep's winner) — pinned by
    equality with the explicit [0.8, 1.0, 0.8] run."""
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)), jnp.uint8)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (2, 1))
    det_d, _, _ = _ms_detect({"multiscale": [0.5, 1.0, 1.5]}, imgs, bounds)
    det_e, _, _ = _ms_detect(
        {"multiscale": [0.5, 1.0, 1.5],
         "multiscale_weights": [0.8, 1.0, 0.8]}, imgs, bounds)
    assert np.asarray(det_d.valid).sum() > 0
    for a, b in zip(_det_set(det_d), _det_set(det_e)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_multiscale_weights_validate_length():
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    cfg = DetectorConfig()
    cfg.extra["multiscale"] = [0.85, 1.0, 1.15]
    cfg.extra["multiscale_weights"] = [1.0, 1.0]
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    with pytest.raises(ValueError, match="multiscale_weights"):
        make_detect_fn(bundle, cfg, model_size=64)


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
