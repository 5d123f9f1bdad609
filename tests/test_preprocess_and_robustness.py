"""Device preprocess ops, device dedup, and scan-under-failure robustness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.ops.preprocess import (
    assemble_mosaic, preprocess_batch,
)
from aerial_image_recognition_tpu.post.dedup import dedup_device


def test_preprocess_normalize_and_dtype(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    out = preprocess_batch(imgs, out_size=64, dtype=jnp.float32)
    assert out.shape == (2, 64, 64, 3) and out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(imgs, np.float32) / 255.0,
                               atol=1e-6)


def test_preprocess_center_crop_then_resize(rng):
    # 128² source, center-crop 96, resize 64 — the XYZ 1024→864→640 shape
    img = np.zeros((1, 128, 128, 3), np.uint8)
    img[0, 16:112, 16:112] = 200          # bright center crop region
    img[0, :16] = 10                       # dark border that must vanish
    out = preprocess_batch(jnp.asarray(img), out_size=64, crop_size=96,
                           dtype=jnp.float32)
    assert out.shape == (1, 64, 64, 3)
    assert float(out.min()) > 0.7          # border never sampled


def test_assemble_mosaic_layout():
    # 2×2 grid of 4-px tiles with distinct values
    tiles = np.zeros((1, 4, 4, 4, 3), np.uint8)
    for i in range(4):
        tiles[0, i] = (i + 1) * 50
    m = assemble_mosaic(jnp.asarray(tiles), grid=(2, 2), tile_px=4)
    assert m.shape == (1, 8, 8, 3)
    m = np.asarray(m)
    assert (m[0, :4, :4] == 50).all()      # row-major tile order
    assert (m[0, :4, 4:] == 100).all()
    assert (m[0, 4:, :4] == 150).all()
    assert (m[0, 4:, 4:] == 200).all()


def test_dedup_device_greedy_semantics():
    # three points: a beats b (1.5 m apart), c independent (10 m away)
    x = jnp.asarray([0.0, 1.5, 10.0, 1e9], jnp.float32)
    y = jnp.zeros(4, jnp.float32)
    conf = jnp.asarray([0.9, 0.8, 0.7, -jnp.inf], jnp.float32)
    idx, kconf, valid = dedup_device(x, y, conf, radius_m=2.0, max_keep=4)
    kept = sorted(float(c) for c in np.asarray(kconf)[np.asarray(valid)])
    np.testing.assert_allclose(kept, [0.7, 0.9], rtol=1e-6)


def test_scan_survives_fetch_failures(tmp_path, monkeypatch):
    """30% dropped requests with only 1 retry: failed tiles are recorded,
    the scan still completes and emits results."""
    from aerial_image_recognition_tpu.fetch.fake import (
        FakeTileServer, FakeWorld, FaultConfig)
    from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
    from aerial_image_recognition_tpu.gio.geojson import write_geojson
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.detector import CarDetector
    from aerial_image_recognition_tpu.pipeline.inference import (
        DetectStep, make_detect_fn)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    srv = FakeTileServer(FakeWorld(n_cars=5),
                         faults=FaultConfig(drop_rate=0.3))
    srv.start()
    try:
        monkeypatch.setattr(XYZFetcher, "window_px",
                            lambda self, lat, m=None: 96)
        cfg = DetectorConfig(confidence_threshold=0.3)
        bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
        fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
        step = DetectStep(bundle=bundle, fn=fn, batch=4, input_size=96,
                          model_size=64)
        aoi = {"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [[
                [20.9992, 52.1992], [21.0008, 52.1992], [21.0008, 52.2008],
                [20.9992, 52.2008], [20.9992, 52.1992]]]}}]}
        frame = str(tmp_path / "aoi.geojson")
        write_geojson(aoi, frame)
        fetcher = XYZFetcher(srv.xyz_template, zoom=17, num_workers=4,
                             subdomains=("",), retries=1)
        det = CarDetector(str(tmp_path), {
            "frame_path": frame, "use_xyz": True,
            "xyz_url": srv.xyz_template,
            "batch_size": 8, "device_batch": 4,
            "checkpoint_interval": 10**9,
        }, fetcher=fetcher, detect_step=step)
        out = det.detect(force_restart=True)
        assert out["tiles"] >= 4
        # failures were observed but didn't kill the scan
        assert fetcher.http.stats.failures > 0
        import os
        assert os.path.exists(os.path.join(
            str(tmp_path), "output", "detections_results.geojson"))
        fetcher.close()
    finally:
        srv.stop()


def test_matmul_resize_matches_reference_lowering(rng):
    """The separable MXU resize (two bf16 contractions with the exact
    jax.image.resize weight matrices, /255 folded in) tracks the f32
    jax.image.resize lowering within bf16 rounding — down- and up-scale,
    both linear methods, and the crop→resize composition."""
    x = rng.integers(0, 256, (2, 864, 864, 3)).astype(np.uint8)
    for method in ("bilinear", "lanczos3"):
        ref = jax.image.resize(jnp.asarray(x, jnp.float32) / 255.0,
                               (2, 640, 640, 3), method=method)
        got = preprocess_batch(jnp.asarray(x), out_size=640, method=method,
                               dtype=jnp.float32)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert d.max() <= 0.010, (method, d.max())   # ≈2.5 u8 LSB
        assert d.mean() <= 0.002, (method, d.mean())
    y = rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    ref_up = jax.image.resize(jnp.asarray(y, jnp.float32) / 255.0,
                              (2, 256, 256, 3), method="bilinear")
    got_up = preprocess_batch(jnp.asarray(y), out_size=256,
                              dtype=jnp.float32)
    assert np.abs(np.asarray(ref_up) - np.asarray(got_up)).max() <= 0.010
    # crop → resize composes (the XYZ 1024→864 center crop geometry)
    ref_cr = jax.image.resize(
        jnp.asarray(x[:, 80:-80, 80:-80], jnp.float32) / 255.0,
        (2, 640, 640, 3), method="bilinear")
    got_cr = preprocess_batch(jnp.asarray(x), out_size=640, crop_size=704,
                              dtype=jnp.float32)
    assert np.abs(np.asarray(ref_cr) - np.asarray(got_cr)).max() <= 0.010


def test_matmul_resize_float_matches_image_resize(rng):
    """The float-input MXU resize (multiscale inference path) tracks
    jax.image.resize within bf16 rounding at the multiscale geometries
    (640→544 down, 640→736 up), in both f32 and bf16 input dtypes."""
    from aerial_image_recognition_tpu.ops.preprocess import (
        matmul_resize_float)
    x = rng.random((2, 640, 640, 3)).astype(np.float32)
    for dst in (544, 736):
        ref = jax.image.resize(jnp.asarray(x), (2, dst, dst, 3),
                               method="bilinear")
        got = matmul_resize_float(jnp.asarray(x), dst)
        d = np.abs(np.asarray(ref) - np.asarray(got))
        assert d.max() <= 0.012, (dst, d.max())      # bf16 relative step
        assert d.mean() <= 0.002, (dst, d.mean())
        xb = jnp.asarray(x, jnp.bfloat16)
        got_b = matmul_resize_float(xb, dst)
        assert got_b.dtype == jnp.bfloat16 and got_b.shape == ref.shape
        db = np.abs(np.asarray(ref) -
                    np.asarray(got_b, dtype=np.float32))
        assert db.max() <= 0.020, (dst, db.max())
        # f32 inputs must keep full f32 precision (contractions run in
        # f32, not bf16 — a dtype=float32 pipeline gets exact rescales):
        # this tolerance is ~300× tighter than the bf16 rounding step
        assert d.max() <= 4e-5, (dst, d.max())
