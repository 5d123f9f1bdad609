"""int8 PTQ (models/int8.py): quantized-trunk detection parity vs bf16.

The int8 graph is a second transcription of the yolov7-tiny trunk, so these
tests serve the same role as tests/test_arch_differential.py does for the
flax model: any structural divergence (concat order, padding, stride) or
scale-folding bug shows up as detection mismatch on the trained fixture.
"""

import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov7_tiny_fakeworld.npz")
SIZE = 96   # the fixture's training scale: 96 px / 48 m = 0.5 m/px


def _scene_tiles():
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    half = 24.0  # meters (48 m tiles)
    tiles = []
    for lon, lat, _ in world.cars[:12]:
        bb = (lon - half * m2lon, lat - half * m2lat,
              lon + half * m2lon, lat + half * m2lat)
        tiles.append(world.render(bb, SIZE, SIZE))
    return np.stack(tiles)


@pytest.fixture(scope="module")
def bundles():
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    if not os.path.exists(FIXTURE):
        pytest.skip("trained fixture not present")
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(FIXTURE))
    tiles = _scene_tiles()
    qb = quantize_bundle(bundle, [tiles[:8]], model_size=SIZE)
    return bundle, qb, tiles


def _detect(bundle, params, x):
    from aerial_image_recognition_tpu.ops.nms import batched_nms
    boxes, scores = bundle.forward(params, x)
    return batched_nms(boxes.astype(jnp.float32), scores.astype(jnp.float32),
                       num_classes=1, conf_threshold=0.4, iou_threshold=0.45,
                       max_det=32, pre_topk=256, use_pallas=False)


def test_int8_detections_match_bf16(bundles):
    """Per-tile detection parity on real trained-scene tiles: same counts,
    tight box agreement, small score drift."""
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch
    bundle, qb, tiles = bundles
    x = preprocess_batch(jnp.asarray(tiles), out_size=SIZE,
                         dtype=jnp.float32)
    ref = _detect(bundle, bundle.params, x)
    got = _detect(qb, qb.params, x)
    n_ref = np.asarray(ref.valid).sum(axis=1)
    n_got = np.asarray(got.valid).sum(axis=1)
    assert n_ref.sum() >= 12, "trained model should find the centered cars"
    np.testing.assert_array_equal(n_got, n_ref)
    for b in range(len(tiles)):
        v = np.asarray(ref.valid[b])
        rb = np.asarray(ref.boxes[b])[v]
        gb = np.asarray(got.boxes[b])[np.asarray(got.valid[b])]
        # greedy match by center distance
        for r in rb:
            d = np.abs(gb[:, :2] - r[:2]).sum(axis=1)
            j = int(d.argmin())
            # centers within 1.5 px, sizes within 15%
            assert np.all(np.abs(gb[j, :2] - r[:2]) < 1.5), (b, r, gb[j])
            assert np.all(np.abs(gb[j, 2:] - r[2:])
                          < 0.15 * np.maximum(r[2:], 4)), (b, r, gb[j])
        rs = np.sort(np.asarray(ref.scores[b])[v])
        gs = np.sort(np.asarray(got.scores[b])[np.asarray(got.valid[b])])
        np.testing.assert_allclose(gs, rs, atol=0.06)


def test_int8_quad_path_matches_hwc(bundles):
    """forward_s2d2 (quad-stem entry) must agree with the standard int8
    path — same trunk, different stem lowering."""
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch
    from aerial_image_recognition_tpu.ops.quadstem import host_s2d2
    bundle, qb, tiles = bundles
    x = preprocess_batch(jnp.asarray(tiles), out_size=SIZE,
                         dtype=jnp.float32)
    ref = _detect(qb, qb.params, x)

    xq = jnp.asarray(host_s2d2(tiles))
    boxes, scores = qb.forward_s2d2(qb.params, xq)
    from aerial_image_recognition_tpu.ops.nms import batched_nms
    got = batched_nms(boxes.astype(jnp.float32),
                      scores.astype(jnp.float32), num_classes=1,
                      conf_threshold=0.4, iou_threshold=0.45, max_det=32,
                      pre_topk=256, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got.valid).sum(axis=1),
                                  np.asarray(ref.valid).sum(axis=1))
    for b in range(len(tiles)):
        rb = np.asarray(ref.boxes[b])[np.asarray(ref.valid[b])]
        gb = np.asarray(got.boxes[b])[np.asarray(got.valid[b])]
        for r in rb:
            j = int(np.abs(gb[:, :2] - r[:2]).sum(axis=1).argmin())
            assert np.all(np.abs(gb[j, :2] - r[:2]) < 1.5)


def test_int8_stems_exact_shift_and_border_correction(bundles):
    """The fully-int8 stem entry: u8→i8 shift is exact (x−128 ≡ x XOR 128
    reinterpreted), so the only loss vs the f32 quad stems is weight
    quantization — P2 must agree within a few quant steps EVERYWHERE,
    including row 0 / col 0 where lax.conv's zero padding represents pixel
    128 and the border-correction constants must undo it."""
    from aerial_image_recognition_tpu.models.int8 import (
        _stems_int8, _quantize_stems, calibrate_absmax)
    from aerial_image_recognition_tpu.ops.quadstem import (
        host_s2d2, quad_stem_forward)
    bundle, qb, tiles = bundles
    img = tiles[:2]
    xq = jnp.asarray(host_s2d2(img))
    p2_f = quad_stem_forward(bundle.params, xq, act="leaky",
                             dtype=jnp.float32, bn_eps=1e-5)
    p2s = float(np.asarray(qb.params["q"]["p2_scale"]))
    p2_q = np.asarray(_stems_int8(qb.params["q"], xq), np.float32) * p2s
    err = np.abs(p2_q - np.asarray(p2_f, np.float32))
    assert float(err.max()) < 4 * p2s, (float(err.max()), p2s)
    # borders specifically (the correction's domain)
    assert float(err[:, 0, :].max()) < 4 * p2s
    assert float(err[:, :, 0].max()) < 4 * p2s
    # and the correction is load-bearing: removing it must break row/col 0
    import copy
    broken = copy.deepcopy(jax.device_get(qb.params["q"]["stems"]))
    broken = {k: jnp.asarray(v) for k, v in broken.items()}
    broken["corr"] = broken["corr"] * 0.0
    bad = dict(qb.params["q"])
    bad = {**bad, "stems": broken}
    p2_b = np.asarray(_stems_int8(bad, xq), np.float32) * p2s
    err_b = np.abs(p2_b - np.asarray(p2_f, np.float32))
    assert float(err_b[:, 0, :].max()) > 10 * p2s


def test_int8_data_parallel_matches_single_device(bundles):
    """Compose the two flagship paths: the int8 step under the 8-device
    data-parallel shard_map must reproduce the single-device int8 step
    exactly (int8 convs are plain XLA ops — GSPMD-visible, unlike the
    Pallas NMS tail which shard_map runs per-shard by construction)."""
    from aerial_image_recognition_tpu.parallel.mesh import make_mesh
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    mesh = make_mesh()
    n = mesh.shape["data"]
    batch = (len(tiles) // n + (len(tiles) % n > 0)) * n
    imgs = np.concatenate([tiles, tiles[:batch - len(tiles)]])
    cfg = DetectorConfig(confidence_threshold=0.4)
    step_1 = build_detect_step(cfg, batch=batch, bundle=qb, model_size=SIZE)
    step_n = build_detect_step(cfg, batch=batch, bundle=qb, model_size=SIZE,
                               mesh=mesh)
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (batch, 1))
    det_1, lon_1, lat_1 = step_1(jnp.asarray(imgs), bounds)
    det_n, lon_n, lat_n = step_n(jnp.asarray(imgs), bounds)
    np.testing.assert_array_equal(np.asarray(det_n.valid),
                                  np.asarray(det_1.valid))
    np.testing.assert_allclose(np.asarray(lon_n), np.asarray(lon_1),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(det_n.scores),
                               np.asarray(det_1.scores), rtol=1e-6)


def test_int8_full_city_scan(tmp_path, bundles):
    """End-to-end L5 composition: a full CarDetector scan (fetch → mosaic →
    int8 fused step → georef → dedup → GeoJSON) with the quantized model
    must find the same cars the bf16 scan does
    (test_detection_quality.py's bar: recall@3m ≥ 0.8, precision ≥ 0.7)."""
    from aerial_image_recognition_tpu.fetch.fake import (
        FakeTileServer, FakeWorld)
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    from aerial_image_recognition_tpu.gio.geojson import (
        read_geojson, write_geojson)
    from aerial_image_recognition_tpu.pipeline.detector import CarDetector
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    srv = FakeTileServer(world)
    srv.start()
    try:
        cfg = DetectorConfig(confidence_threshold=0.4,
                             nms_iou_threshold=0.45, duplicate_distance=2.0)
        step = build_detect_step(cfg, batch=16, bundle=qb, model_size=SIZE)
        half_lon, half_lat = 95 * m2lon, 65 * m2lat
        ring = [[21.0 - half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 - half_lat]]
        frame = str(tmp_path / "aoi.geojson")
        write_geojson({"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [ring]}}]},
            frame)
        fetcher = WMSFetcher(srv.base_url + "/wms", layer="fake",
                             size=(SIZE, SIZE), num_workers=8,
                             submit_spacing=0.0)
        det = CarDetector(str(tmp_path), {
            "frame_path": frame, "tile_size_meters": 48.0,
            "tile_overlap": 0.25, "confidence_threshold": 0.4,
            "duplicate_distance": 2.0, "batch_size": 32,
            "device_batch": 16, "checkpoint_interval": 10**9,
        }, fetcher=fetcher, detect_step=step)
        det.detect(force_restart=True)
        fetcher.close()
        doc = read_geojson(os.path.join(str(tmp_path), "output",
                                        "detections_results.geojson"))
        found = np.array([f["geometry"]["coordinates"]
                          for f in doc["features"]], np.float64)
        assert len(found) > 0
        cars = world.cars
        inside = ((np.abs(cars[:, 0] - 21.0) < half_lon - 5 * m2lon)
                  & (np.abs(cars[:, 1] - 52.2) < half_lat - 5 * m2lat))
        t_m = np.stack([(cars[inside][:, 0] - 21.0) / m2lon,
                        (cars[inside][:, 1] - 52.2) / m2lat], 1)
        f_m = np.stack([(found[:, 0] - 21.0) / m2lon,
                        (found[:, 1] - 52.2) / m2lat], 1)
        d = np.sqrt(((t_m[:, None] - f_m[None]) ** 2).sum(-1))
        assert float((d.min(axis=1) < 3.0).mean()) >= 0.8
        assert float((d.min(axis=0) < 3.0).mean()) >= 0.7
    finally:
        srv.stop()


V8_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                          "yolov8n_fakeworld.npz")


@pytest.mark.skipif(not os.path.exists(V8_FIXTURE),
                    reason="trained v8 fixture not present")
def test_int8_yolov8_matches_bf16():
    """v8 family coverage: silu epilogue (requant NOT folded — silu isn't
    homogeneous), C2f splits, residual adds at static calibrated scales,
    and the int8 quad-stem entry, all against the trained v8n fixture."""
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch
    from aerial_image_recognition_tpu.ops.nms import batched_nms
    from aerial_image_recognition_tpu.ops.quadstem import host_s2d2
    bundle = create_model("yolov8n", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(V8_FIXTURE))
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    tiles = []
    for lon, lat, _ in world.cars[:8]:
        bb = (lon - 4.8 * m2lon, lat - 4.8 * m2lat,
              lon + 4.8 * m2lon, lat + 4.8 * m2lat)
        tiles.append(world.render(bb, 96, 96))
    tiles = np.stack(tiles)
    qb = quantize_bundle(bundle, [tiles], model_size=96)
    x = preprocess_batch(jnp.asarray(tiles), out_size=96,
                         dtype=jnp.float32)
    kw = dict(num_classes=2, conf_threshold=0.4, iou_threshold=0.45,
              max_det=16, pre_topk=256, use_pallas=False)
    bx, bs = bundle.forward(bundle.params, x)
    qx, qs = qb.forward(qb.params, x)
    ref = batched_nms(bx, bs, **kw)
    got = batched_nms(qx, qs, **kw)
    np.testing.assert_array_equal(np.asarray(got.valid).sum(1),
                                  np.asarray(ref.valid).sum(1))
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(ref.classes))
    for b in range(len(tiles)):
        rb = np.asarray(ref.boxes[b])[np.asarray(ref.valid[b])]
        gb = np.asarray(got.boxes[b])[np.asarray(got.valid[b])]
        for r in rb:
            j = int(np.abs(gb[:, :2] - r[:2]).sum(axis=1).argmin())
            assert np.all(np.abs(gb[j, :2] - r[:2]) < 2.0), (b, r, gb[j])
    # quad-stem entry (int8 stems, silu epilogue with separate requant)
    xq = jnp.asarray(host_s2d2(tiles))
    qxq, qsq = qb.forward_s2d2(qb.params, xq)
    got_q = batched_nms(qxq, qsq, **kw)
    np.testing.assert_array_equal(np.asarray(got_q.valid).sum(1),
                                  np.asarray(ref.valid).sum(1))


def test_int8_rejects_unsupported_family():
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    # xunet dispatches to quantize_xunet since round 3 (no longer rejected)
    xunet = create_model("xunet_256", dtype=jnp.float32)
    qx = quantize_bundle(xunet, [np.zeros((1, 256, 256, 3), np.uint8)])
    assert qx.__class__.__name__ == "Int8XUnetBundle"
    # the s2d_stem experiment changes the stem parameter geometry — must
    # be rejected up front, not fail deep in the kernel transforms
    from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
    from dataclasses import replace as dc_replace
    tiny = create_model("yolov7_itcvd", dtype=jnp.float32)
    s2d = dc_replace(tiny, module=YOLOv7(num_classes=1, variant="tiny",
                                         dtype=jnp.float32, s2d_stem=True))
    with pytest.raises(NotImplementedError):
        quantize_bundle(s2d, [np.zeros((1, 64, 64, 3), np.uint8)])


def test_int8_transcription_guard():
    """The prepare pass cross-checks every conv's kernel shape against the
    transcription's channel bookkeeping — a corrupted tree must raise, not
    silently mis-slice."""
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.models.int8 import (
        calibrate_absmax, quantize_bundle)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    absmax = calibrate_absmax(
        bundle, [np.zeros((1, 96, 96, 3), np.uint8)], model_size=96)
    bad = jax.tree_util.tree_map(lambda a: a, bundle.params)
    k = bad["params"]["elan1"]["cv3"]["conv"]["kernel"]
    bad["params"]["elan1"]["cv3"]["conv"]["kernel"] = k[:, :, :16, :]
    bundle.params = bad
    with pytest.raises(ValueError, match="elan1/cv3"):
        quantize_bundle(bundle, [], absmax=absmax)


def test_calibrate_cli_then_config_quantize(tmp_path, bundles):
    """Turnkey int8 flow: CLI `calibrate` writes the scales JSON from a
    GeoTIFF, then extra.quantize/quantize_calib builds a quantized step."""
    import json
    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    from aerial_image_recognition_tpu.pipeline.cli import main as cli_main
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    # a mosaic of trained-scene tiles as the "representative imagery"
    mosaic = np.concatenate(
        [np.concatenate(list(tiles[i * 2:i * 2 + 2]), axis=1)
         for i in range(2)], axis=0)                       # 192x192
    gt_path = str(tmp_path / "calib.tif")
    write_geotiff(gt_path, mosaic, (21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5), 4326)
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)
    calib_path = str(tmp_path / "absmax.json")
    rc = cli_main(["calibrate", gt_path, "--model", "yolov7_itcvd",
                   "--params", params_path, "--window", "96",
                   "--out", calib_path])
    assert rc == 0
    rec = json.load(open(calib_path))
    assert "elan1/cv1" in rec and "stem1" in rec

    # build via config (fresh bundle from params_path)
    cfg2 = DetectorConfig(confidence_threshold=0.4,
                          params_path=params_path)
    cfg2.extra["quantize"] = "int8"
    cfg2.extra["quantize_calib"] = calib_path
    step = build_detect_step(cfg2, batch=len(tiles), model_size=SIZE)
    assert step.bundle.__class__.__name__ == "Int8Bundle"
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (len(tiles), 1))
    det, lon, lat = step(jnp.asarray(tiles), bounds)
    assert int(np.asarray(det.valid).sum()) >= 12


def test_int8_in_fused_step(bundles):
    """The Int8Bundle drops into build_detect_step (quad-stem layout picked
    automatically) and the fused step produces the same detection set."""
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step, use_quad_stem)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    cfg = DetectorConfig(confidence_threshold=0.4, nms_iou_threshold=0.45)
    assert use_quad_stem(qb, cfg, model_size=SIZE)
    step_q = build_detect_step(cfg, batch=len(tiles), bundle=qb,
                               model_size=SIZE)
    step_f = build_detect_step(cfg, batch=len(tiles), bundle=bundle,
                               model_size=SIZE)
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (len(tiles), 1))
    det_q, lon_q, lat_q = step_q(jnp.asarray(tiles), bounds)
    det_f, lon_f, lat_f = step_f(jnp.asarray(tiles), bounds)
    nq = np.asarray(det_q.valid).sum(axis=1)
    nf = np.asarray(det_f.valid).sum(axis=1)
    np.testing.assert_array_equal(nq, nf)
    # georef agreement on the matched detections: within ~2e-5 deg (~2 m)
    for b in range(len(tiles)):
        fq = np.stack([np.asarray(lon_q[b])[np.asarray(det_q.valid[b])],
                       np.asarray(lat_q[b])[np.asarray(det_q.valid[b])]], 1)
        ff = np.stack([np.asarray(lon_f[b])[np.asarray(det_f.valid[b])],
                       np.asarray(lat_f[b])[np.asarray(det_f.valid[b])]], 1)
        for r in ff:
            j = int(np.abs(fq - r).sum(axis=1).argmin())
            assert np.all(np.abs(fq[j] - r) < 2e-5)


@pytest.mark.slow
def test_int8_composes_with_tta(bundles):
    """TTA (brightness/gamma/CLAHE variation union — the reference's
    gpu_handler.py:94-140 mode) over the int8 trunk: Int8Bundle.forward
    shares ModelBundle's float-image contract, so the TTA expansion drops
    in unchanged. Plain calibration suffices (measured: TTA-aware
    calibration only loosens the scales and degrades scores); high-
    confidence detections must agree with the bf16 TTA step, counts
    within ±1 (borderline ~0.4-score boxes may differ under variation
    union)."""
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    cfg = DetectorConfig(confidence_threshold=0.4, dtype="float32")
    cfg.extra["tta"] = True
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (len(tiles), 1))
    det_f, _, _ = build_detect_step(cfg, batch=len(tiles), bundle=bundle,
                                    model_size=SIZE)(jnp.asarray(tiles),
                                                     bounds)
    det_q, _, _ = build_detect_step(cfg, batch=len(tiles), bundle=qb,
                                    model_size=SIZE)(jnp.asarray(tiles),
                                                     bounds)
    n_f = np.asarray(det_f.valid).sum(axis=1)
    n_q = np.asarray(det_q.valid).sum(axis=1)
    assert n_f.sum() >= 12
    assert int(np.abs(n_f - n_q).max()) <= 1
    for b in range(len(tiles)):
        v = np.asarray(det_f.valid[b])
        strong = np.asarray(det_f.scores[b])[v] >= 0.6
        fb = np.asarray(det_f.boxes[b])[v][strong]
        fs = np.asarray(det_f.scores[b])[v][strong]
        gb = np.asarray(det_q.boxes[b])[np.asarray(det_q.valid[b])]
        gs = np.asarray(det_q.scores[b])[np.asarray(det_q.valid[b])]
        assert len(gb) or not len(fb), \
            f"tile {b}: int8 lost every detection incl. strong ones"
        for r, s in zip(fb, fs):
            j = int(np.abs(gb[:, :2] - r[:2]).sum(axis=1).argmin())
            assert np.all(np.abs(gb[j, :2] - r[:2]) < 2.0), (b, r, gb[j])
            assert abs(gs[j] - s) < 0.05, (b, s, gs[j])


XUNET_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                             "xunet_fakeworld.npz")


@pytest.mark.skipif(not os.path.exists(XUNET_FIXTURE),
                    reason="trained xunet fixture not present")
@pytest.mark.slow
def test_int8_xunet_mask_parity():
    """int8-PTQ of the XUnet segmentation trunk (third transcription of the
    scheme: relu epilogues, skip-concat scale folding, dec3 scale folded
    into the f32 mask_out kernel): masks must agree with the f32 model at
    ≥0.99 IoU on trained-scene tiles, and ground-truth IoU must not
    regress (measured 0.9999 / 0.9984-vs-0.9983 on the committed
    fixture)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from train_xunet_fakeworld import build_tiles
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=150, n_buildings=120, seed=4)
    boxes = build_tiles(world, 4, 256, 64.0, seed=123)   # held-out seed
    tiles = np.stack([world.render(b, 256, 256) for b in boxes])
    gt = np.stack([world.render_mask(b, 256, 256) for b in boxes]) > 0

    bundle = create_model("xunet_256", dtype=jnp.float32)
    bundle.params = load_params(XUNET_FIXTURE)
    qb = quantize_bundle(bundle, [tiles[:2]])   # family-dispatched
    assert qb.__class__.__name__ == "Int8XUnetBundle"

    x = preprocess_batch(jnp.asarray(tiles), out_size=256,
                         dtype=jnp.float32)
    mf = np.asarray(bundle.forward(bundle.params, x))[..., 0] > 0
    mq = np.asarray(qb.forward(qb.params, x))[..., 0] > 0
    iou_fq = (mf & mq).sum() / max((mf | mq).sum(), 1)
    iou_f = (mf & gt).sum() / max((mf | gt).sum(), 1)
    iou_q = (mq & gt).sum() / max((mq | gt).sum(), 1)
    assert iou_fq >= 0.99, iou_fq
    assert iou_q >= iou_f - 0.005, (iou_q, iou_f)


@pytest.mark.skipif(not os.path.exists(XUNET_FIXTURE),
                    reason="trained xunet fixture not present")
@pytest.mark.slow
def test_segment_geotiff_int8_self_calibrates(tmp_path):
    """segment_geotiff(quantize='int8') calibrates on the raster's own
    windows and produces the same stitched mask as the bf16 path."""
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    from aerial_image_recognition_tpu.pipeline.rasters import segment_geotiff

    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=150, n_buildings=120, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    bb = (21.0 - 64 * m2lon, 52.2 - 32 * m2lat,
          21.0 + 64 * m2lon, 52.2 + 32 * m2lat)
    img = world.render(bb, 512, 256)     # [256,512]: 2 windows, stitch covered
    path = str(tmp_path / "area.tif")
    px_lon = (bb[2] - bb[0]) / 512
    px_lat = (bb[3] - bb[1]) / 256
    write_geotiff(path, img, (bb[0], px_lon, 0.0, bb[3], 0.0, -px_lat),
                  4326)
    kw = dict(window=256, batch=2, params=XUNET_FIXTURE)
    mask_f = segment_geotiff(path, **kw)
    mask_q = segment_geotiff(path, quantize="int8", **kw)
    inter = (mask_f & mask_q).sum()
    union = (mask_f | mask_q).sum()
    assert union > 0 and inter / union >= 0.99


def test_int8_composes_with_multiscale(bundles):
    """Multiscale union inference (the archived-generation mode,
    extra.multiscale) over the int8 trunk: Int8Bundle.forward is called at
    each scale like the bf16 model; per-tile detection counts must match
    exactly on trained-scene tiles (measured: identical counts, scores
    within 0.003)."""
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    cfg = DetectorConfig(confidence_threshold=0.4, dtype="float32")
    cfg.extra["multiscale"] = [0.85, 1.0, 1.15]
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (len(tiles), 1))
    det_f, _, _ = build_detect_step(cfg, batch=len(tiles), bundle=bundle,
                                    model_size=SIZE)(jnp.asarray(tiles),
                                                     bounds)
    det_q, _, _ = build_detect_step(cfg, batch=len(tiles), bundle=qb,
                                    model_size=SIZE)(jnp.asarray(tiles),
                                                     bounds)
    n_f = np.asarray(det_f.valid).sum(axis=1)
    n_q = np.asarray(det_q.valid).sum(axis=1)
    assert n_f.sum() >= 12
    np.testing.assert_array_equal(n_q, n_f)


def test_int8_composes_with_src_resize(bundles):
    """The XYZ production geometry (source windows device-resized into the
    model — reference xyz_handler.py:102-175; 864→640 in production): the
    quad stems correctly disable (hwc layout) and the int8 trunk runs
    behind the fused resize. Per-tile counts within ±1 of bf16 on
    trained-scene tiles (measured: 1 borderline delta in 12 tiles, scores
    within 0.002)."""
    import math as _math
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * _math.cos(_math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    src = np.stack([world.render((lon - 24 * m2lon, lat - 24 * m2lat,
                                  lon + 24 * m2lon, lat + 24 * m2lat),
                                 130, 130)
                    for lon, lat, _ in world.cars[:12]])
    cfg = DetectorConfig(confidence_threshold=0.4, dtype="float32")
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (len(src), 1))
    outs = {}
    for name, b in (("f", bundle), ("q", qb)):
        step = build_detect_step(cfg, batch=len(src), bundle=b,
                                 src_size=130, model_size=SIZE)
        assert step.input_layout == "hwc"   # quad stems must disable
        det, _, _ = step(jnp.asarray(src), bounds)
        outs[name] = np.asarray(det.valid).sum(axis=1)
    assert outs["f"].sum() >= 12
    assert int(np.abs(outs["f"] - outs["q"]).max()) <= 1


def test_int8_yolov7_base_matches_f32():
    """int8 PTQ of the yolov7-BASE trunk (full ELAN taps, MPConv
    transitions, parallel-5/9/13 SPPCSPC, BN-less RepConv deploy convs —
    all silu): decoded outputs must track the f32 model on realistic
    random upstream weights (the arch-differential generator), since no
    trained base fixture exists. Stems stay bf16 (the 4-conv stride
    1/2/1/2 stem has no quad lowering; supports_s2d2 must say so)."""
    from aerial_image_recognition_tpu.models.upstream_spec import (
        YOLOV7_BASE_SPEC, make_state_dict)
    from aerial_image_recognition_tpu.models.import_torch import (
        import_torch_state, yolov7_base_mapping, yolov7_detect_from_torch)
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    sd = make_state_dict(YOLOV7_BASE_SPEC, nc=1, seed=7)
    variables = import_torch_state(sd, yolov7_base_mapping())
    variables = yolov7_detect_from_torch(sd, variables, detect_idx=105)
    bundle = create_model("yolov7_base", dtype=jnp.float32)
    bundle.params = variables

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    qb = quantize_bundle(bundle, [imgs], model_size=64)
    assert not qb.supports_s2d2()
    with pytest.raises(NotImplementedError):
        qb.forward_s2d2(qb.params, jnp.zeros((1, 16, 16, 48), jnp.uint8))

    x = preprocess_batch(jnp.asarray(imgs), out_size=64, dtype=jnp.float32)
    bf, sf = map(np.asarray, bundle.forward(bundle.params, x))
    bq, sq = map(np.asarray, qb.forward(qb.params, x))
    assert float(np.abs(sf - sq).max()) < 0.02
    conf = np.repeat(sf > 0.3, 4, -1).reshape(bf.shape)
    assert conf.any() and float(np.abs(bf - bq)[conf].max()) < 2.0
    assert float(np.corrcoef(sf.ravel(), sq.ravel())[0, 1]) > 0.999


@pytest.mark.slow
def test_int8_yolov8_mid_depth_matches_f32():
    """int8 v8 at scale 'm' (depth 2/4/6 C2f stacks, width 0.75 — the
    channel/depth resolution rules the trained-v8n parity test can't
    exercise): decoded outputs track f32 on realistic random upstream
    weights, pinning _v8_trunk's _n(depth) module bookkeeping across
    scales."""
    from aerial_image_recognition_tpu.models.upstream_spec import (
        make_state_dict, yolov8_spec)
    from aerial_image_recognition_tpu.models.import_torch import (
        import_torch_state, yolov8_mapping)
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    sd = make_state_dict(yolov8_spec("m"), nc=2, seed=11)
    n_c2f = {"c2f1": 2, "c2f2": 4, "c2f3": 4, "c2f4": 2,
             "fpn4": 2, "fpn3": 2, "pan4": 2, "pan5": 2}
    variables = import_torch_state(sd, yolov8_mapping(n_c2f))
    bundle = create_model("yolov8m", dtype=jnp.float32)
    bundle.params = variables

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    qb = quantize_bundle(bundle, [imgs], model_size=64)
    x = preprocess_batch(jnp.asarray(imgs), out_size=64, dtype=jnp.float32)
    bf, sf = map(np.asarray, bundle.forward(bundle.params, x))
    bq, sq = map(np.asarray, qb.forward(qb.params, x))
    assert float(np.abs(sf - sq).max()) < 0.05
    assert float(np.corrcoef(sf.ravel(), sq.ravel())[0, 1]) > 0.99
    conf = np.repeat((sf.max(-1) > 0.3)[..., None], 4, -1)   # nc=2
    if conf.any():
        assert float(np.abs(bf - bq)[conf].max()) < 2.0


@pytest.mark.slow
def test_int8_self_calibration_turnkey(tmp_path, bundles):
    """VERDICT r3 item 2 — turnkey int8: extra.quantize='int8' with NO
    calibration self-calibrates on the scan's own first batches, passes the
    first-batch parity gate and hot-swaps to the int8 program; subsequent
    detections match the bf16 set (detection_sets_agree)."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline.inference import (
        SelfQuantizingStep, build_detect_step, detection_sets_agree)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)

    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"      # no quantize_calib → self-calibrate
    cfg.extra["quantize_calib_batches"] = 2
    step = build_detect_step(cfg, batch=4, model_size=SIZE)
    assert isinstance(step, SelfQuantizingStep)
    assert step.quantize_state == "calibrating"

    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (4, 1))
    out0 = step(jnp.asarray(tiles[0:4]), bounds)
    assert step.quantize_state == "calibrating"     # 1 of 2 batches
    step(jnp.asarray(tiles[4:8]), bounds)
    assert step.quantize_state == "int8", step.fallback_reason
    assert step.parity is not None and step.parity["matched"] >= 1
    assert step.bundle.__class__.__name__ == "Int8Bundle"

    # post-swap batches run the int8 program and still match bf16
    out2 = step(jnp.asarray(tiles[8:12]), bounds)
    cfg_b = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    ref = build_detect_step(cfg_b, batch=4, model_size=SIZE)(
        jnp.asarray(tiles[8:12]), bounds)
    ok, stats = detection_sets_agree(ref, out2)
    assert ok, stats
    # and the calibration batches' own (bf16) results were already final
    assert int(np.asarray(out0[0].valid).sum()) >= 4


def test_int8_self_calibration_rejects_donate(tmp_path, bundles):
    """donate=True cannot compose with self-calibration: the shim replays
    calibration inputs (host absmax copies, the parity reference batch
    through the int8 rebuild), which donation would have freed. The guard
    fails loudly at build time instead of reading donated memory."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, _, _ = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)
    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"      # no quantize_calib → self-calibrate
    with pytest.raises(ValueError, match="donate"):
        build_detect_step(cfg, batch=4, model_size=SIZE, bundle=bundle,
                          donate=True)


def test_int8_self_calibration_fallback(tmp_path, bundles, monkeypatch):
    """Parity-gate failure (simulated) falls back to bf16 silently: the
    scan continues, state records the reason, results stay bf16-exact."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline import inference
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)

    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"
    cfg.extra["quantize_calib_batches"] = 1
    step = inference.build_detect_step(cfg, batch=4, model_size=SIZE)
    monkeypatch.setattr(inference, "detection_sets_agree",
                        lambda a, b, **kw: (False, {"forced": True}))
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (4, 1))
    step(jnp.asarray(tiles[0:4]), bounds)
    assert step.quantize_state == "bf16-fallback"
    assert "parity" in step.fallback_reason
    # still serves detections, in bf16
    out = step(jnp.asarray(tiles[4:8]), bounds)
    assert step.bundle.__class__.__name__ != "Int8Bundle"
    assert int(np.asarray(out[0].valid).sum()) >= 4


def test_int8_self_calibration_waits_for_detections(tmp_path, bundles):
    """VERDICT r4 weak-1 regression: detection-FREE first batches (ocean,
    forest, cloud) must NOT flip the swap on a vacuous 0-vs-0 parity pass.
    Calibration keeps running bf16 past quantize_calib_batches until a
    detection-bearing reference batch exists; the gate then validates on
    real detections (matched >= 1)."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)

    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"
    cfg.extra["quantize_calib_batches"] = 2
    step = build_detect_step(cfg, batch=4, model_size=SIZE)
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (4, 1))
    empty = jnp.zeros((4, SIZE, SIZE, 3), jnp.uint8)
    for _ in range(3):          # > quantize_calib_batches empty batches
        out = step(empty, bounds)
        assert int(np.asarray(out[0].valid).sum()) == 0  # truly empty
        # round-4 behavior would have swapped here on parity {0,0,0}
        assert step.quantize_state == "calibrating"
        assert step.parity is None
    step(jnp.asarray(tiles[0:4]), bounds)   # first detection-bearing batch
    assert step.quantize_state == "int8", step.fallback_reason
    assert step.parity["total_a"] >= 1 and step.parity["matched"] >= 1


def test_int8_self_calibration_bounded_settles_bf16(tmp_path, bundles):
    """The bounded-wait semantic: after quantize_calib_wait_batches
    detection-free batches the step settles on bf16 ('bf16-fallback',
    reason recorded) — never an unvalidated int8 swap. An int8 program
    calibrated on degenerate content can silently DROP detections (this
    very scenario, zeros calibration, demonstrated it), so later
    detection-bearing batches must still run the bf16 program and find
    their cars."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)

    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"
    cfg.extra["quantize_calib_batches"] = 1
    cfg.extra["quantize_calib_wait_batches"] = 2
    step = build_detect_step(cfg, batch=4, model_size=SIZE)
    bounds = jnp.tile(jnp.asarray(
        [[20.999, 52.199, 21.001, 52.201]], jnp.float32), (4, 1))
    empty = jnp.zeros((4, SIZE, SIZE, 3), jnp.uint8)
    step(empty, bounds)
    assert step.quantize_state == "calibrating"
    step(empty, bounds)                      # hits the wait bound
    assert step.quantize_state == "bf16-fallback"
    assert "no detections" in step.fallback_reason
    assert step.parity is None
    assert step.bundle.__class__.__name__ != "Int8Bundle"
    # detections later in the scan are NOT dropped — bf16 still finds them
    out = step(jnp.asarray(tiles[0:4]), bounds)
    assert int(np.asarray(out[0].valid).sum()) >= 4


def test_int8_self_calibration_on_dp_mesh(tmp_path, bundles):
    """Turnkey self-quantization composed with the data-parallel mesh
    (VERDICT r4 weak-3): calibration's host readback of a SHARDED image
    batch (np.asarray on the mesh layout), the int8 rebuild compiled over
    the same mesh kwargs, and post-swap int8-vs-bf16 parity on sharded
    batches."""
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.parallel.mesh import make_mesh
    from aerial_image_recognition_tpu.pipeline.inference import (
        SelfQuantizingStep, build_detect_step, detection_sets_agree)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)
    mesh = make_mesh()                      # 8 CPU devices (conftest)
    batch = 8

    cfg = DetectorConfig(confidence_threshold=0.4, params_path=params_path)
    cfg.extra["quantize"] = "int8"
    cfg.extra["quantize_calib_batches"] = 1
    step = build_detect_step(cfg, batch=batch, model_size=SIZE, mesh=mesh)
    assert isinstance(step, SelfQuantizingStep)
    assert step.input_shardings is not None
    bounds_np = np.tile(np.asarray(
        [[20.999, 52.199, 21.001, 52.201]], np.float32), (batch, 1))
    imgs = jax.device_put(step.pack_images(tiles[:8]),
                          step.input_shardings[0])
    bnds = jax.device_put(bounds_np, step.input_shardings[1])
    step(imgs, bnds)            # calibrates on the sharded batch
    assert step.quantize_state == "int8", step.fallback_reason
    assert step.parity["total_a"] >= 1 and step.parity["matched"] >= 1
    assert step.bundle.__class__.__name__ == "Int8Bundle"
    assert step.input_shardings is not None   # int8 rebuild kept the mesh

    # post-swap: sharded int8 batches still match the (mesh-compiled) bf16
    # step's detections
    imgs2 = jax.device_put(step.pack_images(tiles[4:12]),
                           step.input_shardings[0])
    out_q = step(imgs2, bnds)
    out_f = step.base_step(imgs2, bnds)
    ok, stats = detection_sets_agree(out_f, out_q)
    assert ok and stats["matched"] >= 1, stats


@pytest.mark.slow
def test_int8_turnkey_full_scan(tmp_path, bundles):
    """Config-driven turnkey composition: CarDetector builds its own step
    from {quantize: int8} with NO calibration file, self-calibrates on the
    scan's first batch, switches to int8 mid-scan, and the final GeoJSON
    still clears the quality bar (recall@3m ≥ 0.8, precision ≥ 0.7)."""
    from aerial_image_recognition_tpu.fetch.fake import (
        FakeTileServer, FakeWorld)
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    from aerial_image_recognition_tpu.gio.geojson import (
        read_geojson, write_geojson)
    from aerial_image_recognition_tpu.models.registry import save_params
    from aerial_image_recognition_tpu.pipeline.detector import CarDetector
    bundle, qb, tiles = bundles
    params_path = str(tmp_path / "w.npz")
    save_params(bundle.params, params_path)
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    srv = FakeTileServer(world)
    srv.start()
    try:
        half_lon, half_lat = 95 * m2lon, 65 * m2lat
        ring = [[21.0 - half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 - half_lat],
                [21.0 + half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 + half_lat],
                [21.0 - half_lon, 52.2 - half_lat]]
        frame = str(tmp_path / "aoi.geojson")
        write_geojson({"type": "FeatureCollection", "features": [{
            "type": "Feature", "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [ring]}}]},
            frame)
        fetcher = WMSFetcher(srv.base_url + "/wms", layer="fake",
                             size=(SIZE, SIZE), num_workers=8,
                             submit_spacing=0.0)
        det = CarDetector(str(tmp_path), {
            "frame_path": frame, "tile_size_meters": 48.0,
            "tile_overlap": 0.25, "confidence_threshold": 0.4,
            "duplicate_distance": 2.0, "batch_size": 16,
            "device_batch": 8, "checkpoint_interval": 10**9,
            "model_input_size": (SIZE, SIZE),
            "params_path": params_path,
            "extra": {"quantize": "int8", "quantize_calib_batches": 1},
        }, fetcher=fetcher)
        det.detect(force_restart=True)
        fetcher.close()
        assert det.last_step.quantize_state == "int8", \
            det.last_step.fallback_reason
        doc = read_geojson(os.path.join(str(tmp_path), "output",
                                        "detections_results.geojson"))
        found = np.array([f["geometry"]["coordinates"]
                          for f in doc["features"]], np.float64)
        assert len(found) > 0
        cars = world.cars
        inside = ((np.abs(cars[:, 0] - 21.0) < half_lon - 5 * m2lon)
                  & (np.abs(cars[:, 1] - 52.2) < half_lat - 5 * m2lat))
        t_m = np.stack([(cars[inside][:, 0] - 21.0) / m2lon,
                        (cars[inside][:, 1] - 52.2) / m2lat], 1)
        f_m = np.stack([(found[:, 0] - 21.0) / m2lon,
                        (found[:, 1] - 52.2) / m2lat], 1)
        d = np.sqrt(((t_m[:, None] - f_m[None]) ** 2).sum(-1))
        assert float((d.min(axis=1) < 3.0).mean()) >= 0.8
        assert float((d.min(axis=0) < 3.0).mean()) >= 0.7
    finally:
        srv.stop()
