"""Quad-stem lowering (ops/quadstem.py): layout, parity, and the fused
detect step producing identical detection sets with and without it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aerial_image_recognition_tpu.models.layers import space_to_depth2
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.ops.quadstem import host_s2d2


def _quad_layout_reference(px):
    """Element-by-element definition of the quad layout:
    out[R, C, (e, dy, f, dx, c)] = px[4R + 2e + dy, 4C + 2f + dx, c]."""
    h, w, c = px.shape
    out = np.empty((h // 4, w // 4, 16 * c), px.dtype)
    for R in range(h // 4):
        for C in range(w // 4):
            k = 0
            for e in range(2):
                for dy in range(2):
                    for f in range(2):
                        for dx in range(2):
                            out[R, C, k:k + c] = px[4 * R + 2 * e + dy,
                                                    4 * C + 2 * f + dx]
                            k += c
    return out


def test_host_s2d2_matches_layout_definition():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    got = host_s2d2(px)
    assert got.shape == (6, 8, 48)
    np.testing.assert_array_equal(got, _quad_layout_reference(px))
    # batched form and the in-place variant agree
    from aerial_image_recognition_tpu.ops.quadstem import host_s2d2_into
    b = rng.integers(0, 256, (3, 64, 64, 3)).astype(np.uint8)
    hb = host_s2d2(b)
    for i in range(3):
        out = np.empty((16, 16, 48), np.uint8)
        host_s2d2_into(b[i], out)
        np.testing.assert_array_equal(out, hb[i])


@pytest.mark.parametrize("name", ["yolov7_itcvd", "yolov8_tokyo"])
def test_forward_s2d2_matches_standard_forward(name):
    """bundle.forward_s2d2 on host-relayouted uint8 == bundle.forward on
    x/255, to bf16 rounding (the /255 folds into the quad stem). Covers
    both stem families: yolov7-tiny (leaky) and yolov8 (silu)."""
    rng = np.random.default_rng(1)
    xu = rng.integers(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    bundle = create_model(name, dtype=jnp.bfloat16, seed=3)
    rb, rs = bundle.forward(bundle.params,
                            jnp.asarray(xu, jnp.bfloat16) / 255.0)
    qb, qs = bundle.forward_s2d2(bundle.params, jnp.asarray(host_s2d2(xu)))
    np.testing.assert_allclose(np.asarray(qb, np.float32),
                               np.asarray(rb, np.float32),
                               atol=0.05, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(qs, np.float32),
                               np.asarray(rs, np.float32),
                               atol=1e-3)


def _detections(step, imgs, bounds):
    det, lon, lat = step(imgs, bounds)
    out = []
    for i in range(imgs.shape[0]):
        mask = np.asarray(det.valid[i])
        scores = np.asarray(det.scores[i])[mask]
        order = np.argsort(-scores)
        out.append((np.asarray(det.boxes[i])[mask][order],
                    scores[order],
                    np.asarray(lon[i])[mask][order],
                    np.asarray(lat[i])[mask][order]))
    return out


FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "fixtures",
    "yolov7_tiny_fakeworld.npz")


@pytest.mark.skipif(not __import__("os").path.exists(FIXTURE),
                    reason="trained fixture not present")
def test_detect_step_quad_stem_detection_parity():
    """The production fused step with layout='s2d2' finds the same cars at
    the same coordinates as the standard layout on trained weights."""
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    params_path = FIXTURE
    kw = dict(model_path="yolov7_itcvd", params_path=params_path,
              confidence_threshold=0.4, dtype="float32")
    cfg_q = DetectorConfig(**kw)
    cfg_s = DetectorConfig(**kw, extra={"quad_stem": False})
    # 96 px tiles at the fixture's training scale (0.5 m/px)
    step_q = build_detect_step(cfg_q, batch=2, src_size=96, model_size=96)
    step_s = build_detect_step(cfg_s, batch=2, src_size=96, model_size=96)
    assert step_q.input_layout == "s2d2"
    assert step_s.input_layout == "hwc"

    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * np.cos(np.radians(52.2)))
    m2lat = 1.0 / 111319.9
    imgs, bounds = [], []
    for k in range(2):
        cx = 21.0 + (k - 0.5) * 60 * m2lon
        bb = (cx - 24 * m2lon, 52.2 - 24 * m2lat,
              cx + 24 * m2lon, 52.2 + 24 * m2lat)
        imgs.append(world.render(bb, 96, 96))
        bounds.append(bb)
    imgs = np.stack(imgs)
    bounds = np.asarray(bounds, np.float32)

    dq = _detections(step_q, imgs, bounds)   # __call__ packs to s2d2
    ds = _detections(step_s, imgs, bounds)
    assert sum(len(d[1]) for d in ds) > 0, "no detections on trained weights"
    for (qb, qs, qlon, qlat), (sb, ss, slon, slat) in zip(dq, ds):
        assert len(qs) == len(ss)
        np.testing.assert_allclose(qs, ss, atol=5e-3)
        np.testing.assert_allclose(qlon, slon, atol=1e-7)
        np.testing.assert_allclose(qlat, slat, atol=1e-7)


def test_assemble_batches_s2d2_layout():
    from aerial_image_recognition_tpu.fetch.xyz import TileImage
    from aerial_image_recognition_tpu.ingest.pipeline import (
        assemble_batches)

    rng = np.random.default_rng(3)
    tiles = []
    for i in range(3):
        px = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
        tiles.append((i, TileImage(px, (0.0, 0.0, 1.0, 1.0))))
    batches = list(assemble_batches(iter(tiles), batch_size=2, src_size=64,
                                    layout="s2d2"))
    assert batches[0].images.shape == (2, 16, 16, 48)
    np.testing.assert_array_equal(batches[0].images[0],
                                  host_s2d2(tiles[0][1].pixels))
    assert batches[1].n_valid == 1


def test_use_quad_stem_gating():
    """Pixel-space options and resize paths must fall back to the
    standard stems (the quad layout skips preprocess entirely)."""
    from aerial_image_recognition_tpu.pipeline.inference import (
        use_quad_stem)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    b = create_model("yolov7_itcvd", dtype=jnp.bfloat16, seed=0)
    assert use_quad_stem(b, DetectorConfig())
    assert not use_quad_stem(b, DetectorConfig(extra={"tta": True}))
    assert not use_quad_stem(b, DetectorConfig(
        extra={"multiscale": [0.85, 1.0]}))
    assert not use_quad_stem(b, DetectorConfig(
        extra={"enhance_shadows": True}))
    assert not use_quad_stem(b, DetectorConfig(extra={"quad_stem": False}))
    # resize (src != model) and crop paths keep the [B,S,S,3] contract
    assert not use_quad_stem(b, DetectorConfig(), src_size=864)
    assert not use_quad_stem(b, DetectorConfig(), crop_size=864)
    assert use_quad_stem(b, DetectorConfig(), src_size=96, model_size=96)
    assert not use_quad_stem(b, DetectorConfig(), model_size=90)  # %4


def test_host_s2d2_inverse_roundtrip():
    """host_s2d2_inverse exactly inverts host_s2d2 (the int8
    self-calibration path recovers plain images from quad-layout ingest)."""
    import numpy as np
    from aerial_image_recognition_tpu.ops.quadstem import (
        host_s2d2, host_s2d2_inverse)
    rng = np.random.default_rng(0)
    px = rng.integers(0, 255, (3, 96, 96, 3), dtype=np.uint8)
    np.testing.assert_array_equal(host_s2d2_inverse(host_s2d2(px)), px)
    np.testing.assert_array_equal(host_s2d2_inverse(host_s2d2(px[0])), px[0])
