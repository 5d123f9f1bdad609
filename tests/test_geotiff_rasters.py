"""GeoTIFF IO + raster sliding-window workflows."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.gio.geotiff import (
    GeoTiff, read_geotiff, write_geotiff,
)
from aerial_image_recognition_tpu.pipeline.rasters import (
    detect_geotiff, iter_windows, mask_to_polygons, segment_geotiff,
)
from aerial_image_recognition_tpu.gio.geojson import read_geojson


TRANSFORM = (500000.0, 0.1, 0.0, 5788000.0, 0.0, -0.1)   # 10 cm/px UTM


def test_geotiff_roundtrip(tmp_path, rng):
    data = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, data, TRANSFORM, epsg=32634)
    gt = read_geotiff(p)
    np.testing.assert_array_equal(gt.data, data)
    assert gt.transform == pytest.approx(TRANSFORM)
    assert gt.epsg == 32634
    x, y = gt.pixel_to_geo(10, 20)
    assert x == pytest.approx(500001.0)
    assert y == pytest.approx(5787998.0)


def test_geotiff_single_band(tmp_path):
    data = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    p = str(tmp_path / "m.tif")
    write_geotiff(p, data, TRANSFORM, epsg=4326)
    gt = read_geotiff(p)
    np.testing.assert_array_equal(gt.data[:, :, 0], data)
    assert gt.epsg == 4326


def test_iter_windows_covers():
    corners = list(iter_windows(100, 100, 64, 32))
    assert (0, 0) in corners
    # edge-clamped windows reach the far boundary
    assert any(r + 64 == 100 for r, _ in corners)
    assert any(c + 64 == 100 for _, c in corners)


def test_mask_to_polygons_square_and_hole():
    mask = np.zeros((20, 20), np.uint8)
    mask[4:12, 5:15] = 1
    mask[7:9, 8:11] = 0      # hole
    rings = mask_to_polygons(mask)
    assert len(rings) == 2
    areas = []
    for ring in rings:
        x, y = ring[:, 0], ring[:, 1]
        areas.append(0.5 * abs(np.sum(x * np.roll(y, -1)
                                      - np.roll(x, -1) * y)))
    assert sorted(areas) == [6.0, 80.0]   # hole 3×2, outer 10×8


def test_detect_geotiff_runs(tmp_path, rng):
    """Mechanics test with a tiny step: window math + georef + output."""
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import (
        DetectStep, make_detect_fn)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    data = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    p = str(tmp_path / "scene.tif")
    write_geotiff(p, data, TRANSFORM, epsg=32634)

    cfg = DetectorConfig(confidence_threshold=0.3)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=64))
    step = DetectStep(bundle=bundle, fn=fn, batch=4, input_size=96,
                      model_size=64)
    out_path = str(tmp_path / "dets.geojson")
    recs = detect_geotiff(p, window=96, stride=96, detect_step=step,
                          output_geojson=out_path, dedup_m=2.0)
    assert os.path.exists(out_path)
    doc = read_geojson(out_path)
    assert doc["metadata"]["epsg"] == 32634
    for r in recs:   # detections land inside the raster extent
        assert 500000.0 <= r["x"] <= 500020.0
        assert 5787980.0 <= r["y"] <= 5788000.0


def test_segment_geotiff_runs(tmp_path, rng):
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import make_segment_fn
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    from aerial_image_recognition_tpu.models.xunet import XUnet

    data = rng.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    p = str(tmp_path / "scene.tif")
    write_geotiff(p, data, TRANSFORM, epsg=32634)

    # tiny xunet at 64px for CPU speed
    module = XUnet(out_channels=1, base=4, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3)), train=False)

    def seg_fn(prms, imgs):
        x = imgs.astype(jnp.float32) / 255.0
        return jax.nn.sigmoid(module.apply(prms, x, train=False))

    mask_path = str(tmp_path / "mask.tif")
    poly_path = str(tmp_path / "polys.geojson")
    mask = segment_geotiff(p, window=64, batch=4,
                           segment_fn=jax.jit(seg_fn), params=params,
                           output_mask=mask_path,
                           output_polygons=poly_path)
    assert mask.shape == (100, 130)
    gt = read_geotiff(mask_path)
    assert gt.data.shape[:2] == (100, 130)
    assert os.path.exists(poly_path)


def test_segment_geotiff_nonmodel_window_stitches_correctly(tmp_path):
    """Windows smaller/larger than the model input (256) are resized INTO
    the executor (make_segment_fn) — so the probabilities must be resized
    BACK to window resolution before stitching. Round-3 review finding:
    the stitcher used to paste the upper-left model-resolution quadrant,
    silently misplacing every mask for window != 256."""
    import numpy as np
    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    from aerial_image_recognition_tpu.pipeline.rasters import segment_geotiff

    img = np.zeros((128, 256, 3), np.uint8)
    p = str(tmp_path / "in.tif")
    write_geotiff(p, img, (21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5), 4326)

    def fake_segment_fn(params, imgs):
        # model-resolution output: left half foreground, right half not
        b = np.asarray(imgs).shape[0]
        probs = np.zeros((b, 256, 256, 1), np.float32)
        probs[:, :, :128] = 1.0
        return probs

    mask = segment_geotiff(p, window=128, batch=2,
                           segment_fn=fake_segment_fn, params=None)
    assert mask.shape == (128, 256)
    # each 128-px window: left 64 columns set, right 64 clear
    for c0 in (0, 128):
        assert mask[:, c0:c0 + 64].all(), c0
        assert not mask[:, c0 + 64:c0 + 128].any(), c0


def test_segment_overlap_averages_out_window_borders(tmp_path):
    """Tiling-artifact mitigation: a U-Net's window-border pixels are its
    least-reliable outputs, and non-overlapping stitching leaves those
    seams in the mask. With stride < window, overlapping predictions
    average them out. Modeled with a fake executor whose windows are
    perfect (1.0) in the interior but dead (0.0) in an 8-px border."""
    import numpy as np
    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    from aerial_image_recognition_tpu.pipeline.rasters import (
        read_geotiff, stitch_probability_map)

    img = np.zeros((256, 512, 3), np.uint8)
    p = str(tmp_path / "in.tif")
    write_geotiff(p, img, (21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5), 4326)
    gt = read_geotiff(p)

    def fake_segment_fn(params, imgs):
        b = np.asarray(imgs).shape[0]
        probs = np.zeros((b, 256, 256, 1), np.float32)
        probs[:, 8:-8, 8:-8] = 1.0          # dead 8-px window border
        return probs

    seam = stitch_probability_map(gt, fake_segment_fn, None,
                                  window=256, stride=256)
    blended = stitch_probability_map(gt, fake_segment_fn, None,
                                     window=256, stride=128)
    interior = (slice(8, -8), slice(8, -8))   # raster's own border excluded
    # non-overlap: the column seam at 248..264 is dead through the interior
    assert float(seam[128, 250]) == 0.0
    # overlap: every interior pixel is covered by at least one window that
    # saw it away from a border
    assert float(blended[interior].min()) >= 0.5
    # and the overlap never degrades clean areas
    assert float(blended[128, 64]) == 1.0


def test_detect_geotiff_quantize_reaches_build(tmp_path, monkeypatch):
    """The geotiff verb's --quantize flags ride cfg.extra into
    build_detect_step: int8 without a calibration now builds the TURNKEY
    self-calibrating step (round-4 behavior; previously it raised)."""
    import numpy as np
    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    from aerial_image_recognition_tpu.pipeline import inference
    from aerial_image_recognition_tpu.pipeline.rasters import detect_geotiff

    p = str(tmp_path / "in.tif")
    write_geotiff(p, np.zeros((64, 64, 3), np.uint8),
                  (21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5), 4326)
    seen = {}
    real_build = inference.build_detect_step

    def spy(cfg, **kw):
        step = real_build(cfg, **kw)
        seen["quantize"] = cfg.extra.get("quantize")
        seen["step_type"] = type(step).__name__
        return step

    monkeypatch.setattr(inference, "build_detect_step", spy)
    detect_geotiff(p, window=64, stride=64, model="yolov7_itcvd",
                   quantize="int8")
    assert seen == {"quantize": "int8",
                    "step_type": "SelfQuantizingStep"}


# --- compressed-input compatibility (GDAL-written rasters in the wild are
# usually LZW or deflate with predictor=2 horizontal differencing; the
# reference read them through GDAL, x_arch/02_analyze_images cell 6) ------

def _aerial_like(rng, h, w, c):
    """Smooth gradient + noise: compresses like real imagery and grows the
    LZW table past the 9->10 bit width change."""
    base = (np.linspace(0, 255, w)[None, :, None]
            + np.linspace(0, 128, h)[:, None, None])
    a = np.clip(base + rng.normal(0, 12, (h, w, c)), 0, 255)
    return a.astype(np.uint8)


def test_geotiff_reads_libtiff_lzw_and_predictor(tmp_path, rng):
    Image = pytest.importorskip("PIL.Image")
    a = _aerial_like(rng, 200, 320, 3)
    gray = a[:, :, 0]
    cases = [
        ("lzw.tif", a, dict(compression="tiff_lzw")),
        ("lzw_p2.tif", a, dict(compression="tiff_lzw", tiffinfo={317: 2})),
        ("defl_p2.tif", a, dict(compression="tiff_deflate",
                                tiffinfo={317: 2})),
        ("lzw_gray_p2.tif", gray, dict(compression="tiff_lzw",
                                       tiffinfo={317: 2})),
    ]
    for name, arr, kw in cases:
        p = str(tmp_path / name)
        Image.fromarray(arr).save(p, **kw)
        got = read_geotiff(p).data
        want = arr if arr.ndim == 3 else arr[:, :, None]
        np.testing.assert_array_equal(got, want, err_msg=name)


def _lzw_encode(data: bytes) -> bytes:
    """Test-local TIFF-LZW encoder (MSB-first, early change) used to build
    a tiled fixture; independently validated by PIL/libtiff reading the
    assembled file in test_geotiff_tiled_lzw_predictor."""
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code, width):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258          # simulated decoder table length (drives width)
    first = True
    emit(256, width)
    w = b""

    def emitted_one():
        nonlocal first, dec_len, width
        if first:
            first = False
        else:
            dec_len += 1
            if dec_len == 511:
                width = 10
            elif dec_len == 1023:
                width = 11
            elif dec_len == 2047:
                width = 12

    for i in range(len(data)):
        ch = data[i:i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        emitted_one()
        table[wc] = next_code
        next_code += 1
        w = ch
        if next_code == 4093:          # reset before codes outgrow 12 bits
            emit(table[w], width)
            emitted_one()
            emit(256, width)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
            dec_len = 258
            first = True
            w = b""
    if w:
        emit(table[w], width)
        emitted_one()
    emit(257, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


@pytest.mark.slow
def test_geotiff_tiled_lzw_predictor(tmp_path, rng):
    """Hand-assembled tiled TIFF (libtiff via PIL only writes strips):
    LZW + predictor 2, 256-px tiles with edge-clamped coverage. PIL reads
    the same file as an independent check of the assembly + encoder."""
    import struct as st
    h, w, spp = 300, 520, 3
    a = _aerial_like(rng, h, w, spp)
    tw = th = 256
    tiles_x, tiles_y = (w + tw - 1) // tw, (h + th - 1) // th
    payloads = []
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            tile = np.zeros((th, tw, spp), np.uint8)
            sub = a[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            tile[:sub.shape[0], :sub.shape[1]] = sub
            diffed = tile.astype(np.int16)
            diffed[:, 1:] -= tile[:, :-1].astype(np.int16)
            payloads.append(_lzw_encode(
                (diffed & 0xFF).astype(np.uint8).tobytes()))

    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp), (259, 3, [5]),
        (262, 3, [2]), (277, 3, [spp]), (284, 3, [1]), (317, 3, [2]),
        (322, 4, [tw]), (323, 4, [th]),
        (324, 4, None),     # tile offsets (patched below)
        (325, 4, [len(p) for p in payloads]),
    ]
    n = len(tags)
    fmt_of = {3: "H", 4: "I"}
    ifd_end = 8 + 2 + n * 12 + 4
    # out-of-line area, then tile payloads
    blobs, cursor = {}, ifd_end
    ntiles = len(payloads)
    for tag, typ, vals in tags:
        count = ntiles if vals is None else len(vals)
        size = count * st.calcsize(fmt_of[typ])
        if size > 4:
            blobs[tag] = cursor
            cursor += size + (size % 2)
    tile_offs, here = [], cursor
    for p in payloads:
        tile_offs.append(here)
        here += len(p)
    buf = bytearray(st.pack("<2sHI", b"II", 42, 8))
    buf += st.pack("<H", n)
    for tag, typ, vals in tags:
        if vals is None:
            vals = tile_offs
        count = len(vals)
        raw = st.pack(f"<{count}{fmt_of[typ]}", *vals)
        if len(raw) > 4:
            buf += st.pack("<HHII", tag, typ, count, blobs[tag])
        else:
            buf += st.pack("<HHI", tag, typ, count) + raw.ljust(4, b"\0")
    buf += st.pack("<I", 0)
    pos = len(buf)
    for tag, typ, vals in tags:
        if tag in blobs:
            if vals is None:
                vals = tile_offs
            raw = st.pack(f"<{len(vals)}{fmt_of[typ]}", *vals)
            assert pos == blobs[tag]
            buf += raw + b"\0" * (len(raw) % 2)
            pos += len(raw) + (len(raw) % 2)
    for p in payloads:
        buf += p
    path = str(tmp_path / "tiled_lzw_p2.tif")
    with open(path, "wb") as f:
        f.write(bytes(buf))

    got = read_geotiff(path).data
    np.testing.assert_array_equal(got, a)
    try:
        from PIL import Image
    except ImportError:
        return
    pil = np.array(Image.open(path))
    np.testing.assert_array_equal(pil, a)
