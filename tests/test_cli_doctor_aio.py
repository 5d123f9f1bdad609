"""CLI surface, doctor diagnostic, asyncio fetch facade."""

import asyncio
import json
import os

import numpy as np
import pytest

from aerial_image_recognition_tpu.runtime.doctor import diagnose
from aerial_image_recognition_tpu.fetch.fake import FakeTileServer, FakeWorld
from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
from aerial_image_recognition_tpu.fetch.aio import AsyncWMS, AsyncXYZ


def test_doctor_reports_environment():
    d = diagnose(compile_check=False)
    assert "devices" in d and len(d["devices"]) >= 1
    assert d["fetch_plane"] is True
    assert isinstance(d["native_fastgeo"], bool)


def test_cli_help_and_parsing(capsys):
    from aerial_image_recognition_tpu.pipeline.cli import main
    with pytest.raises(SystemExit):
        main(["detect", "--help"])
    out = capsys.readouterr().out
    assert "--frame" in out and "--xyz-url" in out


def test_async_facades():
    srv = FakeTileServer(FakeWorld(n_cars=5))
    srv.start()
    try:
        xyz = AsyncXYZ(XYZFetcher(srv.xyz_template, zoom=15,
                                  num_workers=4, subdomains=("",)))
        wms = AsyncWMS(WMSFetcher(srv.base_url + "/wms", layer="f",
                                  size=(64, 64), num_workers=4,
                                  submit_spacing=0.0))

        async def run():
            img = await xyz.get_image(52.2, 21.0)
            batch = await wms.fetch_batch(
                [(20.999, 52.199, 21.0, 52.2)] * 3)
            return img, batch

        img, batch = asyncio.run(run())
        assert img is not None and img.pixels.dtype == np.uint8
        assert all(b is not None for b in batch)
        xyz.fetcher.close()
        wms.fetcher.close()
    finally:
        srv.stop()


def test_cli_override_parsing_extras():
    from aerial_image_recognition_tpu.pipeline.cli import _overrides
    import argparse
    ns = argparse.Namespace(
        base_dir=".", command="detect", force_restart=False,
        interactive=False, params_path=None, frame_path="x.shp",
        tta=True, multiscale="0.85,1,1.15", heatmap_hex_m=50.0,
        enhance_shadows=None, model_path=None,
        quantize="int8", quantize_calib="scales.json")
    out = _overrides(ns)
    assert out["multiscale"] == [0.85, 1.0, 1.15]
    assert out["tta"] is True and out["heatmap_hex_m"] == 50.0
    assert "enhance_shadows" not in out
    # DetectorConfig routes unknown keys into .extra
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    cfg = DetectorConfig().merged(out)
    assert cfg.extra["multiscale"] == [0.85, 1.0, 1.15]
    # --quantize/--quantize-calib ride the same route into cfg.extra, where
    # build_detect_step picks them up (pipeline/inference.py)
    assert cfg.extra["quantize"] == "int8"
    assert cfg.extra["quantize_calib"] == "scales.json"


@pytest.mark.slow
def test_cli_new_subcommands(tmp_path):
    """train/geotiff/automask subcommands parse; automask runs end-to-end
    through the CLI on a tiny raster."""
    from aerial_image_recognition_tpu.pipeline.cli import main
    for cmd in ("train", "geotiff", "automask"):
        with pytest.raises(SystemExit):
            main([cmd, "--help"])

    from aerial_image_recognition_tpu.gio.geotiff import write_geotiff
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:40, 16:48] = 200
    p = str(tmp_path / "in.tif")
    write_geotiff(p, img, (21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5), 4326)
    out_poly = str(tmp_path / "inst.geojson")
    rc = main(["automask", p, "--window", "64", "--min-area", "5",
               "--stability", "0.0", "--out-polygons", out_poly])
    assert rc == 0 and os.path.exists(out_poly)
    # --quantize int8 self-calibrates on the raster's own windows and runs
    # the same workflow over the quantized trunk
    rc = main(["automask", p, "--window", "64", "--min-area", "5",
               "--stability", "0.0", "--quantize", "int8",
               "--out-polygons", out_poly])
    assert rc == 0


def test_params_path_reaches_production_model(tmp_path):
    """--params must actually load the checkpoint into the detect step
    (round-1 advisor finding: it was parsed then dropped, so every scan ran
    random weights)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from aerial_image_recognition_tpu.models.registry import (
        create_model, save_params)
    from aerial_image_recognition_tpu.pipeline.cli import _overrides
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    ns = argparse.Namespace(
        base_dir=".", command="detect", force_restart=False,
        interactive=False, params_path="weights.npz", model_path=None)
    assert _overrides(ns)["params_path"] == "weights.npz"

    with pytest.raises(FileNotFoundError):
        create_model("yolov7_itcvd",
                     params_path=str(tmp_path / "missing.npz"))

    donor = create_model("yolov7_itcvd", dtype=jnp.float32, seed=3)
    ckpt = str(tmp_path / "w.npz")
    save_params(donor.params, ckpt)
    cfg = DetectorConfig(params_path=ckpt, dtype="float32")
    step = build_detect_step(cfg, batch=1, donate=False)
    got = jax.tree_util.tree_leaves(step.bundle.params)
    want = jax.tree_util.tree_leaves(donor.params)
    assert len(got) == len(want)
    assert all(np.allclose(a, b) for a, b in zip(want, got))


def test_xyz_save_preview(tmp_path):
    import json
    import numpy as np
    from aerial_image_recognition_tpu.fetch.xyz import TileImage, XYZFetcher
    f = XYZFetcher("http://unused/{z}/{x}/{y}", num_workers=2)
    tile = TileImage(np.zeros((4, 4, 3), np.uint8),
                     (21.0, 52.2, 21.001, 52.201), meta={"zoom": 21})
    p = str(tmp_path / "preview_tile.geojson")
    f.save_preview(tile, p)
    doc = json.load(open(p))
    assert doc["features"][0]["properties"]["type"] == "tile_boundary"
    ring = doc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]
    f.close()


def test_doctor_device_probe_times_out():
    """jax.devices() can hang (not fail) when a remote backend's transport
    wedges — observed live in round 3 (tunnel claim leg stuck for hours).
    The doctor must report that loudly instead of hanging itself."""
    import time as _time
    from aerial_image_recognition_tpu.runtime.doctor import (
        _devices_with_timeout)

    class HangingJax:
        @staticmethod
        def devices():
            _time.sleep(30)

    with pytest.raises(TimeoutError, match="wedged"):
        _devices_with_timeout(HangingJax, 0.5)

    class HealthyJax:
        @staticmethod
        def devices():
            return ["dev0"]

    assert _devices_with_timeout(HealthyJax, 5.0) == ["dev0"]
