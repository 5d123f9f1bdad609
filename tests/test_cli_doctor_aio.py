"""CLI surface, doctor diagnostic, asyncio fetch facade."""

import asyncio
import json

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
