"""Fetch plane tests — hermetic, against the in-process fake tile server."""

import numpy as np
import pytest

from aerial_image_recognition_tpu.fetch.fake import (
    FakeTileServer, FakeWorld, FaultConfig,
)
from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher
from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
from aerial_image_recognition_tpu.fetch.wmts import WMTSFetcher, parse_capabilities
from aerial_image_recognition_tpu.fetch.cache import TileCache
from aerial_image_recognition_tpu.geo import generate_tiles


@pytest.fixture(scope="module")
def server():
    srv = FakeTileServer(FakeWorld(n_cars=50, seed=7))
    srv.start()
    yield srv
    srv.stop()


def test_xyz_get_image_geometry(server):
    f = XYZFetcher(server.xyz_template, zoom=18, num_workers=8,
                   subdomains=("",))
    try:
        img = f.get_image(52.2, 21.0, target_size_m=64.0)
        assert img is not None
        # bounds span ≈ 64 m
        w, s, e, n = img.bounds
        assert abs((e - w) * 111319.9 * np.cos(np.radians(52.2)) - 64.0) < 0.5
        assert abs((n - s) * 111319.9 - 64.0) < 0.5
        assert img.pixels.dtype == np.uint8
        assert img.pixels.shape[0] == img.pixels.shape[1] == img.meta["crop_size"]
        assert img.pixels.mean() > 10   # actually rendered, not black
    finally:
        f.close()


def test_xyz_cache_hits(server):
    f = XYZFetcher(server.xyz_template, zoom=18, num_workers=8,
                   subdomains=("",))
    try:
        f.get_image(52.2, 21.0)
        before = server.request_count
        f.get_image(52.2, 21.0)    # all tiles cached
        hits, misses = f.cache.stats()
        assert hits > 0
        assert server.request_count == before
    finally:
        f.close()


def test_wms_fetch_batch_and_preview(server):
    f = WMSFetcher(server.base_url + "/wms", layer="fake", size=(128, 128),
                   num_workers=4, submit_spacing=0.0)
    try:
        tiles = generate_tiles((20.995, 52.195, 21.0, 52.2), 64.0, 0.2)[:6]
        out = f.fetch_batch([tuple(t) for t in tiles])
        assert all(o is not None for o in out)
        assert out[0].pixels.shape == (128, 128, 3)
        pv = f.preview_geojson([tuple(t) for t in tiles])
        assert len(pv["features"]) == 6
        assert pv["properties"]["stats"]["successes"] >= 6
    finally:
        f.close()


def test_wms_retry_sweep_recovers_failures(server):
    server.faults.drop_rate = 0.3
    try:
        f = WMSFetcher(server.base_url + "/wms", layer="fake",
                       size=(64, 64), num_workers=4, submit_spacing=0.0,
                       retries=3)
        tiles = generate_tiles((20.995, 52.195, 21.0, 52.2), 64.0, 0.2)[:8]
        out = f.fetch_batch([tuple(t) for t in tiles],
                            retry_delays=(0.05, 0.1))
        # layered retry (per-request backoff + failed-tile sweep) must
        # recover everything at 30% drop rate
        assert all(o is not None for o in out)
        assert f.http.stats.failures > 0   # failures actually happened
        assert len(f.http.failures) > 0
        analysis = f.http.failures.analyze()
        assert analysis["by_type"].get("HTTP500", 0) > 0
        f.close()
    finally:
        server.faults.drop_rate = 0.0


def test_rate_limit_respected(server):
    # high rate: the transport layer may transparently absorb some 429s,
    # this guarantees our retry loop sees at least one
    server.faults.rate_limit_rate = 0.8
    server.faults.retry_after = 0.01
    try:
        f = WMSFetcher(server.base_url + "/wms", layer="fake",
                       size=(64, 64), num_workers=2, submit_spacing=0.0)
        out = f.fetch_batch([(20.999, 52.199, 21.0, 52.2)] * 16,
                            retry_delays=(0.05,))
        assert all(o is not None for o in out)
        assert f.http.stats.rate_limited > 0
        f.close()
    finally:
        server.faults.rate_limit_rate = 0.0


def test_wmts_capabilities_and_neighborhood(server):
    f = WMTSFetcher(server.base_url + "/wmts", layer="fake",
                    matrix_set="FAKE2180", crs=2180, num_workers=4)
    try:
        zooms = f.available_zooms()
        assert len(zooms) == 2
        # pixel span = scale · 0.00028
        assert zooms[0][1] == pytest.approx(1785.7142857142856 * 0.00028)
        img = f.fetch_neighborhood(21.0, 52.2, zooms[0][0], radius=1)
        assert img is not None
        assert img.pixels.shape == (768, 768, 3)
        w, s, e, n = img.bounds
        assert w < 21.0 < e and s < 52.2 < n
    finally:
        f.close()


def test_wmts_axis_order_swap():
    """EPSG:2180 capabilities publish TopLeftCorner north-first (authority
    axis order); parse must swap to internal (easting, northing). Real
    geoportal.gov.pl behavior — test_wmts.py:31-39 hardcodes the swapped
    values."""
    doc = """<?xml version="1.0"?>
<Capabilities xmlns="http://www.opengis.net/wmts/1.0"
              xmlns:ows="http://www.opengis.net/ows/1.1">
 <Contents><TileMatrixSet>
  <ows:Identifier>M</ows:Identifier>
  <ows:SupportedCRS>urn:ogc:def:crs:EPSG::2180</ows:SupportedCRS>
  <TileMatrix>
   <ows:Identifier>z0</ows:Identifier>
   <ScaleDenominator>1000</ScaleDenominator>
   <TopLeftCorner>850000 100000</TopLeftCorner>
   <TileWidth>256</TileWidth><TileHeight>256</TileHeight>
   <MatrixWidth>10</MatrixWidth><MatrixHeight>10</MatrixHeight>
  </TileMatrix>
 </TileMatrixSet></Contents></Capabilities>""".encode()
    m = parse_capabilities(doc, "M")["z0"]
    assert m.top_left == (100000.0, 850000.0)          # auto: swapped
    m_xy = parse_capabilities(doc, "M", axis_order="xy")["z0"]
    assert m_xy.top_left == (850000.0, 100000.0)       # trust document
    # east-first CRS (e.g. EPSG:3857) must NOT swap in auto mode
    doc_3857 = doc.replace(b"EPSG::2180", b"EPSG::3857")
    m_merc = parse_capabilities(doc_3857, "M")["z0"]
    assert m_merc.top_left == (850000.0, 100000.0)
    # missing SupportedCRS falls back to default_epsg
    doc_nocrs = doc.replace(
        b"<ows:SupportedCRS>urn:ogc:def:crs:EPSG::2180</ows:SupportedCRS>",
        b"")
    m_d = parse_capabilities(doc_nocrs, "M", default_epsg=2180)["z0"]
    assert m_d.top_left == (100000.0, 850000.0)


def test_tile_cache_lru_eviction():
    c = TileCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1      # refresh 'a'
    c.put("c", 3)               # evicts 'b'
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_fake_world_renders_cars_consistently(server):
    # The same geographic window requested twice renders identically
    world = server.world
    img1 = world.render((20.999, 52.199, 21.001, 52.201), 256, 256)
    img2 = world.render((20.999, 52.199, 21.001, 52.201), 256, 256)
    np.testing.assert_array_equal(img1, img2)
    # a window containing a known car has bright pixels
    lon, lat, _ = world.cars[0]
    img = world.render((lon - 3e-4, lat - 3e-4, lon + 3e-4, lat + 3e-4),
                       256, 256)
    assert img.max() >= 230


def test_fake_world_hard_fraction():
    """hard_fraction renders opt-in hard cases (accuracy A/B of the
    TTA/multiscale modes); 0.0 must keep every existing world
    byte-identical, and the hard flags/rendering must be deterministic."""
    kw = dict(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
              n_cars=60, seed=4)
    bb = (20.9985, 52.1985, 21.0015, 52.2015)
    base = FakeWorld(**kw)
    off = FakeWorld(hard_fraction=0.0, **kw)
    np.testing.assert_array_equal(base.render(bb, 512, 512),
                                  off.render(bb, 512, 512))
    assert not off.car_hard.any()
    hard = FakeWorld(hard_fraction=0.5, **kw)
    hard2 = FakeWorld(hard_fraction=0.5, **kw)
    # same seed => same car layout as the base world, same hard flags
    np.testing.assert_array_equal(hard.cars, base.cars)
    np.testing.assert_array_equal(hard.car_hard, hard2.car_hard)
    assert 10 < hard.car_hard.sum() < 50
    img_b = base.render(bb, 512, 512)
    img_h = hard.render(bb, 512, 512)
    np.testing.assert_array_equal(img_h, hard2.render(bb, 512, 512))
    assert (img_h != img_b).any()
    # hard car bodies are LOW-contrast: the bright (230,235,240) body
    # count drops relative to the all-easy render
    bright = (img_b == np.array([230, 235, 240], np.uint8)).all(-1).sum()
    bright_h = (img_h == np.array([230, 235, 240], np.uint8)).all(-1).sum()
    assert bright_h < bright
    # the low-contrast body color and the canopy occluder both appear
    assert (img_h == np.array([152, 155, 162], np.uint8)).all(-1).any()
    assert (img_h == np.array([46, 58, 40], np.uint8)).all(-1).any()


def test_wms_capabilities_validate_ok(server):
    """Startup negotiation (reference wms_handler.py:83-90): a correctly
    configured fetcher validates against the advertised capabilities."""
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    f = WMSFetcher(server.base_url + "/wms", layer="fake",
                   size=(64, 64), num_workers=2, submit_spacing=0.0)
    caps = f.validate()
    f.close()
    assert caps is not None
    assert "fake" in caps["layers"]
    assert "EPSG:4326" in caps["srs"]
    assert "image/jpeg" in caps["formats"]


def test_wms_capabilities_validate_rejects_typos(server):
    """A malformed layer / SRS / format fails AT STARTUP with the available
    options listed — not per-tile across the whole scan."""
    import pytest as _pytest
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    for kw, msg in ((dict(layer="n0pe"), "layer"),
                    (dict(layer="fake", srs="EPSG:9999"), "SRS"),
                    (dict(layer="fake", image_format="image/webp"),
                     "format")):
        f = WMSFetcher(server.base_url + "/wms", size=(64, 64),
                       num_workers=2, submit_spacing=0.0, **kw)
        with _pytest.raises(ValueError, match=msg):
            f.validate()
        f.close()


def test_wms_capabilities_validate_tolerant_when_unavailable(server):
    """No capabilities endpoint (or transient failure) must NOT block the
    scan: validate() returns None and GetMap proceeds as before."""
    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    f = WMSFetcher(server.base_url + "/nothing", layer="x",
                   size=(64, 64), num_workers=2, retries=0,
                   submit_spacing=0.0)
    assert f.validate() is None
    f.close()


def test_parse_wms_capabilities_130_namespaced():
    """1.3.0 documents are namespaced and use CRS; the parser is
    namespace-agnostic and inheritance-unions the CRS sets."""
    from aerial_image_recognition_tpu.fetch.wms import parse_wms_capabilities
    xml = b"""<?xml version="1.0"?>
<WMS_Capabilities xmlns="http://www.opengis.net/wms" version="1.3.0">
  <Capability>
    <Request><GetMap><Format>image/png</Format></GetMap></Request>
    <Layer>
      <CRS>EPSG:4326</CRS>
      <Layer><Name>ortho</Name><CRS>EPSG:2180</CRS></Layer>
    </Layer>
  </Capability>
</WMS_Capabilities>"""
    caps = parse_wms_capabilities(xml)
    assert caps["layers"] == {"ortho"}
    assert caps["srs"] == {"EPSG:4326", "EPSG:2180"}
    assert caps["formats"] == {"image/png"}


def test_progress_bar_renders_and_counts():
    """First-party tqdm-equivalent (reference detector.py:128-133,188-193):
    rate/ETA line, postfix counters, in-place redraw, final newline."""
    import io
    from aerial_image_recognition_tpu.runtime.observability import (
        ProgressBar, _FetchProgress)
    buf = io.StringIO()
    bar = ProgressBar(100, desc="tiles", stream=buf, enabled=True,
                      min_interval=0.0)
    fp = _FetchProgress(bar)
    fp.update(3)
    bar.update(50)
    bar.set_postfix(det=7)
    bar.close()
    out = buf.getvalue()
    assert "tiles:" in out and "50/100" in out
    assert "fetched=3" in out and "det=7" in out
    assert out.endswith("\n")
    # disabled bar writes nothing (non-tty default under pytest)
    buf2 = io.StringIO()
    bar2 = ProgressBar(10, stream=buf2)
    bar2.update(5)
    bar2.close()
    assert buf2.getvalue() == ""
