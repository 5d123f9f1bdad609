"""First-party GeoPackage IO (gio/geopackage.py) — the reference shipped
its heatmap artifact and SamGeo2 vectors as GDAL-written .gpkg files."""

import os
import sqlite3

import numpy as np
import pytest

from aerial_image_recognition_tpu.gio.geopackage import (
    decode_wkb, encode_wkb, read_gpkg, write_gpkg,
)

REF_GPKG = "/root/reference/output/warsaw/hex_heatmap_output.gpkg"


@pytest.mark.parametrize("geom", [
    {"type": "Point", "coordinates": [21.0, 52.2]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 2.0],
                                           [3.0, 1.0]]},
    {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
        [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]]]},
])
def test_wkb_roundtrip(geom):
    back, used = decode_wkb(encode_wkb(geom))
    assert used == len(encode_wkb(geom))
    assert back["type"] == geom["type"]
    np.testing.assert_allclose(
        np.asarray(back["coordinates"], dtype=object).tolist()
        if geom["type"] == "MultiPolygon" else back["coordinates"],
        geom["coordinates"])


def test_gpkg_feature_roundtrip(tmp_path):
    feats = [
        {"type": "Feature",
         "properties": {"count": 3, "mean_confidence": 0.75,
                        "name": "hex_a", "flag": True},
         "geometry": {"type": "Polygon", "coordinates": [
             [[21.0, 52.2], [21.001, 52.2], [21.001, 52.201],
              [21.0, 52.2]]]}},
        {"type": "Feature",
         "properties": {"count": 1, "mean_confidence": 0.5,
                        "name": "hex_b", "flag": False},
         "geometry": {"type": "Polygon", "coordinates": [
             [[21.01, 52.21], [21.011, 52.21], [21.011, 52.211],
              [21.01, 52.21]]]}},
    ]
    p = str(tmp_path / "out.gpkg")
    write_gpkg(p, feats, layer="hexes", geometry_type="POLYGON")

    fc = read_gpkg(p)                       # layer autodetected
    assert fc["layer"] == "hexes" and len(fc["features"]) == 2
    f0 = fc["features"][0]
    assert f0["properties"]["count"] == 3
    assert f0["properties"]["name"] == "hex_a"
    np.testing.assert_allclose(f0["geometry"]["coordinates"],
                               feats[0]["geometry"]["coordinates"])

    # mandatory tables carry the same schema rows the reference artifact
    # does (gpkg_contents data_type, geometry_columns z/m, srs trio)
    con = sqlite3.connect(p)
    cur = con.cursor()
    assert cur.execute("PRAGMA application_id").fetchone()[0] == 1196444487
    assert list(cur.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents")) == [
            ("hexes", "features", 4326)]
    assert list(cur.execute(
        "SELECT table_name, column_name, geometry_type_name, srs_id, z, m "
        "FROM gpkg_geometry_columns")) == [
            ("hexes", "geom", "POLYGON", 4326, 0, 0)]
    srs = list(cur.execute("SELECT srs_id, organization FROM "
                           "gpkg_spatial_ref_sys ORDER BY srs_id"))
    assert srs == [(-1, "NONE"), (0, "NONE"), (4326, "EPSG")]
    # extents recorded
    mnx, mxx = cur.execute(
        "SELECT min_x, max_x FROM gpkg_contents").fetchone()
    assert mnx == pytest.approx(21.0) and mxx == pytest.approx(21.011)
    con.close()


def test_gpkg_other_epsg_registered(tmp_path):
    p = str(tmp_path / "p.gpkg")
    write_gpkg(p, [{"type": "Feature", "properties": {"v": 1},
                    "geometry": {"type": "Point",
                                 "coordinates": [500000.0, 5700000.0]}}],
               layer="pts", geometry_type="POINT", srs_id=2180)
    con = sqlite3.connect(p)
    rows = dict(con.execute("SELECT srs_id, organization FROM "
                            "gpkg_spatial_ref_sys"))
    assert rows[2180] == "EPSG"
    con.close()
    fc = read_gpkg(p, "pts")
    assert fc["features"][0]["geometry"]["coordinates"] == [500000.0,
                                                            5700000.0]


@pytest.mark.skipif(not os.path.exists(REF_GPKG),
                    reason="reference artifact not present")
def test_reader_walks_reference_artifact():
    """Our reader understands the GDAL-written schema of the reference's
    actual shipped artifact (its feature table is empty — data was
    gitignored — but layer discovery and row walking must work)."""
    fc = read_gpkg(REF_GPKG)
    assert fc["layer"] == "hex_heatmap_output"
    assert fc["features"] == []


def test_automask_writes_gpkg(tmp_path):
    """automask --out-polygons x.gpkg → the SamGeo2 vector-GPKG slot
    (x_arch/car_recognition_on_tiff.py raster_to_vector)."""
    from aerial_image_recognition_tpu.gio.geotiff import GeoTiff
    from aerial_image_recognition_tpu.pipeline.automask import (
        automask_geotiff)

    img = np.zeros((96, 96, 3), np.uint8)
    img[10:30, 10:40, 0] = 255
    gt = GeoTiff(data=img, transform=(21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5),
                 epsg=4326)

    def fake_segment(params, imgs):
        return (imgs[..., :1].astype(np.float32) / 255.0)

    p = str(tmp_path / "inst.gpkg")
    inst = automask_geotiff(gt, window=48, batch=4,
                            segment_fn=fake_segment, params=None,
                            min_area_px=50, stability_min=0.5,
                            output_polygons=p)
    assert len(inst) == 1
    fc = read_gpkg(p)
    assert fc["layer"] == "instances" and len(fc["features"]) == 1
    f = fc["features"][0]
    assert {"instance", "stability", "score", "area_px"} <= set(
        f["properties"])
    ring = np.asarray(f["geometry"]["coordinates"][0])
    assert (ring[:, 0] >= 21.0).all()


def test_hex_heatmap_writes_gpkg(tmp_path):
    from aerial_image_recognition_tpu.post.heatmap import hex_heatmap

    recs = [{"lon": 21.0 + 0.0001 * i, "lat": 52.2, "confidence": 0.9}
            for i in range(5)]
    p = str(tmp_path / "heat.gpkg")
    hex_heatmap(recs, hex_size_m=50.0, output_geojson=p)
    fc = read_gpkg(p)
    assert fc["layer"] == "hex_heatmap_output"
    assert len(fc["features"]) >= 1
    f = fc["features"][0]
    assert f["geometry"]["type"] == "Polygon"
    assert f["properties"]["count"] >= 1


def test_gpkg_column_inference_across_features(tmp_path):
    """Column types come from the first NON-None value per key, the column
    set is the union over features, and booleans survive the round trip —
    a leading None must not demote REAL to TEXT (sqlite TEXT affinity
    would hand back the string '0.7')."""
    from aerial_image_recognition_tpu.gio.geopackage import (
        read_gpkg, write_gpkg)

    geom = {"type": "Point", "coordinates": [1.0, 2.0]}
    feats = [
        {"type": "Feature", "properties": {"score": None, "flag": True},
         "geometry": geom},
        {"type": "Feature",
         "properties": {"score": 0.7, "flag": False, "late": 3},
         "geometry": geom},
    ]
    p = str(tmp_path / "u.gpkg")
    write_gpkg(p, feats, layer="pts", geometry_type="POINT")
    back = read_gpkg(p)["features"]
    assert back[0]["properties"]["score"] is None
    assert back[1]["properties"]["score"] == 0.7
    assert isinstance(back[1]["properties"]["score"], float)
    assert back[0]["properties"]["flag"] is True
    assert back[1]["properties"]["flag"] is False
    assert back[0]["properties"]["late"] is None   # union column, backfilled
    assert back[1]["properties"]["late"] == 3
