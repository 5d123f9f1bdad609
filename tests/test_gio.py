"""GeoJSON + shapefile IO round trips."""

import numpy as np
import pytest

from aerial_image_recognition_tpu.gio.geojson import (
    detections_to_feature_collection, feature_collection_to_detections,
    coverage_to_feature_collection, write_geojson, read_geojson, read_polygons,
)
from aerial_image_recognition_tpu.gio.shapefile import (
    ShapeRecord, SHP_POINT, SHP_POLYGON, read_shapefile, write_shapefile,
    read_polygons_shp, detections_to_shapefile, read_dbf,
)


RECORDS = [
    {"lon": 21.001, "lat": 52.201, "confidence": 0.91, "class": "car"},
    {"lon": 21.002, "lat": 52.202, "confidence": 0.48, "class": "car"},
]


def test_geojson_roundtrip(tmp_path):
    fc = detections_to_feature_collection(RECORDS, metadata={"run": "t"})
    p = str(tmp_path / "out.geojson")
    write_geojson(fc, p)
    back = feature_collection_to_detections(read_geojson(p))
    assert back[0]["lon"] == pytest.approx(21.001)
    assert back[1]["confidence"] == pytest.approx(0.48)
    assert read_geojson(p)["metadata"]["run"] == "t"


def test_coverage_fc():
    fc = coverage_to_feature_collection([(0, 0, 1, 1), (1, 0, 2, 1)])
    assert len(fc["features"]) == 2
    ring = fc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]


def test_read_polygons_multipolygon():
    fc = {"type": "FeatureCollection", "features": [{
        "type": "Feature",
        "geometry": {"type": "MultiPolygon", "coordinates": [
            [[[0, 0], [1, 0], [1, 1], [0, 0]]],
            [[[5, 5], [6, 5], [6, 6], [5, 5]]],
        ]}, "properties": {}}]}
    polys = read_polygons(fc)
    assert len(polys) == 2
    assert polys[0][0].shape == (4, 2)


def test_shapefile_point_roundtrip(tmp_path):
    p = str(tmp_path / "pts.shp")
    detections_to_shapefile(p, RECORDS)
    back = read_shapefile(p)
    assert len(back) == 2
    assert back[0].shape_type == SHP_POINT
    np.testing.assert_allclose(back[0].points[0], [21.001, 52.201])
    assert back[0].attributes["CONF"] == pytest.approx(0.91, abs=1e-6)
    assert back[0].attributes["CLASS"] == "car"


def test_shapefile_polygon_roundtrip(tmp_path):
    outer = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], dtype=np.float64)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4]], dtype=np.float64)
    rec = ShapeRecord(SHP_POLYGON,
                      np.concatenate([outer, hole]), parts=[0, 4],
                      attributes={"NAME": "aoi"})
    p = str(tmp_path / "poly.shp")
    write_shapefile(p, [rec])
    polys = read_polygons_shp(p)
    assert len(polys) == 1
    rings = polys[0]
    assert len(rings) == 2
    # rings closed on write
    np.testing.assert_array_equal(rings[0][0], rings[0][-1])
    # containment works end to end with geo.polygon
    from aerial_image_recognition_tpu.geo import points_in_rings
    inside = points_in_rings(np.array([[2.0, 2.0], [5.0, 5.0], [11.0, 1.0]]),
                             rings)
    assert list(inside) == [True, False, False]


def test_dbf_types(tmp_path):
    recs = [ShapeRecord(SHP_POINT, np.array([[1.0, 2.0]]),
                        attributes={"I": 7, "F": 1.25, "B": True, "S": "żółw"})]
    p = str(tmp_path / "t.shp")
    write_shapefile(p, recs)
    rows = read_dbf(str(tmp_path / "t.dbf"))
    assert rows[0]["I"] == 7
    assert rows[0]["F"] == pytest.approx(1.25)
    assert rows[0]["B"] is True
    assert rows[0]["S"] == "żółw"
