"""Metric tile grids and scan-point grids over an AOI.

Deterministic grids are the unit of checkpoint/resume (tile index ↔ position
is a pure function of (AOI bounds, tile size, overlap) — same property the
reference relies on, _script/detector.py:156-237). Fully vectorized with
numpy; no loops over tiles.
"""

from typing import Sequence

import numpy as np

from aerial_image_recognition_tpu.geo.tmerc import (
    tm_forward, tm_inverse, utm_extent, utm_params_for)
from aerial_image_recognition_tpu.geo.polygon import points_in_polygon


def _utm_for_bounds(bounds):
    minx, miny, maxx, maxy = bounds
    return utm_params_for((minx + maxx) / 2.0, (miny + maxy) / 2.0)


def tile_grid_utm(bounds, tile_size_meters: float, overlap: float = 0.1):
    """UTM-space tile origins covering WGS84 ``bounds``.

    Returns (x_starts [Nx], y_starts [Ny], utm_params, epsg). Stepping is
    ``tile_size * (1 - overlap)`` starting at the projected min corner —
    the exact walk of reference TileGenerator.generate_tiles
    (_script/utils.py:43-63).
    """
    params, epsg = _utm_for_bounds(bounds)
    # full covering extent: meridian convergence bends constant-lon edges
    # in UTM, so the two-corner extent (which the reference uses,
    # _script/utils.py:40-41) can drop a tile column/row at the AOI edge
    # — a silent coverage gap at city scale (geo.tmerc.utm_extent)
    utm_minx, utm_miny, utm_maxx, utm_maxy = utm_extent(bounds, params)
    step = tile_size_meters * (1.0 - overlap)
    # while x < max: exclusive upper bound, same as the reference loop
    xs = np.arange(utm_minx, utm_maxx, step, dtype=np.float64)
    ys = np.arange(utm_miny, utm_maxy, step, dtype=np.float64)
    return xs, ys, params, epsg


def generate_tiles(bounds, tile_size_meters: float,
                   overlap: float = 0.1) -> np.ndarray:
    """WGS84 tile bboxes [N, 4] = (west, south, east, north) over ``bounds``.

    Vectorized equivalent of reference TileGenerator.generate_tiles
    (_script/utils.py:25-65): square tiles in the AOI-center UTM zone,
    fractional-overlap stepping, corners reprojected to WGS84. Row-major
    (y outer, x inner) ordering matches the reference's nested while loops,
    so checkpoint tile indices are interchangeable.
    """
    xs, ys, params, _ = tile_grid_utm(bounds, tile_size_meters, overlap)
    gx, gy = np.meshgrid(xs, ys)           # y outer, x inner
    x1 = gx.ravel()
    y1 = gy.ravel()
    x2 = x1 + tile_size_meters
    y2 = y1 + tile_size_meters
    w, s = tm_inverse(x1, y1, params)
    e, n = tm_inverse(x2, y2, params)
    return np.stack([w, s, e, n], axis=1)


def generate_point_grid(bounds, polygons: Sequence[Sequence[np.ndarray]],
                        spacing_meters: float = 60.0) -> np.ndarray:
    """Scan-point grid [N, 2] = (lon, lat) inside the AOI polygons.

    Vectorized equivalent of the monolith's grid (simple_detector.py:758-781):
    equirectangular spacing about the AOI center latitude
    (1° lat = 111319.9 m, lon scaled by cos(lat_center)), filtered by
    point-in-polygon. Row-major lat-outer ordering preserved for
    checkpoint-index compatibility.
    """
    minx, miny, maxx, maxy = bounds
    lat_center = (miny + maxy) / 2.0
    meters_to_lon = 1.0 / (111319.9 * np.cos(np.radians(lat_center)))
    meters_to_lat = 1.0 / 111319.9
    lons = np.arange(minx, maxx, spacing_meters * meters_to_lon)
    lats = np.arange(miny, maxy, spacing_meters * meters_to_lat)
    glon, glat = np.meshgrid(lons, lats)   # lat outer, lon inner
    pts = np.stack([glon.ravel(), glat.ravel()], axis=1)
    if polygons:
        mask = points_in_polygon(pts, list(polygons))
        pts = pts[mask]
    return pts
