"""Slippy-tile math, tile grids, point grids, polygon ops."""

import math

import numpy as np

from aerial_image_recognition_tpu.geo import (
    tile_xy, tile_bounds, tile_ul, meters_per_pixel, EARTH_CIRCUMFERENCE,
    generate_tiles, generate_point_grid, points_in_rings, ring_area,
    polygon_bounds, tm_forward, utm_params,
)


def test_meters_per_pixel_zoom21():
    # Matches reference simple_detector.py:34-35
    mpp = meters_per_pixel(21)
    assert abs(mpp - EARTH_CIRCUMFERENCE / 2**21 / 256) < 1e-12
    assert abs(mpp - 0.07464553543474242) < 1e-9
    # per-latitude correction (simple_detector.py:328)
    assert abs(meters_per_pixel(21, lat=52.0) - mpp * math.cos(math.radians(52.0))) < 1e-12


def test_tile_xy_center_of_world():
    x, y = tile_xy(0.0, 0.0, 10)
    assert (int(x), int(y)) == (512, 512)
    x, y = tile_xy(-180.0, 0.0, 3)
    assert (int(x), int(y)) == (0, 4)


def test_tile_bounds_roundtrip():
    # The tile containing the center of any tile's bounds is that tile.
    for (x, y, z) in [(1168318, 689402, 21), (524288, 524288, 20), (0, 0, 5)]:
        w, s, e, n = tile_bounds(x, y, z)
        cx, cy = tile_xy((w + e) / 2, (s + n) / 2, z)
        assert (int(cx), int(cy)) == (x, y)
        assert w < e and s < n


def test_tile_ul_matches_bounds_adjacency():
    # East edge of tile x == west edge of tile x+1 (exactness of the formula)
    w1, s1, e1, n1 = tile_bounds(100, 200, 12)
    w2, _, _, _ = tile_bounds(101, 200, 12)
    assert abs(e1 - w2) < 1e-12


def test_generate_tiles_geometry():
    bounds = (20.98, 52.20, 21.02, 52.24)  # ~2.7 x 4.4 km around Warsaw
    tiles = generate_tiles(bounds, tile_size_meters=64.0, overlap=0.2)
    assert tiles.ndim == 2 and tiles.shape[1] == 4
    # Tile count matches the reference's while-loop walk
    p = utm_params(34)
    ux0, uy0 = tm_forward(bounds[0], bounds[1], p)
    ux1, uy1 = tm_forward(bounds[2], bounds[3], p)
    step = 64.0 * 0.8
    nx = len(np.arange(ux0, ux1, step))
    ny = len(np.arange(uy0, uy1, step))
    assert len(tiles) == nx * ny
    # Every tile spans ~64 m ground in the projected frame
    w, s, e, n = tiles[len(tiles) // 2]
    ex0, ny0 = tm_forward(w, s, p)
    ex1, ny1 = tm_forward(e, n, p)
    assert abs((ex1 - ex0) - 64.0) < 0.01
    assert abs((ny1 - ny0) - 64.0) < 0.01
    # Row-major ordering: consecutive tiles step east by step meters
    e0 = tm_forward(tiles[0][0], tiles[0][1], p)[0]
    e1_ = tm_forward(tiles[1][0], tiles[1][1], p)[0]
    assert abs((e1_ - e0) - step) < 0.01


def test_point_grid_spacing_and_containment():
    # Square AOI polygon ~0.02° around a point
    ring = np.array([[20.99, 52.21], [21.01, 52.21], [21.01, 52.23],
                     [20.99, 52.23], [20.99, 52.21]])
    bounds = polygon_bounds([ring])
    pts = generate_point_grid(bounds, [[ring]], spacing_meters=60.0)
    assert len(pts) > 100
    assert points_in_rings(pts, [ring]).all()
    # Spacing between lon-adjacent points ≈ 60 m at this latitude
    lat_c = (bounds[1] + bounds[3]) / 2
    dlon = np.diff(np.unique(pts[:, 0]))[0]
    assert abs(dlon * 111319.9 * math.cos(math.radians(lat_c)) - 60.0) < 0.01


def test_points_in_rings_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    pts = np.array([[5, 5], [2, 2], [11, 5], [4.5, 5.0]])
    inside = points_in_rings(pts, [outer, hole])
    assert list(inside) == [False, True, False, False]


def test_ring_area_sign():
    ccw = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert ring_area(ccw) > 0
    assert ring_area(ccw[::-1]) < 0


def test_tile_grid_covers_all_corners_despite_convergence():
    """Meridian convergence bends constant-lon edges in UTM; the grid must
    cover all four projected AOI corners (the reference's two-corner
    extent drops a tile column at the NW/SW corner ~1 deg off the central
    meridian — _script/utils.py:40-41)."""
    import numpy as np

    from aerial_image_recognition_tpu.geo.tiles import tile_grid_utm
    from aerial_image_recognition_tpu.geo.tmerc import tm_forward

    # zone 34 (lon0=21): AOI ~2 deg east of the central meridian, tall
    bounds = (22.9, 50.0, 23.0, 51.0)
    xs, ys, params, _ = tile_grid_utm(bounds, 64.0, overlap=0.2)
    minx, miny, maxx, maxy = bounds
    cx, cy = tm_forward(np.array([minx, minx, maxx, maxx]),
                        np.array([miny, maxy, miny, maxy]), params)
    # every corner easting/northing inside [first origin, last tile end]
    assert xs[0] <= cx.min() and cx.max() <= xs[-1] + 64.0
    assert ys[0] <= cy.min() and cy.max() <= ys[-1] + 64.0
