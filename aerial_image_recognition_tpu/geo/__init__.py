"""Pure geodesy and tiling math.

Everything in this package is dependency-free (numpy only) with jax.numpy
variants for on-device hot paths. This replaces what the reference delegated
to pyproj / mercantile (see SURVEY.md §2.2): closed-form Web-Mercator and
Karney-series transverse-Mercator/UTM implemented directly so per-detection
georeferencing runs as vectorized XLA ops on TPU.
"""

from aerial_image_recognition_tpu.geo.ellipsoid import WGS84, GRS80
from aerial_image_recognition_tpu.geo.tmerc import (
    TMParams,
    tm_forward,
    tm_inverse,
    utm_params,
    utm_epsg,
    utm_zone,
    EPSG_2180,
)
from aerial_image_recognition_tpu.geo.webmercator import (
    lonlat_to_webmercator,
    webmercator_to_lonlat,
    tile_xy,
    tile_bounds,
    tile_ul,
    meters_per_pixel,
    EARTH_CIRCUMFERENCE,
)
from aerial_image_recognition_tpu.geo.crs import transform_points, crs_params
from aerial_image_recognition_tpu.geo.tiles import (
    generate_tiles,
    generate_point_grid,
    tile_grid_utm,
)
from aerial_image_recognition_tpu.geo.polygon import (
    points_in_polygon,
    points_in_rings,
    ring_area,
    polygon_bounds,
)

__all__ = [
    "WGS84", "GRS80",
    "TMParams", "tm_forward", "tm_inverse", "utm_params", "utm_epsg",
    "utm_zone", "EPSG_2180",
    "lonlat_to_webmercator", "webmercator_to_lonlat", "tile_xy",
    "tile_bounds", "tile_ul", "meters_per_pixel", "EARTH_CIRCUMFERENCE",
    "transform_points", "crs_params",
    "generate_tiles", "generate_point_grid", "tile_grid_utm",
    "points_in_polygon", "points_in_rings", "ring_area", "polygon_bounds",
]
