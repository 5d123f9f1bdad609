"""Geodesy core tests.

The Krüger-series transverse Mercator is validated three independent ways
(no pyproj in this environment):
  1. round-trip forward∘inverse ≈ identity to sub-micrometer,
  2. agreement with an independently-implemented Snyder (1987) series oracle,
  3. the central-meridian northing equals the numerically integrated
     meridian arc length.
"""

import math

import numpy as np
import pytest

from aerial_image_recognition_tpu.geo import (
    WGS84, EPSG_2180, tm_forward, tm_inverse, utm_params, utm_epsg,
    transform_points, lonlat_to_webmercator, webmercator_to_lonlat,
)


# ---------------------------------------------------------------- oracles

def snyder_tm_forward(lon, lat, params):
    """Snyder (1987) 'Map Projections — A Working Manual' eqs 8-9..8-13.

    Independent formulation (series in e^2, not the third flattening n) used
    purely as a cross-check oracle; accurate to ~mm within a UTM zone.
    """
    ell = params.ellipsoid
    a, e2 = ell.a, ell.e2
    ep2 = e2 / (1 - e2)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - params.lon0)

    sphi, cphi = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1 - e2 * sphi**2)
    T = (sphi / cphi) ** 2
    C = ep2 * cphi**2
    A = lam * cphi
    M = meridian_arc_series(phi, a, e2)

    x = params.k0 * N * (A + (1 - T + C) * A**3 / 6
                         + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120)
    y = params.k0 * (M + N * (sphi / cphi) * (
        A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
        + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    return x + params.false_easting, y + params.false_northing


def meridian_arc_series(phi, a, e2):
    return a * ((1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
                - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
                + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
                - (35 * e2**3 / 3072) * np.sin(6 * phi))


def meridian_arc_numeric(lat_deg, a, e2, steps=200001):
    """Numerically integrate the meridian radius of curvature (Simpson)."""
    phi = np.linspace(0.0, math.radians(lat_deg), steps)
    integrand = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    h = phi[1] - phi[0]
    w = np.ones(steps); w[1:-1:2] = 4; w[2:-1:2] = 2
    return float(np.sum(w * integrand) * h / 3.0)


# ------------------------------------------------------------------ tests

LON_LAT_SAMPLES = [
    (21.0122, 52.2297),    # Warsaw
    (4.9041, 52.3676),     # Amsterdam
    (-118.2437, 34.0522),  # Los Angeles
    (-3.7038, 40.4168),    # Madrid
    (151.2093, -33.8688),  # Sydney (southern hemisphere)
    (19.0, 52.0),          # exactly on EPSG:2180 central meridian
]


def test_utm_epsg_selection():
    # Matches reference _script/utils.py:16-23
    assert utm_epsg(21.0, 52.0) == 32634
    assert utm_epsg(4.9, 52.4) == 32631
    assert utm_epsg(-118.24, 34.05) == 32611
    assert utm_epsg(151.2, -33.87) == 32756


@pytest.mark.parametrize("lon,lat", LON_LAT_SAMPLES)
def test_roundtrip(lon, lat):
    zone = min(60, max(1, int((lon + 180) / 6) + 1))
    p = utm_params(zone, south=lat < 0)
    e, n = tm_forward(lon, lat, p)
    lon2, lat2 = tm_inverse(e, n, p)
    assert abs(lon2 - lon) < 1e-11
    assert abs(lat2 - lat) < 1e-11


@pytest.mark.parametrize("lon,lat", LON_LAT_SAMPLES)
def test_against_snyder_oracle(lon, lat):
    zone = min(60, max(1, int((lon + 180) / 6) + 1))
    p = utm_params(zone, south=lat < 0)
    e1, n1 = tm_forward(lon, lat, p)
    e2_, n2 = snyder_tm_forward(lon, lat, p)
    assert abs(e1 - e2_) < 0.005   # two independent series agree to <5 mm
    assert abs(n1 - n2) < 0.005


def test_epsg2180_roundtrip_and_oracle():
    lon, lat = 21.0122, 52.2297
    e, n = tm_forward(lon, lat, EPSG_2180)
    # CS92 places Warsaw around (637, 486) km, well inside valid range
    assert 400000 < e < 900000 and 100000 < n < 800000
    es, ns = snyder_tm_forward(lon, lat, EPSG_2180)
    assert abs(e - es) < 0.01 and abs(n - ns) < 0.01
    lon2, lat2 = tm_inverse(e, n, EPSG_2180)
    assert abs(lon2 - lon) < 1e-10 and abs(lat2 - lat) < 1e-10


def test_central_meridian_northing_is_meridian_arc():
    p = utm_params(34)
    for lat in (0.0, 30.0, 52.2297, 80.0):
        _, n = tm_forward(p.lon0, lat, p)
        arc = meridian_arc_numeric(lat, WGS84.a, WGS84.e2)
        assert abs(n - p.k0 * arc) < 0.002, lat


def test_central_meridian_easting_exact():
    p = utm_params(31)
    e, _ = tm_forward(p.lon0, 52.0, p)
    assert abs(e - 500000.0) < 1e-6


def test_vectorized_matches_scalar():
    p = utm_params(34)
    lons = np.array([s[0] for s in LON_LAT_SAMPLES[:4]])
    lats = np.array([s[1] for s in LON_LAT_SAMPLES[:4]])
    ev, nv = tm_forward(lons, lats, p)
    for i in range(4):
        es, ns = tm_forward(float(lons[i]), float(lats[i]), p)
        assert abs(ev[i] - es) < 1e-9 and abs(nv[i] - ns) < 1e-9


def test_jax_variant_matches_numpy():
    # The jnp code path must be algorithmically identical to numpy. Run it
    # in x64 (XLA's f64 transcendentals differ from libm by ~1e-8 relative,
    # i.e. centimeters on absolute UTM northings — ample here). The on-device
    # f32 hot path only ever computes *relative* pixel→geo offsets; absolute
    # georef anchors are host-side f64 numpy.
    import jax
    import jax.numpy as jnp
    p = utm_params(34)
    lon, lat = 21.0122, 52.2297
    e_np, n_np = tm_forward(lon, lat, p)
    jax.config.update("jax_enable_x64", True)
    try:
        e_j, n_j = tm_forward(jnp.asarray(lon), jnp.asarray(lat), p, xp=jnp)
        lon_j, lat_j = tm_inverse(e_j, n_j, p, xp=jnp)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert abs(float(e_j) - e_np) < 0.1
    assert abs(float(n_j) - n_np) < 0.1
    # XLA's transcendental approximations bound the jax round trip at
    # ~1e-6 deg (≈0.1 m); the numpy f64 path (used for absolute georef)
    # round-trips to 1e-11 deg (tested above).
    assert abs(float(lon_j) - lon) < 2e-6
    assert abs(float(lat_j) - lat) < 2e-6


def test_transform_points_hub():
    x, y = transform_points(21.0122, 52.2297, 4326, 2180)
    lon, lat = transform_points(x, y, 2180, 4326)
    assert abs(lon - 21.0122) < 1e-10 and abs(lat - 52.2297) < 1e-10
    # 4326 → 3857 → 4326
    mx, my = transform_points(21.0122, 52.2297, 4326, 3857)
    lon2, lat2 = transform_points(mx, my, 3857, 4326)
    assert abs(lon2 - 21.0122) < 1e-12 and abs(lat2 - 52.2297) < 1e-12


def test_webmercator_known_values():
    x, y = lonlat_to_webmercator(0.0, 0.0)
    assert abs(x) < 1e-9 and abs(y) < 1e-9
    x, y = lonlat_to_webmercator(180.0, 0.0)
    assert abs(x - 20037508.342789244) < 1e-6
    lon, lat = webmercator_to_lonlat(20037508.342789244, 20037508.342789244)
    assert abs(lon - 180.0) < 1e-9
    assert abs(lat - 85.05112877980659) < 1e-9


def test_tm_forward_antimeridian_wrap():
    """Longitudes are equivalent mod 360: zone-60 data expressed as
    -179.9 must project identically to +180.1 (dedup across the seam)."""
    from aerial_image_recognition_tpu.geo.tmerc import tm_forward, utm_params

    p = utm_params(60)                      # lon0 = +177
    x1, y1 = tm_forward(-179.9, -41.0, p)
    x2, y2 = tm_forward(180.1, -41.0, p)
    assert abs(float(x1) - float(x2)) < 1e-6
    assert abs(float(y1) - float(y2)) < 1e-6
    # and the easting is a sane near-zone value, not a wrapped garbage one
    assert 100_000 < float(x1) < 900_000
