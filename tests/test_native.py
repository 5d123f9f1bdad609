"""Native fastgeo (C++) kernels vs their python references."""

import time

import numpy as np
import pytest

from aerial_image_recognition_tpu.utils.native import (
    dedup_grid_native, points_in_rings_native, load,
)
from aerial_image_recognition_tpu.post.dedup import dedup_host
from aerial_image_recognition_tpu.geo.polygon import points_in_rings


pytestmark = pytest.mark.skipif(load() is None,
                                reason="g++ unavailable — native disabled")


def test_native_dedup_matches_python(rng):
    n = 3000
    lon = 21.0 + rng.random(n) * 0.01
    lat = 52.2 + rng.random(n) * 0.01
    conf = rng.random(n).astype(np.float32)
    native = dedup_host(lon, lat, conf, 2.0, use_native=True)
    python = dedup_host(lon, lat, conf, 2.0, use_native=False)
    np.testing.assert_array_equal(native, python)
    assert 0 < native.sum() < n


def test_native_dedup_radius_zero(rng):
    lon = 21.0 + rng.random(10) * 0.01
    lat = 52.2 + rng.random(10) * 0.01
    keep = dedup_host(lon, lat, rng.random(10), 0.0)
    assert keep.all()


def test_native_dedup_scales(rng):
    n = 200_000
    lon = 21.0 + rng.random(n) * 0.05
    lat = 52.2 + rng.random(n) * 0.05
    conf = rng.random(n).astype(np.float32)
    t0 = time.perf_counter()
    keep = dedup_host(lon, lat, conf, 1.0, use_native=True)
    dt = time.perf_counter() - t0
    assert keep.sum() > 0
    assert dt < 5.0     # city-scale dedup in single-digit seconds


def test_native_point_in_polygon_matches_numpy(rng):
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    pts = rng.random((500, 2)) * 12 - 1
    ref = points_in_rings(pts, [outer, hole])
    got = points_in_rings_native(pts, [outer, hole])
    np.testing.assert_array_equal(got, ref)
