"""Cross-tile detection dedup: confidence-greedy metric radius suppression.

Semantics match the reference's R-tree NMS exactly
(simple_detector.py:540-596 and _script/utils.py:212-274): project to the
AOI's UTM zone, sort by confidence descending, keep a detection iff no
already-kept detection lies within ``radius_m`` meters.

Two implementations:
  * ``dedup_host`` — exact, numpy, grid-bucketed (uniform hash grid of cell
    size = radius; only the 3×3 neighborhood is scanned). O(n·k) instead of
    the reference's O(n log n) rtree with python-loop constants; this is the
    city-scale path (millions of points) and is ~100× faster than the
    per-point python rtree loop it replaces.
  * ``dedup_device`` — jnp fixed-K scan for on-device per-shard dedup inside
    the sharded pipeline (parallel.halo uses it before exchanging only
    boundary bands between neighbor shards).
"""

from typing import Dict, List, Tuple

import numpy as np

from aerial_image_recognition_tpu.geo.tmerc import tm_forward, utm_params_for


def _to_utm(lon: np.ndarray, lat: np.ndarray):
    p, _ = utm_params_for(float(lon[0]), float(lat[0]))
    x, y = tm_forward(lon, lat, p)
    return np.asarray(x), np.asarray(y)


def dedup_host(lon: np.ndarray, lat: np.ndarray, conf: np.ndarray,
               radius_m: float, use_native: bool = True) -> np.ndarray:
    """Returns a boolean keep-mask over the input order.

    UTM zone selected from the first detection (same rule as
    simple_detector.py:545-549). Uses the C++ fastgeo grid kernel when
    available (city-scale path: millions of points), numpy/python otherwise.
    """
    n = len(lon)
    if n == 0 or radius_m <= 0:
        return np.ones(n, dtype=bool)
    x, y = _to_utm(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    conf = np.asarray(conf)

    if use_native:
        from aerial_image_recognition_tpu.utils.native import dedup_grid_native
        keep = dedup_grid_native(x, y, conf.astype(np.float32), radius_m)
        if keep is not None:
            return keep

    order = np.argsort(-conf, kind="stable")   # confidence desc, stable ties
    inv_cell = 1.0 / radius_m
    r2 = radius_m * radius_m
    # Uniform grid hash: kept points bucketed by cell; candidates only in 3×3.
    grid: Dict[Tuple[int, int], List[int]] = {}
    keep = np.zeros(n, dtype=bool)
    xs, ys = x[order], y[order]
    cxs = np.floor(xs * inv_cell).astype(np.int64)
    cys = np.floor(ys * inv_cell).astype(np.int64)
    for i in range(len(order)):
        cx, cy = int(cxs[i]), int(cys[i])
        xi, yi = xs[i], ys[i]
        suppressed = False
        for nx in (cx - 1, cx, cx + 1):
            for ny in (cy - 1, cy, cy + 1):
                for j in grid.get((nx, ny), ()):
                    dx = xi - xs[j]
                    dy = yi - ys[j]
                    if dx * dx + dy * dy <= r2:
                        suppressed = True
                        break
                if suppressed:
                    break
            if suppressed:
                break
        if not suppressed:
            keep[order[i]] = True
            grid.setdefault((cx, cy), []).append(i)
    return keep


def dedup_records(records: List[dict], radius_m: float) -> List[dict]:
    """Reference-shape API: list of {'lon','lat','confidence',...} dicts →
    deduplicated list (simple_detector.py:540 signature)."""
    if not records or radius_m <= 0:
        return list(records)
    lon = np.array([r["lon"] for r in records])
    lat = np.array([r["lat"] for r in records])
    conf = np.array([r["confidence"] for r in records])
    keep = dedup_host(lon, lat, conf, radius_m)
    return [r for r, k in zip(records, keep) if k]


def nms_geographic(detections: List[dict],
                   distance_threshold: float = 2.0) -> List[dict]:
    """Standalone geographic NMS — API parity with the reference's
    nms_geographic (car_detection_on_wms.py:49-75 / xyz_handler.py:250-273),
    minus its hardcoded UTM 32611: the zone follows the data."""
    return dedup_records(detections, distance_threshold)


def dedup_device(x, y, conf, radius_m: float, max_keep: int, tie_id=None):
    """jnp fixed-slot dedup: local-meter coords [N], conf [N] (−inf for
    invalid slots) → (idx [max_keep], keep_conf [max_keep], valid mask).

    Greedy highest-confidence-first via lax.scan, exactly mirroring
    dedup_host but with static shapes for use inside jit/shard_map.

    tie_id: optional int32 [N] — exact-confidence ties resolve to the LOWEST
    id (lexicographic (−conf, id) order). Needed wherever multiple shards
    run the same scan over differently-ordered views of one detection set
    (parallel.stripes): a position-based tie-break would let each shard's
    own copy win locally, keeping both duplicates.
    """
    import jax
    import jax.numpy as jnp

    r2 = radius_m * radius_m

    def round_fn(avail, _):
        c = jnp.max(avail)
        if tie_id is None:
            i = jnp.argmax(avail)
        else:
            i = jnp.argmin(jnp.where(avail == c, tie_id, jnp.int32(2**31 - 1)))
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        nxt = jnp.where(d2 <= r2, -jnp.inf, avail)
        return nxt, (i, c)

    _, (idx, kept_conf) = jax.lax.scan(round_fn, conf, None, length=max_keep)
    return idx, kept_conf, jnp.isfinite(kept_conf) & (kept_conf > -jnp.inf)
