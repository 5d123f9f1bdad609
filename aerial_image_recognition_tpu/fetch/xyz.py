"""XYZ (slippy-map) tile fetcher — mosaic → metric center-crop tiles.

Functional equivalent of the reference's two XYZ paths:
  * modular XYZHandler (_script/xyz_handler.py): zoom 21, 4×4×256 px mosaic
    → 864 px center crop ≈ 64 m, LANCZOS to 640
  * monolith get_image (simple_detector.py:326-453): arbitrary tile-range
    mosaic around a (lat, lon) center with per-latitude pixel math, LRU
    cache, {s} server sharding over mt0-mt3

Differences by design (TPU-first): the fetcher returns *uint8 mosaics +
geographic bounds*; crop/resize/normalize happen on-device
(ops.preprocess.preprocess_batch), so the host never runs PIL resizes in the
hot path.
"""

import concurrent.futures as cf
import io
import math
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from aerial_image_recognition_tpu.fetch.cache import TileCache
from aerial_image_recognition_tpu.fetch.http import TileHTTP
from aerial_image_recognition_tpu.geo.webmercator import (
    meters_per_pixel, tile_bounds, tile_xy,
)


@dataclass
class TileImage:
    """One model-ready tile: uint8 pixels + the geo bounds of those pixels."""
    pixels: np.ndarray               # [S, S, 3] uint8
    bounds: Tuple[float, float, float, float]   # (west, south, east, north)
    meta: Optional[Dict] = None


class XYZFetcher:
    def __init__(self, url_template: str, *, zoom: int = 21,
                 tile_px: int = 256, target_size_m: float = 64.0,
                 num_workers: int = 25, cache_size: int = 10000,
                 timeout: float = 10.0, retries: int = 5,
                 subdomains: Sequence[str] = ("0", "1", "2", "3")):
        self.url_template = url_template
        self.zoom = zoom
        self.tile_px = tile_px
        self.target_size_m = target_size_m
        self.num_workers = num_workers
        self.http = TileHTTP(timeout=timeout, retries=retries)
        self.cache = TileCache(cache_size)
        self.subdomains = list(subdomains) or [""]
        self._sub_idx = 0
        self._sub_lock = threading.Lock()
        self._pool = cf.ThreadPoolExecutor(max_workers=num_workers,
                                           thread_name_prefix="xyz")

    # ------------------------------------------------------------ tiles

    def _tile_url(self, x: int, y: int, z: int) -> str:
        with self._sub_lock:
            s = self.subdomains[self._sub_idx % len(self.subdomains)]
            self._sub_idx += 1
        return self.url_template.format(s=s, x=x, y=y, z=z)

    def _fetch_tile(self, x: int, y: int, z: int) -> Optional[np.ndarray]:
        key = (x, y, z)
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        body = self.http.get(self._tile_url(x, y, z))
        if body is None:
            return None
        try:
            img = Image.open(io.BytesIO(body)).convert("RGB")
            arr = np.asarray(img, dtype=np.uint8)
        except Exception:
            self.http.failures.add(self._tile_url(x, y, z), "DecodeError", 0)
            return None
        self.cache.put(key, arr)
        return arr

    # ---------------------------------------------------------- mosaics

    def get_image(self, lat: float, lon: float,
                  target_size_m: Optional[float] = None) -> Optional[TileImage]:
        """Mosaic the slippy tiles covering a target_size_m square centered
        on (lat, lon); returns the *uncropped-but-trimmed* pixel window whose
        bounds exactly cover the target square (monolith get_image
        semantics, simple_detector.py:326-453)."""
        size_m = target_size_m or self.target_size_m
        mpp = meters_per_pixel(self.zoom, lat=lat, xp=np)
        pixels_needed = int(size_m / float(mpp))

        m2lon = 1.0 / (111319.9 * math.cos(math.radians(lat)))
        m2lat = 1.0 / 111319.9
        half = size_m / 2.0
        west, east = lon - half * m2lon, lon + half * m2lon
        south, north = lat - half * m2lat, lat + half * m2lat

        nwx, nwy = tile_xy(west, north, self.zoom)
        sex, sey = tile_xy(east, south, self.zoom)
        min_x, max_x = int(min(nwx, sex)) - 1, int(max(nwx, sex)) + 1
        min_y, max_y = int(min(nwy, sey)) - 1, int(max(nwy, sey)) + 1

        coords = [(x, y) for y in range(min_y, max_y + 1)
                  for x in range(min_x, max_x + 1)]
        futures = {c: self._pool.submit(self._fetch_tile, c[0], c[1], self.zoom)
                   for c in coords}
        t = self.tile_px
        gw, gh = max_x - min_x + 1, max_y - min_y + 1
        mosaic = np.zeros((gh * t, gw * t, 3), dtype=np.uint8)
        ok = 0
        for (x, y), fut in futures.items():
            arr = fut.result()
            if arr is not None and arr.shape[:2] == (t, t):
                mosaic[(y - min_y) * t:(y - min_y + 1) * t,
                       (x - min_x) * t:(x - min_x + 1) * t] = arr
                ok += 1
        if ok == 0:
            return None

        # Geographic bounds of the mosaic, then pixel window of the target
        m_west, _, _, m_north = tile_bounds(min_x, min_y, self.zoom)
        _, m_south, m_east, _ = tile_bounds(max_x, max_y, self.zoom)
        x_scale = mosaic.shape[1] / (m_east - m_west)
        y_scale = mosaic.shape[0] / (m_north - m_south)
        left = int((west - m_west) * x_scale)
        top = int((m_north - north) * y_scale)
        window = mosaic[top:top + pixels_needed, left:left + pixels_needed]
        if window.shape[0] != pixels_needed or window.shape[1] != pixels_needed:
            pad = np.zeros((pixels_needed, pixels_needed, 3), np.uint8)
            pad[:window.shape[0], :window.shape[1]] = window
            window = pad
        return TileImage(
            pixels=window, bounds=(west, south, east, north),
            meta={"zoom": self.zoom,
                  "tiles_total": len(coords), "tiles_ok": ok,
                  "meters_per_pixel": float(mpp),
                  "crop_size": pixels_needed})

    def fetch_batch(self, bboxes: Sequence[Tuple[float, float, float, float]],
                    progress=None) -> List[Optional[TileImage]]:
        """WGS84 tile bboxes → tile images (modular fetch_batch signature,
        _script/xyz_handler.py:228-248: center computed from the bbox)."""
        def one(bbox):
            lon_c = (bbox[0] + bbox[2]) / 2
            lat_c = (bbox[1] + bbox[3]) / 2
            out = self.get_image(lat_c, lon_c)
            if progress is not None:
                progress.update(1)
            return out
        futures = [self._pool.submit(one, b) for b in bboxes]
        return [f.result() for f in futures]

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
        self.http.close()
