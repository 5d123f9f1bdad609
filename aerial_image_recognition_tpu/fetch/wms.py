"""WMS GetMap fetcher.

Functional equivalent of the reference WMSHandler (_script/wms_handler.py):
threaded GetMap requests with retry/backoff (there via owslib + requests
Retry, here via fetch.http.TileHTTP), submit-spacing rate limiting
(wms_handler.py:214: 0.05 s between submissions), a failed-tile re-retry
sweep at increasing delays (wms_handler.py:236-243), fetch stats, and a
tile-preview GeoJSON emitter (wms_handler.py:264-345). owslib is replaced by
direct GetMap 1.1.1 KVP construction — no capabilities round-trip needed for
fixed layer/SRS configs.
"""

import concurrent.futures as cf
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from aerial_image_recognition_tpu.fetch.http import TileHTTP
from aerial_image_recognition_tpu.fetch.xyz import TileImage


class WMSFetcher:
    def __init__(self, url: str, layer: str, *, srs: str = "EPSG:4326",
                 size: Tuple[int, int] = (1280, 1280),
                 image_format: str = "image/jpeg",
                 num_workers: int = 25, timeout: float = 10.0,
                 retries: int = 5, submit_spacing: float = 0.05,
                 version: str = "1.1.1", styles: str = ""):
        self.url = url
        self.layer = layer
        self.srs = srs
        self.size = size
        self.image_format = image_format
        self.num_workers = num_workers
        self.submit_spacing = submit_spacing
        self.version = version
        self.styles = styles
        self.http = TileHTTP(timeout=timeout, retries=retries)
        self._pool = cf.ThreadPoolExecutor(max_workers=num_workers,
                                           thread_name_prefix="wms")

    def getmap_params(self, bbox) -> Dict[str, str]:
        # WMS 1.3.0 axis order for geographic CRS is lat,lon; 1.1.1 is lon,lat.
        if self.version == "1.3.0" and self.srs.upper() == "EPSG:4326":
            bbox_str = f"{bbox[1]},{bbox[0]},{bbox[3]},{bbox[2]}"
        else:
            bbox_str = f"{bbox[0]},{bbox[1]},{bbox[2]},{bbox[3]}"
        srs_key = "CRS" if self.version == "1.3.0" else "SRS"
        return {
            "SERVICE": "WMS", "VERSION": self.version, "REQUEST": "GetMap",
            "LAYERS": self.layer, "STYLES": self.styles,
            srs_key: self.srs, "BBOX": bbox_str,
            "WIDTH": str(self.size[0]), "HEIGHT": str(self.size[1]),
            "FORMAT": self.image_format,
        }

    def get_single_image(self, bbox) -> Optional[TileImage]:
        body = self.http.get(self.url, params=self.getmap_params(bbox))
        if body is None:
            return None
        from aerial_image_recognition_tpu.gio.decode import decode_rgb
        arr = decode_rgb(body)          # native libjpeg path, PIL fallback
        if arr is None:
            self.http.failures.add(self.url, "DecodeError", 0)
            return None
        return TileImage(pixels=arr, bounds=tuple(bbox),
                         meta={"source": "wms"})

    def fetch_batch(self, bboxes: Sequence, progress=None,
                    retry_delays: Sequence[float] = (2.0, 4.0, 8.0)
                    ) -> List[Optional[TileImage]]:
        """Parallel fetch with paced submission, then a re-retry sweep over
        failures at increasing delays."""
        results: List[Optional[TileImage]] = [None] * len(bboxes)

        def submit_all(indices):
            futs = {}
            for i in indices:
                futs[self._pool.submit(self.get_single_image, bboxes[i])] = i
                if self.submit_spacing:
                    time.sleep(self.submit_spacing)
            for fut in cf.as_completed(futs):
                i = futs[fut]
                results[i] = fut.result()
                if progress is not None and results[i] is not None:
                    progress.update(1)

        submit_all(range(len(bboxes)))
        for delay in retry_delays:
            failed = [i for i, r in enumerate(results) if r is None]
            if not failed:
                break
            time.sleep(delay)
            submit_all(failed)
        return results

    def preview_geojson(self, bboxes: Sequence) -> Dict:
        """Tile-grid preview FeatureCollection (wms_handler.py:264-345)."""
        feats = []
        for i, b in enumerate(bboxes):
            feats.append({
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [[
                    [b[0], b[1]], [b[2], b[1]], [b[2], b[3]],
                    [b[0], b[3]], [b[0], b[1]]]]},
                "properties": {"tile_index": i},
            })
        return {"type": "FeatureCollection", "features": feats,
                "properties": {"count": len(feats),
                               "stats": self.http.stats.summary()}}

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
        self.http.close()
