"""Results accumulation + final emission.

ResultsManager parity (_script/utils.py:148-292): accumulate detection
records, periodic dedup (confidence-greedy metric NMS — post.dedup), write
``{prefix}_results.geojson`` plus intermediate saves, with run metadata
embedded in the output document (simple_detector.py:872-913 embeds timings,
dedup params, UTM zone). Adds shapefile emission for QGIS parity.
"""

import os
import time
from typing import Dict, List, Optional, Sequence

from aerial_image_recognition_tpu.gio.geojson import (
    coverage_to_feature_collection, detections_to_feature_collection,
    write_geojson,
)
from aerial_image_recognition_tpu.gio.shapefile import detections_to_shapefile
from aerial_image_recognition_tpu.post.dedup import dedup_records
from aerial_image_recognition_tpu.geo.tmerc import utm_epsg


class ResultsManager:
    def __init__(self, output_dir: str, prefix: str = "detections",
                 duplicate_distance: float = 1.0,
                 write_shapefile: bool = True,
                 heatmap_hex_m: float = 0.0):
        self.output_dir = output_dir
        self.prefix = prefix
        self.duplicate_distance = duplicate_distance
        self.write_shp = write_shapefile
        self.heatmap_hex_m = heatmap_hex_m
        self.detections: List[dict] = []
        self.coverages: List = []
        os.makedirs(output_dir, exist_ok=True)

    def add(self, records: Sequence[dict],
            coverages: Optional[Sequence] = None):
        self.detections.extend(records)
        if coverages:
            self.coverages.extend(coverages)

    def remove_duplicates(self) -> int:
        """In-place dedup; returns number removed."""
        before = len(self.detections)
        self.detections = dedup_records(self.detections,
                                        self.duplicate_distance)
        return before - len(self.detections)

    def compact(self, active_bounds=None) -> int:
        """Bounded-memory periodic dedup that cannot change the final set.

        Plain remove_duplicates() at arbitrary checkpoints is destructive in
        a boundary-dependent way: a record suppressed NOW can lose its
        suppressor LATER (a higher-confidence duplicate arriving from an
        overlapping neighbor tile suppresses the suppressor, which should
        resurrect the record) — so where the periodic dedups happen changes
        the final output, and an interrupted+resumed scan differs from an
        uninterrupted one. compact() destroys a suppressed record only when
        its influence neighborhood is final: farther than a safety margin
        from ``active_bounds`` (bbox of tiles not yet scanned). Suppressed
        records near the scan frontier are retained (a few tile rows at
        most), so memory stays bounded while the final global dedup is
        boundary-independent. (The reference's periodic dedup at
        _script/detector.py:209-219 has the boundary-dependent semantics;
        this is the deterministic upgrade.)
        """
        if not self.detections or self.duplicate_distance <= 0:
            return 0
        import math

        import numpy as np

        from aerial_image_recognition_tpu.post.dedup import dedup_host

        lon = np.array([r["lon"] for r in self.detections])
        lat = np.array([r["lat"] for r in self.detections])
        conf = np.array([r["confidence"] for r in self.detections])
        keep = dedup_host(lon, lat, conf, self.duplicate_distance)
        if active_bounds is None:
            retained = keep
        else:
            w, s, e, n = active_bounds
            # margin: new arrivals land inside the active region; one chain
            # hop can reach radius beyond, use 3× radius for slack (deeper
            # suppression chains need monotone-confidence links every
            # ≤radius — negligible)
            margin = 3.0 * self.duplicate_distance
            m_lat = margin / 111319.9
            m_lon = margin / (111319.9 * max(
                0.1, math.cos(math.radians((s + n) / 2))))
            near_active = ((lon >= w - m_lon) & (lon <= e + m_lon)
                           & (lat >= s - m_lat) & (lat <= n + m_lat))
            retained = keep | near_active
        before = len(self.detections)
        self.detections = [r for r, k in zip(self.detections, retained) if k]
        return before - len(self.detections)

    def save_intermediate(self, tag: str = "intermediate") -> str:
        path = os.path.join(self.output_dir, f"{self.prefix}_{tag}.geojson")
        write_geojson(detections_to_feature_collection(self.detections), path)
        return path

    def process_results(self, metadata: Optional[Dict] = None) -> str:
        """Final dedup + write {prefix}_results.geojson (+ .shp). Returns
        the geojson path."""
        removed = self.remove_duplicates()
        meta = {
            "generated": time.time(),
            "count": len(self.detections),
            "duplicates_removed": removed,
            "duplicate_distance_m": self.duplicate_distance,
        }
        if self.detections:
            meta["utm_epsg"] = utm_epsg(self.detections[0]["lon"],
                                        self.detections[0]["lat"])
        if metadata:
            meta.update(metadata)
        path = os.path.join(self.output_dir, f"{self.prefix}_results.geojson")
        write_geojson(detections_to_feature_collection(self.detections, meta),
                      path)
        if self.coverages:
            cov = (coverage_to_feature_collection(self.coverages)
                   if not isinstance(self.coverages[0], dict)
                   else {"type": "FeatureCollection",
                         "features": list(self.coverages)})
            write_geojson(cov, os.path.join(
                self.output_dir, f"{self.prefix}_coverage.geojson"))
        if self.write_shp and self.detections:
            detections_to_shapefile(
                os.path.join(self.output_dir, f"{self.prefix}_results.shp"),
                self.detections)
        if self.heatmap_hex_m > 0 and self.detections:
            from aerial_image_recognition_tpu.post.heatmap import hex_heatmap
            hex_heatmap(self.detections, self.heatmap_hex_m,
                        output_geojson=os.path.join(
                            self.output_dir,
                            f"{self.prefix}_hex_heatmap.geojson"))
        return path
