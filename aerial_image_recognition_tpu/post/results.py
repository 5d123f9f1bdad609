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
