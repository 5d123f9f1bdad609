"""Georeferencing: model-pixel detections → WGS84 lon/lat.

Matches the reference's linear pixel→geo mapping exactly
(simple_detector.py:484-504: x_frac = x/model_size;
lon = west + x_frac·(east−west); lat = north − y_frac·(north−south)),
but vectorized over whole batches instead of a per-box python loop.

Precision split: the device hot path emits pixel coords in f32; the absolute
degree mapping runs host-side in f64 numpy (tile spans are ~1e-3°, so f32
absolute longitudes would quantize at ~0.1 m — fine for detection but not
for the 1 m dedup radius accumulated city-wide). A jnp variant is provided
for the fused on-device stripe path, which works in *local* UTM meters
relative to a stripe anchor where f32 is ample.
"""

from typing import Sequence

import numpy as np

from aerial_image_recognition_tpu.ops.nms import Detections


def detections_to_lonlat(boxes_xy: np.ndarray, bounds: np.ndarray,
                         model_size: int = 640) -> np.ndarray:
    """boxes_xy [B,D,2] (cx,cy model pixels) + bounds [B,4] (w,s,e,n)
    → [B,D,2] (lon,lat), f64."""
    boxes_xy = np.asarray(boxes_xy, dtype=np.float64)
    bounds = np.asarray(bounds, dtype=np.float64)
    w = bounds[:, 0:1]
    s = bounds[:, 1:2]
    e = bounds[:, 2:3]
    n = bounds[:, 3:4]
    x_frac = boxes_xy[..., 0] / model_size
    y_frac = boxes_xy[..., 1] / model_size
    lon = w + x_frac * (e - w)
    lat = n - y_frac * (n - s)
    return np.stack([lon, lat], axis=-1)


def detections_to_records(det: Detections, bounds: np.ndarray,
                          model_size: int = 640,
                          class_names: Sequence[str] = ("car",)):
    """Fixed-slot device Detections → list of dicts in the reference's
    detection-record schema (simple_detector.py:496-502: lon/lat/confidence
    + image- and model-space coords)."""
    boxes = np.asarray(det.boxes, dtype=np.float64)
    scores = np.asarray(det.scores, dtype=np.float64)
    classes = np.asarray(det.classes)
    valid = np.asarray(det.valid)
    lonlat = detections_to_lonlat(boxes[..., :2], bounds, model_size)
    records = []
    b_idx, d_idx = np.nonzero(valid)
    for bi, di in zip(b_idx.tolist(), d_idx.tolist()):
        cls = int(classes[bi, di])
        records.append({
            "lon": float(lonlat[bi, di, 0]),
            "lat": float(lonlat[bi, di, 1]),
            "confidence": float(scores[bi, di]),
            "class": class_names[cls] if 0 <= cls < len(class_names) else str(cls),
            "yolo": {"x": float(boxes[bi, di, 0]), "y": float(boxes[bi, di, 1]),
                     "w": float(boxes[bi, di, 2]), "h": float(boxes[bi, di, 3])},
            "tile_index": bi,
        })
    return records


def lonlat_jax(boxes_xy, bounds, model_size: int = 640):
    """jnp variant for the fused on-device path; boxes_xy [B,D,2],
    bounds [B,4] → (lon, lat) [B,D] each (f32)."""
    import jax.numpy as jnp
    w = bounds[:, 0:1]
    s = bounds[:, 1:2]
    e = bounds[:, 2:3]
    n = bounds[:, 3:4]
    x_frac = boxes_xy[..., 0] / model_size
    y_frac = boxes_xy[..., 1] / model_size
    return w + x_frac * (e - w), n - y_frac * (n - s)
