"""SAM-workflow auto-mask generation (pipeline/automask.py)."""

import numpy as np

from aerial_image_recognition_tpu.gio.geotiff import GeoTiff
from aerial_image_recognition_tpu.pipeline.automask import (
    automask_geotiff, extract_instances)


def _blob(h, w, cy, cx, r, sharp=True):
    ys, xs = np.mgrid[0:h, 0:w]
    d = np.hypot(ys - cy, xs - cx)
    if sharp:
        return np.clip(1.0 - (d / r) ** 8, 0.0, 1.0)       # near-binary edge
    return np.clip(1.0 - d / (3 * r), 0.0, 1.0)            # long soft ramp


def test_extract_instances_stability_and_area_filters():
    probs = np.zeros((96, 96), np.float32)
    probs += _blob(96, 96, 24, 24, 10, sharp=True)          # stable → kept
    probs += _blob(96, 96, 70, 70, 10, sharp=False)         # fuzzy → dropped
    probs += _blob(96, 96, 24, 80, 2, sharp=True)           # tiny → dropped
    probs = np.clip(probs, 0, 1)
    inst = extract_instances(probs, min_area_px=30, stability_min=0.75)
    assert len(inst) == 1
    sl = inst[0]["mask_slice"]
    assert sl[0].start < 24 < sl[0].stop and sl[1].start < 24 < sl[1].stop
    assert inst[0]["stability"] > 0.75 and inst[0]["score"] > 0.5


def test_automask_geotiff_end_to_end(tmp_path, rng):
    h = w = 96
    img = np.zeros((h, w, 3), np.uint8)
    img[10:30, 10:40, 0] = 255                              # instance 1
    img[60:80, 50:70, 0] = 255                              # instance 2
    gt = GeoTiff(data=img, transform=(21.0, 1e-5, 0.0, 52.2, 0.0, -1e-5),
                 epsg=4326)

    def fake_segment(params, imgs):
        return (imgs[..., :1].astype(np.float32) / 255.0)

    mask_p = str(tmp_path / "mask.tif")
    poly_p = str(tmp_path / "inst.geojson")
    inst = automask_geotiff(gt, window=48, batch=4,
                            segment_fn=fake_segment, params=None,
                            min_area_px=50, stability_min=0.5,
                            output_mask=mask_p, output_polygons=poly_p)
    assert len(inst) == 2
    assert all(i["stability"] > 0.9 for i in inst)          # binary blobs

    import json
    doc = json.load(open(poly_p))
    assert len(doc["features"]) == 2
    props = doc["features"][0]["properties"]
    assert {"instance", "stability", "score", "area_px"} <= set(props)
    # polygon rings georeferenced inside the raster extent
    ring = np.asarray(doc["features"][0]["geometry"]["coordinates"][0])
    assert (ring[:, 0] >= 21.0).all() and (ring[:, 0] <= 21.0 + w * 1e-5).all()

    from aerial_image_recognition_tpu.gio.geotiff import read_geotiff
    m = read_geotiff(mask_p)
    assert (np.asarray(m.data) > 0).sum() >= 2 * 50
