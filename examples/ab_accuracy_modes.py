"""Accuracy A/B of the inference modes (VERDICT r4 task 5).

Every multiscale/TTA number so far is THROUGHPUT; the reference ran those
modes to catch more cars (x_arch/03_analyze_wms.ipynb cell 8,
_script/gpu_handler.py:94-140 — lighting variations for shadowed /
low-contrast cars). This measures what the modes buy in ACCURACY on the
trained fakeworld fixtures (yolov7-tiny AND yolov8n), on a held-out world
(different seed than training) where HALF the cars are hard cases:
low-contrast body + adjacent cast shadow, every second one ~40% occluded
by a dark blob (fetch/fake.FakeWorld hard_fraction).

Grid: {v7-tiny, v8n} x {single-scale, multiscale 0.85/1.0/1.15, TTA}
x {bf16, int8 PTQ}. Reports mAP50 / mAP50-95 (ops/metrics
.evaluate_detections, COCO semantics) over the full set plus recall split
easy/hard at conf>=0.25 IoU>=0.5 — the split answers the reference's
actual question (do the modes catch the shadowed/occluded cars?).

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python examples/ab_accuracy_modes.py
Env: AB_BATCH (16), AB_OUT (artifacts/accuracy_r5/summary.json),
     AB_MODELS ("v7,v8n"), AB_MODES (comma filter over the mode names,
     e.g. "single,ms_w90,ms_w80" — default runs single/multiscale/tta)
"""
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

M_PER_DEG = 111319.9
LAT0 = 52.2
PX = 640
CONF_EVAL = 0.1         # low floor so the AP sweep sees the full PR curve
CONF_OP = 0.25          # operating point for the easy/hard recall split


def tile_bbox(clon, clat, tile_m):
    m2lon = 1.0 / (M_PER_DEG * math.cos(math.radians(LAT0)))
    m2lat = 1.0 / M_PER_DEG
    h = tile_m / 2
    return (clon - h * m2lon, clat - h * m2lat,
            clon + h * m2lon, clat + h * m2lat)


def gt_for_tile(world, bbox):
    """Ground-truth pixel boxes (cxcywh, PX-space) + hard flags for every
    car whose rendered rect is >=50% inside the tile (matches render())."""
    west, south, east, north = bbox
    m2lon = 1.0 / (M_PER_DEG * math.cos(math.radians(LAT0)))
    m2lat = 1.0 / M_PER_DEG
    ppd_x = PX / (east - west)
    ppd_y = PX / (north - south)
    half_l, half_w = world.car_size_m[0] / 2, world.car_size_m[1] / 2
    boxes, hard = [], []
    c = world.cars
    near = ((c[:, 0] >= west - 1e-4) & (c[:, 0] <= east + 1e-4)
            & (c[:, 1] >= south - 1e-4) & (c[:, 1] <= north + 1e-4))
    for i in np.where(near)[0]:
        lon, lat = c[i, 0], c[i, 1]
        fx1 = (lon - half_l * m2lon - west) * ppd_x
        fx2 = (lon + half_l * m2lon - west) * ppd_x
        fy1 = (north - (lat + half_w * m2lat)) * ppd_y
        fy2 = (north - (lat - half_w * m2lat)) * ppd_y
        x1, x2 = max(int(fx1), 0), min(int(fx2), PX)
        y1, y2 = max(int(fy1), 0), min(int(fy2), PX)
        if x2 <= x1 or y2 <= y1:
            continue
        full = (fx2 - fx1) * (fy2 - fy1)
        if (x2 - x1) * (y2 - y1) < 0.5 * full:
            continue                        # mostly outside: not evaluable
        boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
        hard.append(bool(world.car_hard[i]))
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(hard, bool))


def greedy_recall(pred_boxes, pred_scores, gt_boxes, gt_hard, conf, iou_thr):
    """Score-ordered greedy matching at one operating point; returns the
    per-GT matched mask (split downstream by gt_hard)."""
    from aerial_image_recognition_tpu.ops.metrics import iou_xywh
    matched = np.zeros(len(gt_boxes), bool)
    if not len(gt_boxes):
        return matched
    keep = pred_scores >= conf
    pb, ps = pred_boxes[keep], pred_scores[keep]
    for j in np.argsort(-ps):
        ious = iou_xywh(pb[j][None], gt_boxes)[0]
        cand = np.where((ious >= iou_thr) & ~matched)[0]
        if len(cand):
            matched[cand[np.argmax(ious[cand])]] = True
    return matched


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.ops.metrics import evaluate_detections
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    batch = int(os.environ.get("AB_BATCH", "16"))
    out_path = os.environ.get(
        "AB_OUT", os.path.join(REPO, "artifacts", "accuracy_r5",
                               "summary.json"))
    model_sel = os.environ.get("AB_MODELS", "v7,v8n").split(",")

    # Held-out world: training fixtures used seed 4 / extent 0.01 /
    # hard_fraction 0 — this is seed 11, a wider AOI, 50% hard cars.
    world = FakeWorld(center_lon=21.0, center_lat=LAT0, extent_deg=0.03,
                      n_cars=1200, seed=11, hard_fraction=0.5)
    m2lon = 1.0 / (M_PER_DEG * math.cos(math.radians(LAT0)))
    m2lat = 1.0 / M_PER_DEG

    def build_eval_set(tile_m):
        """v7 (0.5 m/px, 320 m tiles): a 6x8 grid inside the car span.
        v8n (0.1 m/px, 64 m tiles): tiles this small mostly hold zero
        cars on a uniform grid, so center them on every 18th car with a
        +-12 m jitter (GT still includes every car in the tile)."""
        tiles, gts, hards = [], [], []
        if tile_m >= 200:
            centers = [(21.0 + (ix - 2.5) * tile_m * m2lon,
                        LAT0 + (iy - 3.5) * tile_m * m2lat)
                       for iy in range(8) for ix in range(6)]
        else:
            jrng = np.random.default_rng(7)
            centers = []
            for lon, lat, _ in world.cars[::18][:48]:
                centers.append((
                    lon + (jrng.random() - 0.5) * 24.0 * m2lon,
                    lat + (jrng.random() - 0.5) * 24.0 * m2lat))
        for clon, clat in centers:
            bb = tile_bbox(clon, clat, tile_m)
            img = world.render(bb, PX, PX)
            boxes, hard = gt_for_tile(world, bb)
            tiles.append(img)
            gts.append({"boxes": boxes,
                        "classes": np.zeros(len(boxes), np.int32)})
            hards.append(hard)
        return np.stack(tiles), gts, hards

    fixtures = {
        # key: model, fixture, tile_m matching the fixture's TRAINING
        # m/px (v7: 0.5 m/px -> 320 m / 640 px; v8n: 0.1 m/px -> 64 m —
        # tests/test_v8_detection_quality.py:39)
        "v7": ("yolov7_itcvd", os.path.join(
            REPO, "tests", "fixtures", "yolov7_tiny_fakeworld.npz"),
            320.0),
        "v8n": ("yolov8n", os.path.join(
            REPO, "tests", "fixtures", "yolov8n_fakeworld.npz"), 64.0),
    }
    modes = [("single", {}),
             ("multiscale", {"multiscale": [0.85, 1.0, 1.15]}),
             ("tta", {"tta": True}),
             # per-scale confidence weights (extra.multiscale_weights):
             # candidates for fixing the off-scale-box-wins-NMS misfit the
             # first A/B exposed (easy@.5 0.983 -> 0.740)
             ("ms_w90", {"multiscale": [0.85, 1.0, 1.15],
                         "multiscale_weights": [0.9, 1.0, 0.9]}),
             ("ms_w80", {"multiscale": [0.85, 1.0, 1.15],
                         "multiscale_weights": [0.8, 1.0, 0.8]}),
             ("ms_w70", {"multiscale": [0.85, 1.0, 1.15],
                         "multiscale_weights": [0.7, 1.0, 0.7]}),
             # the throughput-best TTA config (stride-2 histogram
             # estimation, BASELINE.md round-5 table) — accuracy evidence
             # for the knob
             ("tta_s2", {"tta": True, "tta_hist_subsample": 2}),
             # score-weighted box voting over the NMS candidates
             # (ops/nms.box_voting) — the localization lever for the
             # coarse-scale box-misfit regime
             ("single_bv50", {"box_voting": 0.5}),
             ("single_bv30", {"box_voting": 0.3}),
             # voting over the TTA union: same structural situation as
             # multiscale (V=8 candidate sets union before NMS)
             ("tta_bv50", {"tta": True, "box_voting": 0.5}),
             ("ms_w80_bv50", {"multiscale": [0.85, 1.0, 1.15],
                              "multiscale_weights": [0.8, 1.0, 0.8],
                              "box_voting": 0.5})]
    mode_sel = os.environ.get("AB_MODES", "single,multiscale,tta")
    modes = [m for m in modes if m[0] in mode_sel.split(",")]

    bounds = jnp.tile(jnp.asarray([[20.99, 52.19, 21.01, 52.21]],
                                  jnp.float32), (batch, 1))
    rows = []
    eval_meta = {}
    for mkey in model_sel:
        model_name, fixture, tile_m = fixtures[mkey]
        if not os.path.exists(fixture):
            print(f"[skip] {mkey}: fixture missing", flush=True)
            continue
        tiles, gts, hards = build_eval_set(tile_m)
        n_gt = sum(len(g["boxes"]) for g in gts)
        n_hard = int(sum(h.sum() for h in hards))
        print(f"[eval set {mkey}] {len(tiles)} tiles ({tile_m:.0f} m), "
              f"{n_gt} cars ({n_hard} hard / {n_gt - n_hard} easy)",
              flush=True)
        assert n_gt >= 48 and 0.25 < n_hard / max(n_gt, 1) < 0.75
        eval_meta[mkey] = {"tiles": len(tiles), "tile_m": tile_m,
                           "cars": n_gt, "hard": n_hard}

        # int8 calibration tiles: same distribution, outside the eval set
        calib = np.stack([world.render(tile_bbox(
            21.0 + (k - 3.5) * tile_m * m2lon, LAT0 + 0.0125, tile_m),
            PX, PX) for k in range(8)])
        bundles = {}
        bf16 = create_model(model_name, dtype=jnp.bfloat16,
                            params_path=fixture)
        bundles["bf16"] = bf16
        try:
            bundles["int8"] = quantize_bundle(bf16, [calib])
        except Exception as e:                     # noqa: BLE001
            print(f"[skip] {mkey} int8: {e!r}", flush=True)

        for mode_name, extra in modes:
            for dkey, bundle in bundles.items():
                cfg = DetectorConfig(model_path=model_name,
                                     confidence_threshold=CONF_EVAL)
                cfg.extra.update(extra)
                step = build_detect_step(cfg, batch=batch, bundle=bundle)
                t0 = time.perf_counter()
                preds = []
                matched_all = []
                for b0 in range(0, len(tiles), batch):
                    chunk = tiles[b0:b0 + batch]
                    pad = batch - len(chunk)
                    if pad:
                        chunk = np.concatenate(
                            [chunk, np.zeros((pad, PX, PX, 3), np.uint8)])
                    xq = jnp.asarray(step.pack_images(chunk))
                    det, lon, lat = step.fn(step.bundle.params, xq, bounds)
                    dv = np.asarray(det.valid)
                    db = np.asarray(det.boxes, np.float32)
                    ds = np.asarray(det.scores, np.float32)
                    for k in range(batch - pad):
                        m = dv[k] & (ds[k] >= CONF_EVAL)
                        preds.append({
                            "boxes": db[k][m],
                            "scores": ds[k][m],
                            "classes": np.zeros(int(m.sum()), np.int32)})
                wall = time.perf_counter() - t0
                matched_loose = []
                for p, g, h in zip(preds, gts, hards):
                    matched_all.append(greedy_recall(
                        p["boxes"], p["scores"], g["boxes"], h,
                        CONF_OP, 0.5))
                    # IoU 0.3: separates "car not found" from "found but
                    # box poorly fitted" (at 9x4 px a 1 px size error is
                    # the whole IoU-0.5 margin)
                    matched_loose.append(greedy_recall(
                        p["boxes"], p["scores"], g["boxes"], h,
                        CONF_OP, 0.3))
                ap = evaluate_detections(preds, gts, num_classes=1)
                hardm = np.concatenate(hards)
                mall = np.concatenate(matched_all)
                mloose = np.concatenate(matched_loose)
                row = {
                    "model": mkey, "mode": mode_name, "dtype": dkey,
                    "mAP50": round(ap["mAP50"], 4),
                    "mAP50_95": round(ap["mAP50_95"], 4),
                    "recall_easy@0.25": round(
                        float(mall[~hardm].mean()), 4),
                    "recall_hard@0.25": round(
                        float(mall[hardm].mean()), 4),
                    "recall_easy@0.25_iou0.3": round(
                        float(mloose[~hardm].mean()), 4),
                    "recall_hard@0.25_iou0.3": round(
                        float(mloose[hardm].mean()), 4),
                    "n_pred": int(sum(len(p["scores"]) for p in preds)),
                    "wall_s": round(wall, 1),
                }
                rows.append(row)
                print(json.dumps({"metric": "accuracy_ab", **row}),
                      flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"eval": {"per_model": eval_meta, "world_seed": 11,
                            "hard_fraction": 0.5,
                            "conf_eval": CONF_EVAL, "conf_op": CONF_OP},
                   "rows": rows}, f, indent=1)
    print(f"[done] {len(rows)} configs -> {out_path}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
