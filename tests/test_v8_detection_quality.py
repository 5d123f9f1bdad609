"""YOLOv8 trained-weights detection quality (the v8 analogue of
test_detection_quality.py's v7 validation).

The fixture was trained in-framework on the fake world with
bn_mode='auto' (→ batch + BN recalibration): final eval mAP50 1.000 /
mAP50-95 0.825 on one v5e chip (round 2). This test pins that the loss →
assignment → optimizer → DFL decode → NMS chain stays healthy: the
trained nano must find cars on car-centered tiles and stay quiet on
empty ones.
"""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "yolov8n_fakeworld.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="trained v8 fixture not present")
def test_v8_trained_weights_find_cars():
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.ops.nms import batched_nms

    bundle = create_model("yolov8n", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(FIXTURE))
    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
    m2lat = 1.0 / 111319.9
    half = 4.8  # meters — 96 px at the 0.1 m/px training scale

    imgs, centered = [], []
    for lon, lat, _ in world.cars[:8]:
        bb = (lon - half * m2lon, lat - half * m2lat,
              lon + half * m2lon, lat + half * m2lat)
        imgs.append(world.render(bb, 96, 96))
        centered.append(True)
    # empty tiles: corners of the world far from the car field density
    rng = np.random.default_rng(0)
    empties = 0
    for lon, lat in zip(
            world.center_lon + (rng.random(64) - 0.5) * 0.009,
            world.center_lat + (rng.random(64) - 0.5) * 0.009):
        bb = (lon - half * m2lon, lat - half * m2lat,
              lon + half * m2lon, lat + half * m2lat)
        if any(bb[0] - 3 * m2lon < c[0] < bb[2] + 3 * m2lon
               and bb[1] - 3 * m2lat < c[1] < bb[3] + 3 * m2lat
               for c in world.cars):
            continue
        imgs.append(world.render(bb, 96, 96))
        centered.append(False)
        empties += 1
        if empties == 8:
            break
    assert empties >= 4, "couldn't sample empty tiles — densify check"

    x = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
    boxes, scores = bundle.forward(bundle.params, x)
    det = batched_nms(boxes, scores, num_classes=2, conf_threshold=0.3,
                      iou_threshold=0.45, max_det=16)
    n = np.asarray(det.valid.sum(axis=1))
    hit = 0
    for i, is_car in enumerate(centered):
        if is_car:
            hit += n[i] >= 1
            if n[i]:
                # the centered car's box center must sit near mid-tile
                j = int(np.asarray(det.scores[i]).argmax())
                cx, cy = np.asarray(det.boxes[i, j, :2])
                assert abs(cx - 48) < 15 and abs(cy - 48) < 15, (cx, cy)
        else:
            assert n[i] == 0, f"false positives on empty tile: {n[i]}"
    assert hit >= 7, f"trained v8n found cars on only {hit}/8 centered tiles"
