"""Segmentation-quality tests with REAL (trained) XUnet weights.

Gives segmentation the same evidence tier as detection (VERDICT r2 item 2):
the committed fake-world XUnet fixture — trained in-framework on TPU
(examples/train_xunet_fakeworld.py) — must (a) segment building footprints
to high mask IoU on held-out tiles, and (b) drive the SAM-style automask
workflow (pipeline/automask.py, the reference's
x_arch/car_recognition_on_tiff.py parity slot) to recover individual
building instances with stability scores.
"""

import math
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "xunet_fakeworld.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="trained xunet fixture not present")

# Must match examples/train_xunet_fakeworld.py's world
WORLD_KW = dict(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                n_cars=150, n_buildings=120, seed=4)
TILE_M = 64.0
SIZE = 256


def _world():
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    return FakeWorld(**WORLD_KW)


def _val_tiles(world, n=24):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from train_xunet_fakeworld import build_tiles
    # same generator; a seed the training run never used
    return build_tiles(world, n, SIZE, TILE_M, seed=123)


@pytest.fixture(scope="module")
def trained():
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    bundle = create_model("xunet_256", dtype=jnp.float32)
    variables = load_params(FIXTURE)
    return bundle, variables


def test_mask_iou_on_heldout_tiles(trained):
    import jax
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    bundle, variables = trained
    world = _world()
    tiles = _val_tiles(world)

    @jax.jit
    def infer(images_u8):
        x = preprocess_batch(images_u8, out_size=SIZE, dtype=jnp.bfloat16)
        return jax.nn.sigmoid(bundle.raw_apply(variables, x))

    imgs = np.stack([world.render(b, SIZE, SIZE) for b in tiles])
    gts = np.stack([world.render_mask(b, SIZE, SIZE) for b in tiles])
    probs = np.asarray(infer(imgs))[..., 0]
    pred = probs > 0.5
    inter = float((pred & (gts > 0)).sum())
    union = float((pred | (gts > 0)).sum())
    iou = inter / max(union, 1.0)
    assert iou >= 0.80, f"held-out building mask IoU {iou:.3f} < 0.80"


def test_automask_recovers_building_instances(trained, tmp_path):
    """SAM2-workflow parity on trained weights: automask over a GeoTIFF
    of the fake world recovers the individual buildings in the window —
    count close to ground truth, every instance stability-scored, and
    instance centroids near true building centers."""
    from aerial_image_recognition_tpu.gio.geotiff import (
        read_geotiff, write_geotiff)
    from aerial_image_recognition_tpu.pipeline.automask import (
        automask_geotiff)

    bundle, variables = trained
    world = _world()
    # 512-px window centered on the world → 2x2 XUnet tiles
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(world.center_lat)))
    m2lat = 1.0 / 111319.9
    half_lon = TILE_M * m2lon          # 128 m across = 512 px at 0.25 m/px
    half_lat = TILE_M * m2lat
    bbox = (world.center_lon - half_lon, world.center_lat - half_lat,
            world.center_lon + half_lon, world.center_lat + half_lat)
    img = world.render(bbox, 512, 512)
    gt_mask = world.render_mask(bbox, 512, 512)

    path = str(tmp_path / "world.tif")
    transform = (bbox[0], (bbox[2] - bbox[0]) / 512, 0.0,
                 bbox[3], 0.0, -(bbox[3] - bbox[1]) / 512)
    write_geotiff(path, img, transform, 4326)

    out_mask = str(tmp_path / "mask.tif")
    out_polys = str(tmp_path / "instances.geojson")
    instances = automask_geotiff(path, window=SIZE, params=variables,
                                 min_area_px=100, output_mask=out_mask,
                                 output_polygons=out_polys)

    # ground truth: connected buildings in this window (overlapping rects
    # merge, so count connected components of the gt mask)
    from scipy import ndimage as ndi
    labels, n_all = ndi.label(gt_mask > 0)
    n_gt = sum(1 for i in range(1, n_all + 1)
               if (labels == i).sum() >= 100)

    assert n_gt > 0, "test window contains no buildings — world drifted"
    assert len(instances) >= 0.7 * n_gt, (
        f"automask found {len(instances)} of {n_gt} building components")
    assert len(instances) <= 1.5 * n_gt + 2
    for inst in instances:
        assert 0.0 <= inst["stability"] <= 1.0
    assert os.path.exists(out_mask) and os.path.exists(out_polys)
    # pixel mask should agree with ground truth reasonably well
    pred_mask = read_geotiff(out_mask).data
    if pred_mask.ndim == 3:
        pred_mask = pred_mask[..., 0]
    pred = pred_mask > 0
    iou = (pred & (gt_mask > 0)).sum() / max((pred | (gt_mask > 0)).sum(), 1)
    assert iou >= 0.7, f"automask raster IoU {iou:.3f} < 0.7"
