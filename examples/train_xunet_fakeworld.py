"""Train XUnet-256 building segmentation on the synthetic fake world (TPU).

Fills the reference's ramp_XUnet_256.onnx slot (SURVEY §1 model artifacts)
with trained evidence instead of just architecture: FakeWorld grows
ground-truth building footprints (fetch/fake.py render_mask), XUnet trains
in-framework on (tile, mask) pairs, and the script reports held-out mask
IoU. The committed fixture (tests/fixtures/xunet_fakeworld.npz) is pinned
by tests/test_segmentation_quality.py (mask IoU + automask instance
recovery).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python examples/train_xunet_fakeworld.py \
      --epochs 40 --out tests/fixtures/xunet_fakeworld.npz
"""

import argparse
import json
import math

import numpy as np


def build_tiles(world, n_tiles: int, size: int, tile_m: float, seed: int = 0):
    """Random tile bboxes over the fake world → list of (west,south,east,north)."""
    rng = np.random.default_rng(seed)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(world.center_lat)))
    m2lat = 1.0 / 111319.9
    half_lon = tile_m / 2 * m2lon
    half_lat = tile_m / 2 * m2lat
    span = world.extent_deg / 2
    boxes = []
    for _ in range(n_tiles):
        clon = world.center_lon + (rng.random() - 0.5) * 2 * (span - half_lon)
        clat = world.center_lat + (rng.random() - 0.5) * 2 * (span - half_lat)
        boxes.append((clon - half_lon, clat - half_lat,
                      clon + half_lon, clat + half_lat))
    return boxes


class SegLoader:
    """Duck-typed loader for pipeline.train.fit: yields
    (images u8 [B,S,S,3], masks f32 [B,S,S,1]) per batch."""

    def __init__(self, world, bboxes, size: int, batch: int, shuffle=True):
        self.world = world
        self.bboxes = bboxes
        self.size = size
        self.batch = batch
        self.shuffle = shuffle
        self.steps_per_epoch = max(1, len(bboxes) // batch)

    def epoch(self, seed: int):
        order = np.arange(len(self.bboxes))
        if self.shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_full = (len(order) // self.batch) * self.batch
        for i0 in range(0, n_full, self.batch):
            idx = order[i0:i0 + self.batch]
            imgs = np.stack([self.world.render(self.bboxes[i], self.size,
                                               self.size) for i in idx])
            masks = np.stack([self.world.render_mask(
                self.bboxes[i], self.size, self.size) for i in idx])
            yield imgs, masks[..., None].astype(np.float32)


def mask_iou(bundle, state, loader) -> float:
    """Mean foreground IoU at threshold 0.5 over a SegLoader."""
    import jax
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}

    @jax.jit
    def infer(images_u8):
        x = preprocess_batch(images_u8, out_size=images_u8.shape[1],
                             dtype=jnp.bfloat16)
        return jax.nn.sigmoid(bundle.raw_apply(variables, x))

    inter = union = 0.0
    for imgs, masks in loader.epoch(0):
        p = (np.asarray(infer(imgs)) > 0.5).astype(np.float32)
        inter += float((p * masks).sum())
        union += float(np.maximum(p, masks).sum())
    return inter / max(union, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-tiles", type=int, default=384)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--tile-m", type=float, default=64.0,
                    help="0.25 m/px at 256 px — buildings span 50-120 px")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-buildings", type=int, default=120)
    ap.add_argument("--patience", type=int, default=0,
                    help="early stopping on held-out mask IoU (evals every "
                         "epochs//8); 0 disables")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.registry import (
        create_model, save_params)
    from aerial_image_recognition_tpu.pipeline.train import fit

    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=150, n_buildings=args.n_buildings, seed=4)
    tiles = build_tiles(world, args.n_tiles, args.size, args.tile_m)
    n_val = max(args.batch, args.n_tiles // 8)
    train_loader = SegLoader(world, tiles[:-n_val], args.size, args.batch)
    val_loader = SegLoader(world, tiles[-n_val:], args.size, args.batch,
                           shuffle=False)

    bundle = create_model("xunet_256", dtype=jnp.float32)

    def eval_fn(bundle_, state_):
        # held-out mask IoU doubles as the fitness driving best-weight
        # retention / early stopping (fit's eval_fn hook)
        iou = mask_iou(bundle_, state_, val_loader)
        return {"mask_iou": iou, "fitness": iou}

    state = fit(bundle, train_loader, epochs=args.epochs, lr=args.lr,
                eval_fn=eval_fn, eval_every=max(1, args.epochs // 8),
                patience=args.patience or None)
    state.pop("history")
    best = state.get("best")
    deploy = best if best is not None else state
    iou = mask_iou(bundle, deploy, val_loader)
    if args.out:
        save_params({"params": deploy["params"],
                     "batch_stats": deploy["batch_stats"]}, args.out)
    print(json.dumps({"model": "xunet_256", "val_mask_iou": round(iou, 4),
                      "best_epoch": None if best is None else best["epoch"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
