"""Train a detector from scratch on the synthetic fake world, on TPU.

This is the repo-tracked version of the round-1 learning validation
(STATUS.md: mAP50 0.96 after 3000 steps) and the harness for the BatchNorm
mode question: run with --bn-mode batch and --bn-mode frozen on the same
data and compare eval mAP (VERDICT round 1, item 6).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python examples/train_fakeworld.py \
      --bn-mode batch --epochs 60 --n-images 512 --out /tmp/fw_batch.npz
"""

import argparse
import json
import math

import numpy as np


def build_samples(world, n_images: int, size: int, tile_m: float,
                  seed: int = 0):
    """Random tile views over the fake world → (Samples, decode_fn).

    Boxes match FakeWorld.render's geometry exactly: axis-aligned
    half_l × half_w boxes (the renderer ignores heading for speed),
    normalized cxcywh.
    """
    from aerial_image_recognition_tpu.pipeline.data import Sample

    rng = np.random.default_rng(seed)
    m2lon = 1.0 / (111319.9 * math.cos(math.radians(world.center_lat)))
    m2lat = 1.0 / 111319.9
    half_lon = tile_m / 2 * m2lon
    half_lat = tile_m / 2 * m2lat
    span = world.extent_deg / 2
    samples, bboxes = [], {}
    for i in range(n_images):
        clon = world.center_lon + (rng.random() - 0.5) * 2 * (span - half_lon)
        clat = world.center_lat + (rng.random() - 0.5) * 2 * (span - half_lat)
        bbox = (clon - half_lon, clat - half_lat,
                clon + half_lon, clat + half_lat)
        L, W = world.car_size_m
        boxes = []
        for lon, lat, _hd in world.cars:
            if not (bbox[0] <= lon <= bbox[2] and bbox[1] <= lat <= bbox[3]):
                continue
            cx = (lon - bbox[0]) / (bbox[2] - bbox[0])
            cy = (bbox[3] - lat) / (bbox[3] - bbox[1])
            boxes.append((0.0, cx, cy, L / tile_m, W / tile_m))
        key = f"fw://{i}"
        bboxes[key] = bbox
        samples.append(Sample(image_path=key,
                              boxes=np.asarray(boxes, np.float32).reshape(-1, 5)))

    def decode(key: str) -> np.ndarray:
        return world.render(bboxes[key], size, size)

    return samples, decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7_itcvd",
                    help="any registry name (yolov7_itcvd, yolov8n, ...)")
    ap.add_argument("--bn-mode", default="auto",
                    choices=["auto", "batch", "frozen"])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--tile-m", type=float, default=9.6,
                    help="ground meters per tile; with --size 96: 9.6 -> "
                         "0.1 m/px (v8n fixture), 48 -> 0.5 m/px (the "
                         "committed v7 fixture's scale)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--out", default=None)
    ap.add_argument("--history-out", default=None)
    ap.add_argument("--full-recipe", action="store_true",
                    help="turn on the complete ultralytics augmentation "
                         "recipe the reference trained under (copy_paste/"
                         "fliplr/scale/translate/close_mosaic) instead of "
                         "the validated round-1 mosaic/mixup/hsv subset")
    args = ap.parse_args()

    import jax.numpy as jnp
    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.models.registry import (
        create_model, save_params)
    from aerial_image_recognition_tpu.pipeline.data import (
        DetectionLoader, LoaderConfig)
    from aerial_image_recognition_tpu.pipeline.train import fit

    world = FakeWorld(center_lon=21.0, center_lat=52.2, extent_deg=0.01,
                      n_cars=400, seed=4)
    samples, decode = build_samples(world, args.n_images, args.size,
                                    args.tile_m)
    train_s, val_s = samples[: -args.n_images // 8], samples[-args.n_images // 8:]
    extra = (dict(copy_paste=0.5, fliplr=0.5, scale=0.5, translate=0.1,
                  close_mosaic=max(1, args.epochs // 6))
             if args.full_recipe else {})
    lcfg = LoaderConfig(image_size=args.size, batch_size=args.batch,
                        max_targets=32, **extra)
    train_loader = DetectionLoader(train_s, lcfg, decode_fn=decode)
    val_loader = DetectionLoader(
        val_s, LoaderConfig(image_size=args.size, batch_size=args.batch,
                            max_targets=32, mosaic=0.0, mixup=0.0, hsv=0.0),
        decode_fn=decode, train=False)

    bundle = create_model(args.model, dtype=jnp.float32)
    # obj_pos_weight counters background flooding in the anchor-based v7
    # loss; the anchor-free v8 loss has no objectness channel
    lk = ({"obj_pos_weight": 8.0} if bundle.spec.family == "yolov7"
          else {})
    state = fit(bundle, train_loader, epochs=args.epochs, lr=args.lr,
                eval_loader=val_loader, eval_every=args.eval_every,
                bn_mode=args.bn_mode, loss_kwargs=lk)
    history = state.pop("history")
    if args.out:
        save_params({"params": state["params"],
                     "batch_stats": state["batch_stats"]}, args.out)
    if args.history_out:
        with open(args.history_out, "w") as f:
            json.dump({"bn_mode": args.bn_mode, "history": history}, f)
    print(json.dumps({"model": args.model, "bn_mode": args.bn_mode,
                      "final": history[-1]}))


if __name__ == "__main__":
    main()
