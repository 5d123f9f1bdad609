"""Train the YOLOv8 Tokyo detector in-framework — the
x_arch/01_train_tokyo.ipynb equivalent: COCO → YOLO conversion with the
Car/Truck class remap, deterministic split, mosaic/mixup augmentation,
300 epochs at lr0=1e-4, mAP validation.

Run:  python examples/train_tokyo.py /data/tokyo/coco.json
"""

import sys

import jax.numpy as jnp

from aerial_image_recognition_tpu.models.registry import create_model, save_params
from aerial_image_recognition_tpu.parallel.mesh import make_mesh
from aerial_image_recognition_tpu.pipeline.data import (
    DetectionLoader, LoaderConfig, TOKYO_CLASS_REMAP, coco_to_yolo,
    train_val_split,
)
from aerial_image_recognition_tpu.pipeline.train import fit


def main():
    coco_path = sys.argv[1]
    samples = coco_to_yolo(coco_path, TOKYO_CLASS_REMAP)
    train, val = train_val_split(samples, n_train=80, seed=0)

    cfg = LoaderConfig(image_size=768, batch_size=8, mosaic=1.0, mixup=0.5)
    bundle = create_model("yolov8_tokyo", dtype=jnp.bfloat16)
    state = fit(bundle,
                DetectionLoader(train, cfg, train=True),
                eval_loader=DetectionLoader(val, cfg, train=False),
                epochs=300, lr=1e-4, mesh=make_mesh())
    save_params({"params": state["params"],
                 "batch_stats": state["batch_stats"]},
                "models/yolov8_tokyo_tpu.npz")


if __name__ == "__main__":
    main()
