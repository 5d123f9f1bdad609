"""Headline benchmark: fused-detection throughput (640-px tiles/s/chip).

Runs the flagship YOLOv7-ITCVD fused step (preprocess → backbone → decode →
NMS → georef) on whatever accelerator jax exposes and prints ONE JSON line.
Baseline: the driver target of 2000 tiles/s/chip (BASELINE.json; the
reference publishes no numbers and was locked to batch=1 ONNX inference —
BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aerial_image_recognition_tpu.runtime.config import DetectorConfig
    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    cfg = DetectorConfig()
    bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
    detect = jax.jit(make_detect_fn(bundle, cfg))

    rng = np.random.default_rng(0)
    # two distinct device-resident batches so no result can be reused
    images = [jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3),
                                       dtype=np.uint8)) for _ in range(2)]
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (batch, 1))

    # Warmup (compile + first-dispatch costs)
    det, lon, lat = detect(bundle.params, images[0], bounds)
    float(lon.sum())

    # Steady state, best of 3 rounds; a scalar readback (not just
    # block_until_ready, which returns early through the axon tunnel)
    # forces real completion.
    tiles_per_s = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            det, lon, lat = detect(bundle.params, images[i % 2], bounds)
        assert np.isfinite(float(lon.sum()))
        tiles_per_s = max(tiles_per_s,
                          batch * iters / (time.perf_counter() - t0))
    baseline = 2000.0  # tiles/s/chip target (BASELINE.json north star)
    print(json.dumps({
        "metric": "yolov7_itcvd_640px_tiles_per_sec_per_chip",
        "value": round(tiles_per_s, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
