"""Training-step throughput on the TPU chip (L9 perf evidence).

Times the jitted fused train step (forward + yolov7 loss + backward +
optimizer update) for yolov7-tiny at the production recipe shapes, with
and without gradient rematerialization. Prints one line per config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_train.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.train import (
    init_train_state, make_train_step)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

SIZE = int(__import__("os").environ.get("BT_SIZE", "640"))
BATCH = int(__import__("os").environ.get("BT_BATCH", "32"))
REPS, TRIALS = 5, 4


def main():
    rng = np.random.default_rng(0)
    targets = np.full((BATCH, 32, 5), -1, np.float32)
    for b in range(BATCH):
        for t in range(8):
            cx, cy = rng.uniform(40, SIZE - 40, 2)
            targets[b, t] = (0, cx, cy, 18.0, 9.0)
    images = [jnp.asarray(rng.integers(0, 255, (BATCH, SIZE, SIZE, 3)),
                          jnp.uint8) for _ in range(2)]
    tgt = jnp.asarray(targets)

    for remat in (False, True):
        bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16, seed=0)
        tx = optax.adamw(1e-4)
        step = make_train_step(bundle, tx, bn_mode="frozen", remat=remat)
        state = init_train_state(bundle, tx)
        state, metrics = step(state, images[0], tgt)
        _ = float(metrics["loss"])
        times = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            for i in range(REPS):
                state, metrics = step(state, images[i % 2], tgt)
            _ = float(metrics["loss"])    # forced readback
            times.append((time.perf_counter() - t0) / REPS * 1e3)
        ms = float(np.median(times))
        print(f"remat={remat}: {ms:.1f} ms/step  "
              f"({BATCH / ms * 1e3:.0f} img/s, batch {BATCH} x {SIZE}^2)",
              flush=True)


if __name__ == "__main__":
    main()
