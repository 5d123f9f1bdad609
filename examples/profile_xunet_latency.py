"""TPU measurements: XUnet-256 stage profile + single-tile detect latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python examples/profile_xunet_latency.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aerial_image_recognition_tpu.models.xunet import DoubleConv
from aerial_image_recognition_tpu.models.layers import ConvBN, maxpool2, \
    upsample2, concat
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.inference import (
    build_detect_step)
from aerial_image_recognition_tpu.runtime.config import DetectorConfig

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256
REPS, TRIALS = 10, 5


class XPrefix(nn.Module):
    depth: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = 32
        k = 0
        skips = []
        for i, mult in enumerate((1, 2, 4, 8)):
            x = DoubleConv(c * mult, name=f"enc{i}",
                           dtype=self.dtype)(x)
            k += 1
            if k == self.depth:
                return x
            skips.append(x)
            x = maxpool2(x)
        x = DoubleConv(c * 16, name="bottleneck", dtype=self.dtype)(x)
        k += 1
        if k == self.depth:
            return x
        for i, mult in enumerate((8, 4, 2, 1)):
            x = upsample2(x)
            x = ConvBN(c * mult, 1, act="relu", name=f"up{i}",
                       dtype=self.dtype)(x)
            x = concat([x, skips[-(i + 1)]])
            x = DoubleConv(c * mult, name=f"dec{i}", dtype=self.dtype)(x)
            k += 1
            if k == self.depth:
                return x
        return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.bfloat16)
    names = ["enc0", "enc1", "enc2", "enc3", "bottleneck",
             "dec0", "dec1", "dec2", "dec3"]
    fns, params = [], []
    for d in range(1, len(names) + 1):
        m = XPrefix(depth=d)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        fns.append(jax.jit(lambda vv, im, m=m: m.apply(vv, im)))
        params.append(v)

    def timed(i):
        out = fns[i](params[i], x)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fns[i](params[i], x)
        _ = float(out.astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / REPS * 1e3

    for i in range(len(fns)):
        timed(i)
        print(f"compiled {i + 1}", flush=True)
    med = [[] for _ in fns]
    for t in range(TRIALS):
        for i in range(len(fns)):
            med[i].append(timed(i))
    prev = 0.0
    for n, m in zip(names, med):
        c = float(np.median(m))
        print(f"{n:10s} cum {c:7.2f} ms  stage {c - prev:6.2f} ms",
              flush=True)
        prev = c

    # ---- single-tile detect latency (serving path, batch 1) ----
    cfg = DetectorConfig()
    for batch in (1, 8):
        step = build_detect_step(cfg, batch=batch)
        img = rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)
        packed = step.pack_images(img)
        bounds = np.tile(np.asarray([[20.99, 52.21, 21.0, 52.22]],
                                    np.float32), (batch, 1))
        dimg = jnp.asarray(packed)
        dbnd = jnp.asarray(bounds)
        det, lon, lat = step.fn(step.bundle.params, dimg, dbnd)
        float(lon.sum())
        ts = []
        for _ in range(50):
            t0 = time.perf_counter()
            det, lon, lat = step.fn(step.bundle.params, dimg, dbnd)
            float(lon.sum())
            ts.append((time.perf_counter() - t0) * 1e3)
        ts = np.asarray(ts)
        print(f"detect latency batch {batch}: p50 {np.percentile(ts,50):.2f}"
              f" ms  p99 {np.percentile(ts,99):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
