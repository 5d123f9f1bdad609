"""A/B: standard strided yolov7-tiny stems vs the quad-conv lowering
(ops/quadstem.py) on the TPU chip, as full uint8 -> stem-feature chains.

The quad chain assumes the s2d^2 relayout is done host-side during batch
assembly (assemble_batches layout="s2d2") — the device never relayouts.
History (same-process interleaved medians, v5e via tunnel):
  std chain 10.1 ms | device-s2d rewrite 12.7 | Pallas fused kernel 13.3
  (kernel-only; see git history ops/pallas_stem.py) | quad chain 6.4.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_quadstem.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aerial_image_recognition_tpu.ops.quadstem import (
    host_s2d2, quad_kernel_transform, s2d_kernel_transform)

B, S = 128, 640
REPS, TRIALS = 10, 6

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def conv(x, w, stride, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(3, 3, 3, 32), scale=0.1), jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(32,), scale=0.1), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 32, 64), scale=0.1), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,), scale=0.1), jnp.float32)
    w0q = quad_kernel_transform(w0)
    w1q = s2d_kernel_transform(w1)
    b0q = jnp.tile(b0, 4)

    def std_chain(xu8):
        x = xu8.astype(jnp.bfloat16) / 255.0
        x = leaky(conv(x, w0, 2) + b0.astype(x.dtype))
        return leaky(conv(x, w1, 2) + b1.astype(x.dtype))

    def xq_chain(xq):
        x = xq.astype(jnp.bfloat16)
        h = leaky(conv(x, w0q, 1, [(0, 1), (0, 1)])
                  * jnp.bfloat16(1 / 255.) + b0q.astype(jnp.bfloat16))
        return leaky(conv(h, w1q, 1, [(0, 1), (0, 1)])
                     + b1.astype(jnp.bfloat16))

    xu8 = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8)
    xq = jnp.asarray(host_s2d2(np.asarray(xu8)))
    fns = {"std": jax.jit(std_chain), "quad": jax.jit(xq_chain)}
    args = {"std": xu8, "quad": xq}

    r = np.asarray(fns["std"](xu8), np.float32)
    q = np.asarray(fns["quad"](xq), np.float32)
    print(f"scale {np.abs(r).mean():.3f} "
          f"max-abs-diff {np.abs(r - q).max():.4f}", flush=True)

    def timed(f, a):
        out = f(a)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(a)
        _ = float(out.astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / REPS * 1e3

    med = {n: [] for n in fns}
    for n, f in fns.items():
        timed(f, args[n])
        print(f"compiled {n}", flush=True)
    for t in range(TRIALS):
        for n, f in fns.items():
            med[n].append(timed(f, args[n]))
        print(f"trial {t}: " + "  ".join(
            f"{n} {med[n][-1]:.2f}" for n in fns), flush=True)
    for n in fns:
        print(f"median {n}: {np.median(med[n]):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
