"""A/B: standard strided yolov7 stems vs space-to-depth 2x2-conv rewrite.

Motivation (examples/profile_backbone.py, batch 128 x 640^2): stem0 costs
7.2 ms and stem1 2.2 ms of the 27 ms forward — the 3-channel strided conv
fills 3/128 MXU lanes and runs ~5x above its memory floor. The rewrite
folds each stride-2 3x3 conv into space_to_depth2 + a stride-1 2x2 conv
over 4x the channels (exact weight transform, zero-padded taps), so the
contraction depth goes 27 -> 48 (stem0) and 288 -> 512 (stem1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_stem.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aerial_image_recognition_tpu.models.layers import space_to_depth2
from aerial_image_recognition_tpu.ops.quadstem import s2d_kernel_transform

B, S = 128, 640
REPS, TRIALS = 10, 6

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def conv(x, w, stride=1, padding=((1, 1), (1, 1))):
    # default = torch k//2 padding for a 3x3 conv (ConvBN's convention
    # since the round-3 parity fix; SAME differs for stride 2)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(size=(3, 3, 3, 32), scale=0.1), jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(32,), scale=0.1), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 32, 64), scale=0.1), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(64,), scale=0.1), jnp.float32)
    w0s = s2d_kernel_transform(w0).reshape(2, 2, 12, 32)
    w1s = s2d_kernel_transform(w1).reshape(2, 2, 128, 64)

    def std(x):
        x = leaky(conv(x, w0, 2) + b0.astype(x.dtype))
        return leaky(conv(x, w1, 2) + b1.astype(x.dtype))

    def s2d(x):
        x = space_to_depth2(x)
        x = leaky(conv(x, w0s, 1, [(1, 0), (1, 0)]) + b0.astype(x.dtype))
        x = space_to_depth2(x)
        return leaky(conv(x, w1s, 1, [(1, 0), (1, 0)]) + b1.astype(x.dtype))

    def s2d_first_only(x):
        x = space_to_depth2(x)
        x = leaky(conv(x, w0s, 1, [(1, 0), (1, 0)]) + b0.astype(x.dtype))
        return leaky(conv(x, w1, 2) + b1.astype(x.dtype))

    fns = {"std": jax.jit(std), "s2d": jax.jit(s2d),
           "s2d0": jax.jit(s2d_first_only)}

    # numerical parity (f32 small input)
    xs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ref = std(xs)
    for name in ("s2d", "s2d0"):
        np.testing.assert_allclose(np.asarray(fns[name](xs)),
                                   np.asarray(ref), atol=2e-4, rtol=1e-4)
    print("parity OK", flush=True)

    x = jnp.asarray(rng.random((B, S, S, 3)), jnp.bfloat16)

    def timed(f):
        out = f(x)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(x)
        _ = float(out.astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / REPS * 1e3

    for n, f in fns.items():
        timed(f)
        print(f"compiled {n}", flush=True)
    med = {n: [] for n in fns}
    for t in range(TRIALS):
        for n, f in fns.items():
            med[n].append(timed(f))
        print(f"trial {t}: " + "  ".join(
            f"{n} {med[n][-1]:.2f}" for n in fns), flush=True)
    for n in fns:
        print(f"median {n}: {np.median(med[n]):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
