"""Shape-aware floor for the int8 s2d2 stems (round-5 roofline follow-up).

The roofline (examples/roofline_int8.py) showed the stems at 6.0 ms vs a
3.32 ms compute floor at the DENSE-matmul int8 ceiling — the one stage
with apparent headroom. But that floor assumes full MXU lane occupancy,
and stem1 emits only 64 channels against the 128 output lanes (stem0's
contraction is 2*2*48=192, also sub-ideal). This script measures the
SHAPE-AWARE ceiling: int8 matmuls with exactly the stems' contraction /
output widths, each stem conv isolated (raw, and with its fused
epilogue), and a 128-wide-padded variant of stem1 as a lane-underfill
diagnostic (same time as 64-wide => lanes were idle, the floor must be
revised; ~half the time at width 64 => XLA packs them, headroom is real).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_stem_floor.py
Env: SF_BATCH (128), SF_REPS (8), SF_TRIALS (5)
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aerial_image_recognition_tpu.models.int8 import (
        _DN, _stems_int8, quantize_bundle)
    from aerial_image_recognition_tpu.models.registry import create_model

    B = int(os.environ.get("SF_BATCH", "128"))
    REPS = int(os.environ.get("SF_REPS", "8"))
    TRIALS = int(os.environ.get("SF_TRIALS", "5"))
    rng = np.random.default_rng(0)

    bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
    calib = [rng.integers(0, 255, (16, 640, 640, 3), dtype=np.uint8)]
    qb = quantize_bundle(bundle, calib)
    sq = qb.params["q"]["stems"]

    H = 160
    xq = jnp.asarray(rng.integers(0, 256, (B, H, H, 48)), jnp.uint8)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, H, H, 48)), jnp.int8)
    h1 = jnp.asarray(rng.integers(-127, 128, (B, H, H, 128)), jnp.int8)

    def conv2(v, w):
        return lax.conv_general_dilated(
            v, w, (1, 1), [(1, 0), (1, 0)], dimension_numbers=_DN,
            preferred_element_type=jnp.int32)

    # --- candidates -------------------------------------------------------
    w1_128 = jnp.concatenate(
        [sq["w1"], jnp.zeros_like(sq["w1"])], axis=-1)   # 64 -> 128 lanes

    # matmul twins: identical contraction/output geometry, MXU-friendly M
    M = B * H * H
    a0 = jnp.asarray(rng.integers(-127, 128, (M, 192)), jnp.int8)
    k0 = jnp.asarray(rng.integers(-127, 128, (192, 128)), jnp.int8)
    a1 = jnp.asarray(rng.integers(-127, 128, (M, 512)), jnp.int8)
    k1 = jnp.asarray(rng.integers(-127, 128, (512, 64)), jnp.int8)
    k1w = jnp.asarray(rng.integers(-127, 128, (512, 128)), jnp.int8)

    def mm(a, k):
        return lax.dot_general(a, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    def rb_i32(o):
        return float(jnp.sum(o[:: max(1, o.shape[0] // 4)][..., ::16]
                             .astype(jnp.int32)))

    def rb_i8(o):
        return float(jnp.sum(o[:: max(1, B // 4), ::16, ::16]
                             .astype(jnp.int32)))

    cases = [
        # name, fn, args, readback, useful GFLOP
        ("conv0_raw", jax.jit(lambda a: conv2(a, sq["w0"])), (x8,), rb_i32,
         2 * M * 192 * 128 / 1e9),
        ("conv1_raw", jax.jit(lambda a: conv2(a, sq["w1"])), (h1,), rb_i32,
         2 * M * 512 * 64 / 1e9),
        ("conv1_pad128", jax.jit(lambda a: conv2(a, w1_128)), (h1,), rb_i32,
         2 * M * 512 * 64 / 1e9),
        ("mm_192x128", jax.jit(lambda a: mm(a, k0)), (a0,), rb_i32,
         2 * M * 192 * 128 / 1e9),
        ("mm_512x64", jax.jit(lambda a: mm(a, k1)), (a1,), rb_i32,
         2 * M * 512 * 64 / 1e9),
        ("mm_512x128", jax.jit(lambda a: mm(a, k1w)), (a1,), rb_i32,
         2 * M * 512 * 128 / 1e9),
        ("stems_full", jax.jit(lambda a: _stems_int8(qb.params["q"], a)),
         (xq,), rb_i8, 2 * M * (192 * 128 + 512 * 64) / 1e9),
    ]

    for name, jf, args, rb, _ in cases:
        t0 = time.perf_counter()
        rb(jf(*args))
        print(f"[warm] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {name: float("inf") for name, *_ in cases}
    for tr in range(TRIALS):
        for name, jf, args, rb, _ in cases:
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = jf(*args)
            rb(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / REPS * 1e3)
        print(f"[trial {tr}] " + " ".join(
            f"{n}={best[n]:.2f}" for n, *_ in cases), flush=True)

    rows = [{"case": name, "ms": round(best[name], 2),
             "gflop_useful": round(gf, 1),
             "tops_effective": round(gf / best[name], 1)}
            for name, _, _, _, gf in cases]
    out = {"metric": "stem_floor_ab", "batch": B, "cases": rows}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
