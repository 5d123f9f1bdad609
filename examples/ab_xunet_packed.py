"""A/B: standard XUnet-256 inference vs the packed s2d-layout lowering.

VERDICT r2 item 7: round 2 rejected the 2x2-cell U-Net lowering on an
estimate; this measures it. Interleaved same-process rounds (tunnel
throughput drifts), scalar readback before every timer stop (tunnel's
block_until_ready returns early), host relayout outside the timed region
(batch-assembly work, same PCIe bytes — the quad-stem precedent).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_xunet_packed.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.ops.packed_unet import (
        host_s2d, xunet_forward_packed)
    from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch

    import os
    B = int(os.environ.get("AB_BATCH", "256"))
    bundle = create_model("xunet_256", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    xu8 = [rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8)
           for _ in range(2)]
    x_std = [jnp.asarray(x) for x in xu8]
    x_pak = [jnp.asarray(host_s2d(x)) for x in xu8]

    @jax.jit
    def fwd_std(variables, images_u8):
        x = preprocess_batch(images_u8, out_size=256, dtype=jnp.bfloat16)
        return jax.nn.sigmoid(bundle.raw_apply(variables, x))

    @jax.jit
    def fwd_pak(variables, xq):
        return jax.nn.sigmoid(
            xunet_forward_packed(variables, xq, dtype=jnp.bfloat16))

    # parity spot-check on device (bf16: loose)
    print("compiling standard...", flush=True)
    t0 = time.perf_counter()
    a = np.asarray(fwd_std(bundle.params, x_std[0]))
    print(f"standard compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    from aerial_image_recognition_tpu.ops.packed_unet import s2d_unpack
    print("compiling packed...", flush=True)
    t0 = time.perf_counter()
    b = np.asarray(s2d_unpack(fwd_pak(bundle.params, x_pak[0])))
    print(f"packed compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    print("parity max-abs-diff:", float(np.abs(a - b).max()))

    def bench(fn, xs, iters=8):
        # scalar readback ONLY (tunnel rule: block_until_ready returns
        # early AND a full [B,256,256,1] pull would swamp the timing)
        out = fn(bundle.params, xs[0])
        float(out.sum())                             # settle
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(bundle.params, xs[i % 2])
            assert np.isfinite(float(out.sum()))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    rounds = []
    for r in range(3):                               # interleaved rounds
        t_std = bench(fwd_std, x_std)
        t_pak = bench(fwd_pak, x_pak)
        rounds.append((t_std, t_pak))
        print(f"round {r}: std {t_std*1e3:.2f} ms  packed {t_pak*1e3:.2f} ms", flush=True)
    t_std = min(t for t, _ in rounds)
    t_pak = min(t for _, t in rounds)
    print(json.dumps({
        "batch": B,
        "std_ms": round(t_std * 1e3, 2),
        "packed_ms": round(t_pak * 1e3, 2),
        "std_tiles_per_s": round(B / t_std, 1),
        "packed_tiles_per_s": round(B / t_pak, 1),
        "speedup": round(t_std / t_pak, 3),
    }))


if __name__ == "__main__":
    main()
