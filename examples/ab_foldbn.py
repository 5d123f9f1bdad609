"""A/B: standard BN-inference graph vs folded conv+bias lowering (TPU).

Interleaved trials (CLAUDE.md: tunnel variance demands interleaving).
Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_foldbn.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aerial_image_recognition_tpu.models.layers import (
    fold_batchnorm, folded_convbn)
from aerial_image_recognition_tpu.models.registry import create_model

B, S = 128, 640
REPS, TRIALS = 10, 6

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16, seed=0)
    x = jnp.asarray(
        np.random.default_rng(0).random((B, S, S, 3)), jnp.bfloat16)

    fwd_std = jax.jit(lambda v, im: bundle.forward(v, im))
    folded = fold_batchnorm(bundle.params, eps=1e-5)  # yolov7 family eps

    def fwd_folded_traced(v, im):
        with folded_convbn():
            return bundle.forward(v, im)
    fwd_fold = jax.jit(fwd_folded_traced)

    # parity spot-check on device
    rb, rs = fwd_std(bundle.params, x)
    fb, fs = fwd_fold(folded, x)
    err = float(jnp.max(jnp.abs(rb.astype(jnp.float32)
                                - fb.astype(jnp.float32))))
    print(f"max-abs-diff big head: {err:.4f}", flush=True)

    def timed(fn, v):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(v, x)
        _ = float(out[0].astype(jnp.float32).sum())  # forced readback
        return (time.perf_counter() - t0) / REPS * 1e3

    timed(fwd_std, bundle.params)
    timed(fwd_fold, folded)
    std_ms, fold_ms = [], []
    for t in range(TRIALS):
        std_ms.append(timed(fwd_std, bundle.params))
        fold_ms.append(timed(fwd_fold, folded))
        print(f"trial {t}: std {std_ms[-1]:.2f} ms  fold {fold_ms[-1]:.2f} ms",
              flush=True)
    print(f"median std  {np.median(std_ms):.2f} ms  "
          f"({B/np.median(std_ms)*1e3:.0f} t/s)", flush=True)
    print(f"median fold {np.median(fold_ms):.2f} ms  "
          f"({B/np.median(fold_ms)*1e3:.0f} t/s)", flush=True)


if __name__ == "__main__":
    main()
