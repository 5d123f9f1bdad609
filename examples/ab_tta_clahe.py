"""Interleaved on-chip A/B of the TTA ladder's CLAHE levers (VERDICT r3
task 5: push full-ladder TTA from 353.7 t/s toward the ~590 t/s 8-forward
bound).

Levers measured (reference TTA ladder: _script/gpu_handler_archive.py:69-122):
  - LUT-apply backend: 'xla' (round-3 deployed blocked bit-split lookup)
    vs 'pallas' (ops/clahe_pallas v2 — one program per half-tile block,
    VMEM-resident one-hot shared across the 3 clip variants).
  - hist_subsample: 1 (bit-exact cv2 parity) vs 2 (stride-2 lattice
    histogram estimation — accuracy delta pinned in
    tests/test_clahe.py::test_hist_subsample_accuracy_and_guard).

Interleaved rounds (tunnel throughput drifts minute to minute — CLAUDE.md);
per-round best-of kept. One JSON line per configuration at the end.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python examples/ab_tta_clahe.py
Env:    AB_BATCH (128), AB_ITERS (8), AB_ROUNDS (3), AB_INT8 (1: also run
        the int8 trunk with the winning bf16 config).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    cache = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = int(os.environ.get("AB_BATCH", "128"))
    iters = int(os.environ.get("AB_ITERS", "8"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    rng = np.random.default_rng(0)

    configs = [
        ("xla_s1", "xla", 1),        # round-3 deployed path
        ("pallas_s1", "pallas", 1),  # kernel v2, bit-exact histograms
        ("pallas_s2", "pallas", 2),  # kernel v2 + stride-2 histograms
        ("xla_s2", "xla", 2),        # isolates the histogram lever
    ]

    # --- stage micro-bench: the CLAHE stage alone (hist+LUT+apply, V=3,
    # gray L channel), xla blocked vs pallas kernel. Interleaved rounds +
    # best-of, same tunnel-drift discipline as the main loop -----------
    from aerial_image_recognition_tpu.ops.clahe import (
        clahe_gray_device_multi)
    l8 = jnp.asarray(rng.integers(0, 256, (batch, 640, 640)), jnp.int32)
    stage_fns = {}
    for bk in ("xla", "pallas"):
        f = jax.jit(lambda a, _bk=bk: clahe_gray_device_multi(
            a, [2.0, 3.0, 4.0], backend=_bk))
        float(jnp.sum(f(l8)[:, ::97, ::97, ::97]))        # compile
        stage_fns[bk] = f
    stage_best = {bk: float("inf") for bk in stage_fns}
    for _ in range(rounds):
        for bk, f in stage_fns.items():
            t0 = time.perf_counter()
            for _ in range(8):
                r = f(l8)
            float(jnp.sum(r[:, ::97, ::97, ::97]))
            stage_best[bk] = min(stage_best[bk],
                                 (time.perf_counter() - t0) / 8 * 1e3)
    for bk, dt in stage_best.items():
        print(json.dumps({"metric": f"clahe_stage_ms_per_128batch_{bk}",
                          "value": round(dt, 2), "unit": "ms"}),
              flush=True)

    steps = {}
    for name, backend, sub in configs:
        cfg = DetectorConfig()
        cfg.extra["tta"] = True
        cfg.extra["tta_clahe_backend"] = backend
        cfg.extra["tta_hist_subsample"] = sub
        steps[name] = build_detect_step(cfg, batch=batch)

    # 0..255 INCLUSIVE: 255 is the LUT/CDF edge case (ADVICE r4)
    imgs_np = rng.integers(0, 256, (2, batch, 640, 640, 3), dtype=np.uint8)
    bnds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                jnp.float32), (batch, 1))

    def compile_and_check(name):
        st = steps[name]
        imgs = [jnp.asarray(st.pack_images(imgs_np[i])) for i in range(2)]
        t0 = time.perf_counter()
        det, lon, lat = st.fn(st.bundle.params, imgs[0], bnds)
        s = float(np.asarray(lon).sum())
        print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s "
              f"(lon sum {s:.3f})", flush=True)
        return imgs

    inputs = {}
    for name, _, _ in configs:
        inputs[name] = compile_and_check(name)

    # parity spot-check on chip: pallas_s1 must match xla_s1 detections
    # (same histogram path, kernel vs jnp apply — bit-identical by design)
    da = steps["xla_s1"].fn(
        steps["xla_s1"].bundle.params, inputs["xla_s1"][0], bnds)
    db = steps["pallas_s1"].fn(
        steps["pallas_s1"].bundle.params, inputs["pallas_s1"][0], bnds)
    par = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32))))
              for a, b in zip(jax.tree_util.tree_leaves(da),
                              jax.tree_util.tree_leaves(db)))
    print(f"[parity] pallas_s1 vs xla_s1 max|Δdet| = {par:.6f}", flush=True)
    # bit-identical by design (same histogram path, kernel vs jnp apply) —
    # a kernel regression must ABORT the A/B, not let it report stale
    # throughput comparisons (ADVICE r4)
    assert par == 0.0, (
        f"pallas_s1 diverged from xla_s1 (max|Δdet| = {par}) — CLAHE "
        "kernel regression; aborting the A/B")

    best = {name: 0.0 for name, _, _ in configs}
    for r in range(rounds):
        for name, _, _ in configs:
            st, imgs = steps[name], inputs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                det, lon, lat = st.fn(st.bundle.params, imgs[i % 2], bnds)
            assert np.isfinite(float(np.asarray(lon).sum()))
            rate = batch * iters / (time.perf_counter() - t0)
            best[name] = max(best[name], rate)
            print(f"[round {r}] {name}: {rate:.1f} t/s", flush=True)

    for name, backend, sub in configs:
        print(json.dumps({
            "metric": f"tta_640px_tiles_per_sec_{name}",
            "value": round(best[name], 2), "unit": "tiles/s",
            "backend": backend, "hist_subsample": sub,
            "parity_pallas_vs_xla_maxabs": par}), flush=True)

    if os.environ.get("AB_INT8", "1") != "0":
        # int8 trunk with the winning bf16 config (round-3 int8 TTA: 458.1)
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        from aerial_image_recognition_tpu.models.registry import create_model
        win = max(best, key=best.get)
        _, backend, sub = next(c for c in configs if c[0] == win)
        bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
        calib = [rng.integers(0, 255, (16, 640, 640, 3), dtype=np.uint8)]
        qb = quantize_bundle(bundle, calib)
        cfg = DetectorConfig()
        cfg.extra["tta"] = True
        cfg.extra["tta_clahe_backend"] = backend
        cfg.extra["tta_hist_subsample"] = sub
        stq = build_detect_step(cfg, batch=batch, bundle=qb)
        imgs = [jnp.asarray(stq.pack_images(imgs_np[i])) for i in range(2)]
        det, lon, lat = stq.fn(stq.bundle.params, imgs[0], bnds)
        float(np.asarray(lon).sum())
        bq = 0.0
        for r in range(rounds):
            t0 = time.perf_counter()
            for i in range(iters):
                det, lon, lat = stq.fn(stq.bundle.params, imgs[i % 2], bnds)
            assert np.isfinite(float(np.asarray(lon).sum()))
            bq = max(bq, batch * iters / (time.perf_counter() - t0))
            print(f"[int8 round {r}] {win}: {bq:.1f} t/s", flush=True)
        print(json.dumps({
            "metric": f"tta_640px_tiles_per_sec_int8_{win}",
            "value": round(bq, 2), "unit": "tiles/s",
            "backend": backend, "hist_subsample": sub}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
