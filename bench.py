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


def _enable_compile_cache():
    """The env var above is ignored when sitecustomize already imported jax
    (this image does); set the config explicitly like tests/conftest.py."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def bench_e2e():
    """Full-chain throughput: host tile stream → ThreadedPrefetcher →
    run_pipeline (H2D upload → fused step → per-batch host readback).

    This is the honest version of beating the reference's serial
    fetch-then-infer loop (_script/detector.py:117-155): it includes batch
    assembly, host→device transfer and per-batch result readback, not just
    the jitted step on device-resident data. Reports the h2d/compute split
    so the tunnel-H2D artifact (axon H2D ≈ 1.6 GB/s vs real v5e PCIe) is
    visible rather than hidden. Prints ONE JSON line.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from aerial_image_recognition_tpu.fetch.xyz import TileImage
    from aerial_image_recognition_tpu.ingest.pipeline import (
        ThreadedPrefetcher, assemble_batches, run_pipeline)
    from aerial_image_recognition_tpu.pipeline.inference import build_detect_step
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n_batches = int(os.environ.get("BENCH_E2E_BATCHES", "16"))
    depth = int(os.environ.get("BENCH_E2E_DEPTH", "3"))

    cfg = DetectorConfig()
    step = build_detect_step(cfg, batch=batch)

    # Pool of distinct pre-decoded tiles (the fetch plane's decode output);
    # distinct buffers so neither XLA nor the tunnel can dedup transfers.
    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 255, (640, 640, 3), dtype=np.uint8)
            for _ in range(32)]
    n_tiles = batch * n_batches

    def tile_iter():
        for i in range(n_tiles):
            yield i, TileImage(pool[i % len(pool)],
                               (20.99, 52.21, 21.0, 52.22))

    def on_result(b, out):
        det, lon, lat = out
        assert np.isfinite(float(lon.sum()))   # per-batch host readback

    # Warmup: compile + first H2D (first device_put through the tunnel is
    # far slower than steady state)
    import itertools
    warm = list(itertools.islice(
        assemble_batches(tile_iter(), batch, 640,
                         layout=step.input_layout), 2))
    run_pipeline(warm, step, on_result)

    t0 = time.perf_counter()
    stats = run_pipeline(
        ThreadedPrefetcher(
            assemble_batches(tile_iter(), batch, 640,
                             layout=step.input_layout), depth=4),
        step, on_result, depth=depth)
    wall = time.perf_counter() - t0

    tiles_per_s = stats["tiles"] / wall
    baseline = 2000.0
    print(json.dumps({
        "metric": "e2e_pipeline_640px_tiles_per_sec_per_chip",
        "value": round(tiles_per_s, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_s / baseline, 4),
        "h2d_s": round(stats["h2d_s"], 3),
        "compute_s": round(stats["compute_s"], 3),
        "wall_s": round(wall, 3),
        "tiles": stats["tiles"],
    }))


def bench_mode(mode: str):
    """Production-path configurations beyond the headline (VERDICT r2
    item 3): 'src864' = the XYZ crop→resize geometry (864-px source tiles
    resized to 640 in the fused step — reference
    _script/xyz_handler.py:102-175); 'tta' = lighting/occlusion TTA with
    exact device CLAHE (gpu_handler.py:94-140 parity); 'dp1' = the
    data_parallel shard_map wrapping on a mesh(1) A/B'd against plain jit
    (shard_map overhead on hardware). Prints ONE JSON line per mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.inference import (
        build_detect_step)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    baseline = 2000.0
    rng = np.random.default_rng(0)

    def measure(step, src):
        imgs = [jnp.asarray(step.pack_images(
            rng.integers(0, 255, (batch, src, src, 3), dtype=np.uint8)))
            for _ in range(2)]
        bnds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                    jnp.float32), (batch, 1))
        if step.input_shardings is not None:
            imgs = [jax.device_put(im, step.input_shardings[0])
                    for im in imgs]
            bnds = jax.device_put(bnds, step.input_shardings[1])
        det, lon, lat = step.fn(step.bundle.params, imgs[0], bnds)
        float(np.asarray(lon).sum())                   # compile + settle
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                det, lon, lat = step.fn(step.bundle.params, imgs[i % 2],
                                        bnds)
            assert np.isfinite(float(np.asarray(lon).sum()))
            best = max(best, batch * iters / (time.perf_counter() - t0))
        return best

    if mode == "src864":
        cfg = DetectorConfig()
        step = build_detect_step(cfg, batch=batch, src_size=864)
        v = measure(step, 864)
        out = {"metric": "yolov7_itcvd_src864_to_640_tiles_per_sec_per_chip",
               "value": round(v, 2), "unit": "tiles/s",
               "vs_baseline": round(v / baseline, 4),
               "note": "XYZ production geometry: 864-px source windows, "
                       "device resize fused into the step (quad stem "
                       "correctly disabled)"}
    elif mode == "tta":
        cfg = DetectorConfig()
        cfg.extra["tta"] = True
        step = build_detect_step(cfg, batch=batch)
        v = measure(step, 640)
        out = {"metric": "yolov7_itcvd_tta_640px_tiles_per_sec_per_chip",
               "value": round(v, 2), "unit": "tiles/s",
               "vs_baseline": round(v / baseline, 4),
               "note": "full TTA ladder incl. exact device CLAHE "
                       "(gpu_handler.py:94-140 parity); throughput is "
                       "per SOURCE tile (each runs every variation)"}
    elif mode == "dp1":
        from jax.sharding import Mesh
        cfg = DetectorConfig()
        plain = build_detect_step(cfg, batch=batch)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        sharded = build_detect_step(cfg, batch=batch, mesh=mesh)
        # interleaved A/B (tunnel throughput drifts minute to minute)
        v_plain = v_dp = 0.0
        for _ in range(2):
            v_plain = max(v_plain, measure(plain, 640))
            v_dp = max(v_dp, measure(sharded, 640))
        out = {"metric": "yolov7_itcvd_dp_mesh1_tiles_per_sec_per_chip",
               "value": round(v_dp, 2), "unit": "tiles/s",
               "vs_baseline": round(v_dp / baseline, 4),
               "plain_jit": round(v_plain, 2),
               "shard_map_overhead_pct": round(
                   100.0 * (1.0 - v_dp / max(v_plain, 1e-9)), 2)}
    elif mode in ("int8", "int8_v8l"):
        # int8-trunk PTQ (models/int8.py): s8×s8→s32 convs on the MXU (2×
        # the bf16 rate on v5e) + int8 inter-layer HBM traffic. Interleaved
        # A/B against the bf16 step; accuracy parity is pinned by
        # tests/test_int8.py. 'int8_v8l' is the compute-bound end of the
        # ladder: YOLOv8-l ran ~90% of the chip's measured bf16 matmul
        # rate (STATUS.md), so the int8 MXU path is its only lever.
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        model, calib_b = (("yolov7_itcvd", 16) if mode == "int8"
                          else ("yolov8l", 8))
        if mode == "int8_v8l":
            batch = int(os.environ.get("BENCH_BATCH", "64"))
        cfg = DetectorConfig(model_path=model)
        bundle = create_model(model, dtype=jnp.bfloat16)
        calib = [rng.integers(0, 255, (calib_b, 640, 640, 3),
                              dtype=np.uint8)]
        qb = quantize_bundle(bundle, calib)
        step_q = build_detect_step(cfg, batch=batch, bundle=qb)
        step_f = build_detect_step(cfg, batch=batch, bundle=bundle)
        v_q = v_f = 0.0
        for _ in range(2):
            v_q = max(v_q, measure(step_q, 640))
            v_f = max(v_f, measure(step_f, 640))
        label = "yolov7_itcvd" if mode == "int8" else "yolov8l"
        out = {"metric": f"{label}_int8_640px_tiles_per_sec_per_chip",
               "value": round(v_q, 2), "unit": "tiles/s",
               "vs_baseline": round(v_q / baseline, 4),
               "bf16": round(v_f, 2),
               "int8_speedup_pct": round(100.0 * (v_q / max(v_f, 1e-9) - 1),
                                         2)}
    elif mode == "resize_ab":
        # interleaved A/B of the two src864 resize lowerings: the f32
        # gather jax.image.resize path vs the bf16 separable MXU
        # contraction (ops/preprocess._matmul_resize); optionally int8
        # trunks via BENCH_INT8=1 (parity pinned in tests)
        cfg_new, cfg_old = DetectorConfig(), DetectorConfig()
        cfg_old.extra["resize_matmul"] = False
        bundle = None
        if os.environ.get("BENCH_INT8"):
            from aerial_image_recognition_tpu.models.int8 import (
                quantize_bundle)
            b0 = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
            calib = [rng.integers(0, 255, (16, 640, 640, 3),
                                  dtype=np.uint8)]
            bundle = quantize_bundle(b0, calib)
        kw = dict(batch=batch, src_size=864)
        if bundle is not None:
            kw["bundle"] = bundle
        step_new = build_detect_step(cfg_new, **kw)
        step_old = build_detect_step(cfg_old, **kw)
        v_new = v_old = 0.0
        for _ in range(2):
            v_new = max(v_new, measure(step_new, 864))
            v_old = max(v_old, measure(step_old, 864))
        out = {"metric": "yolov7_itcvd_src864_resize_ab_tiles_per_sec",
               "value": round(v_new, 2), "unit": "tiles/s",
               "vs_baseline": round(v_new / baseline, 4),
               "gather_lowering": round(v_old, 2),
               "int8": bool(os.environ.get("BENCH_INT8")),
               "matmul_speedup_pct": round(
                   100.0 * (v_new / max(v_old, 1e-9) - 1), 2)}
    elif mode == "multiscale":
        # the multiscale mode — same scale set as the archived generation
        # (x_arch/03_analyze_wms cell 8: [0.85, 1.0, 1.15]); a pixel-rescale
        # approximation of the notebook's bbox-rescale (which refetched a
        # scaled ground bbox at fixed 640 px — see pipeline/inference.py).
        # Interleaved A/B of its device rescale lowering: bf16 MXU separable
        # contractions (ops/preprocess.matmul_resize_float) vs
        # jax.image.resize.
        cfg_new, cfg_old = DetectorConfig(), DetectorConfig()
        for c in (cfg_new, cfg_old):
            c.extra["multiscale"] = [0.85, 1.0, 1.15]
        cfg_old.extra["resize_matmul"] = False
        step_new = build_detect_step(cfg_new, batch=batch)
        step_old = build_detect_step(cfg_old, batch=batch)
        v_new = v_old = 0.0
        for _ in range(2):
            v_new = max(v_new, measure(step_new, 640))
            v_old = max(v_old, measure(step_old, 640))
        out = {"metric": "yolov7_itcvd_multiscale3_tiles_per_sec_per_chip",
               "value": round(v_new, 2), "unit": "tiles/s",
               "vs_baseline": round(v_new / baseline, 4),
               "gather_lowering": round(v_old, 2),
               "matmul_speedup_pct": round(
                   100.0 * (v_new / max(v_old, 1e-9) - 1), 2),
               "note": "3-scale union NMS; throughput is per SOURCE tile "
                       "(each forwards at 544/640/736)"}
    elif mode == "int8_multiscale":
        # int8 × the 3-scale multiscale mode (VERDICT r3 item 3 — the one
        # parity-pinned composition without a recorded number). Interleaved
        # A/B against the bf16 multiscale step; throughput per SOURCE tile.
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        cfg = DetectorConfig()
        cfg.extra["multiscale"] = [0.85, 1.0, 1.15]
        bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
        calib = [rng.integers(0, 255, (16, 640, 640, 3), dtype=np.uint8)]
        qb = quantize_bundle(bundle, calib)
        step_q = build_detect_step(cfg, batch=batch, bundle=qb)
        step_f = build_detect_step(cfg, batch=batch, bundle=bundle)
        v_q = v_f = 0.0
        for _ in range(2):                             # interleaved A/B
            v_q = max(v_q, measure(step_q, 640))
            v_f = max(v_f, measure(step_f, 640))
        out = {"metric":
               "yolov7_itcvd_int8_multiscale3_tiles_per_sec_per_chip",
               "value": round(v_q, 2), "unit": "tiles/s",
               "vs_baseline": round(v_q / baseline, 4),
               "bf16": round(v_f, 2),
               "int8_speedup_pct": round(100.0 * (v_q / max(v_f, 1e-9) - 1),
                                         2),
               "note": "3-scale union NMS; per SOURCE tile (each forwards "
                       "at 544/640/736)"}
    elif mode in ("int8_src864", "int8_tta"):
        # int8 × the deployed configurations: the XYZ crop→resize geometry
        # and the full TTA ladder (correctness of both compositions is
        # pinned by tests/test_int8.py; these record what they SUSTAIN)
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        cfg = DetectorConfig()
        src = 640
        kw = {}
        if mode == "int8_src864":
            kw["src_size"] = src = 864
        else:
            cfg.extra["tta"] = True
        bundle = create_model("yolov7_itcvd", dtype=jnp.bfloat16)
        calib = [rng.integers(0, 255, (16, 640, 640, 3), dtype=np.uint8)]
        qb = quantize_bundle(bundle, calib)
        step_q = build_detect_step(cfg, batch=batch, bundle=qb, **kw)
        step_f = build_detect_step(cfg, batch=batch, bundle=bundle, **kw)
        v_q = v_f = 0.0
        for _ in range(2):                             # interleaved A/B
            v_q = max(v_q, measure(step_q, src))
            v_f = max(v_f, measure(step_f, src))
        label = ("yolov7_itcvd_int8_src864_to_640" if mode == "int8_src864"
                 else "yolov7_itcvd_int8_tta_640px")
        out = {"metric": f"{label}_tiles_per_sec_per_chip",
               "value": round(v_q, 2), "unit": "tiles/s",
               "vs_baseline": round(v_q / baseline, 4),
               "bf16": round(v_f, 2),
               "int8_speedup_pct": round(100.0 * (v_q / max(v_f, 1e-9) - 1),
                                         2)}
    elif mode == "int8_xunet":
        # segmentation executor: XUnet-256 bf16 vs int8 trunk
        # (models/int8.quantize_xunet; mask parity pinned by
        # tests/test_int8.py::test_int8_xunet_mask_parity)
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        from aerial_image_recognition_tpu.pipeline.inference import (
            make_segment_fn)
        batch = int(os.environ.get("BENCH_BATCH", "256"))
        cfg = DetectorConfig()
        bundle = create_model("xunet_256", dtype=jnp.bfloat16)
        calib = [rng.integers(0, 255, (8, 256, 256, 3), dtype=np.uint8)]
        qb = quantize_bundle(bundle, calib)
        fn_f = jax.jit(make_segment_fn(bundle, cfg))
        fn_q = jax.jit(make_segment_fn(qb, cfg))
        imgs = [jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                         dtype=np.uint8)) for _ in range(2)]

        def seg_measure(fn, params):
            m = fn(params, imgs[0])
            float(jnp.sum(m))                          # compile + settle
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for i in range(iters):
                    m = fn(params, imgs[i % 2])
                assert np.isfinite(float(jnp.sum(m)))
                best = max(best, batch * iters / (time.perf_counter() - t0))
            return best

        v_q = v_f = 0.0
        for _ in range(2):                             # interleaved A/B
            v_q = max(v_q, seg_measure(fn_q, qb.params))
            v_f = max(v_f, seg_measure(fn_f, bundle.params))
        # vs_baseline here is vs the bf16 XUnet measured in the same
        # process — the 2000 t/s detector target is a different workload
        # (640px detection) and a cross-workload ratio would mislead
        out = {"metric": "xunet256_int8_tiles_per_sec_per_chip",
               "value": round(v_q, 2), "unit": "tiles/s",
               "vs_baseline": round(v_q / max(v_f, 1e-9), 4),
               "baseline_is": "same-process bf16 xunet",
               "bf16": round(v_f, 2),
               "int8_speedup_pct": round(100.0 * (v_q / max(v_f, 1e-9) - 1),
                                         2)}
    else:
        raise SystemExit(f"unknown BENCH_MODE {mode!r}")
    print(json.dumps(out))


def _guard_device_or_report() -> bool:
    """jax.devices() HANGS (not fails) when the axon tunnel's claim leg is
    wedged — observed live in round 3 (>12 h). A benchmark that hangs
    forever records nothing; probe with a timeout (runtime/doctor.py) and
    emit one honest JSON error line instead. Returns True when devices are
    reachable."""
    import jax

    from aerial_image_recognition_tpu.runtime.doctor import (
        _devices_with_timeout)
    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "300"))
    try:
        _devices_with_timeout(jax, timeout_s)
        return True
    except Exception as e:
        line = {
            "metric": "yolov7_itcvd_640px_tiles_per_sec_per_chip",
            "value": 0.0, "unit": "tiles/s", "vs_baseline": 0.0,
            "error": f"accelerator unreachable: {e}"[:300],
        }
        # Point at the last committed on-chip measurement so a wedged
        # tunnel at collection time reads as "unmeasurable now", not as a
        # throughput regression (the wedge outlasted 12 h in round 3).
        try:
            import glob
            cands = sorted(glob.glob(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r*.json")))
            if cands:
                with open(cands[-1]) as f:
                    prev = json.load(f)
                parsed = prev.get("parsed", prev)
                line["last_measured"] = parsed.get("value")
                line["last_measured_source"] = os.path.basename(cands[-1])
        except Exception:
            pass
        print(json.dumps(line))
        return False


def main():
    if not _guard_device_or_report():
        return 1
    if os.environ.get("BENCH_MODE"):
        return bench_mode(os.environ["BENCH_MODE"])
    if os.environ.get("BENCH_E2E"):
        return bench_e2e()
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    from aerial_image_recognition_tpu.pipeline.inference import (
        SelfQuantizingStep, build_detect_step)

    rng = np.random.default_rng(0)
    bounds = jnp.tile(jnp.asarray([[20.99, 52.21, 21.0, 52.22]],
                                  dtype=jnp.float32), (batch, 1))

    # Detection-BEARING tiles + the trained fixture (round 5, VERDICT r4
    # weak-1): the turnkey parity gate must validate on real detections —
    # BENCH_r04's committed parity block was {0,0,0} because random noise
    # under untrained weights detects nothing, which proved throughput but
    # zero parity. FakeWorld tiles at the fixture's training scale
    # (0.5 m/px → 320 m ground per 640-px tile) put ~15 cars per tile;
    # same program shapes either way, so throughput is unaffected.
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "fixtures",
                           "yolov7_tiny_fakeworld.npz")
    params_path = fixture if os.path.exists(fixture) else None
    if params_path:
        import math
        from aerial_image_recognition_tpu.fetch.fake import FakeWorld
        world = FakeWorld(center_lon=21.0, center_lat=52.2,
                          extent_deg=0.02, n_cars=800, seed=4)
        m2lon = 1.0 / (111319.9 * math.cos(math.radians(52.2)))
        m2lat = 1.0 / 111319.9
        half = 160.0                       # meters: 320 m tiles = 0.5 m/px
        pool = []
        for k in range(8):
            lon = 21.0 + (k - 3.5) * 0.002
            bb = (lon - half * m2lon, 52.2 - half * m2lat,
                  lon + half * m2lon, 52.2 + half * m2lat)
            pool.append(world.render(bb, 640, 640))
        reps = (batch + len(pool) - 1) // len(pool)
        base = np.tile(np.stack(pool), (reps, 1, 1, 1))[:batch]
        # two distinct buffers (shifted tile order) so neither XLA nor the
        # tunnel can dedup the alternating transfers
        raws = [base, np.roll(base, 1, axis=0)]
    else:
        raws = [rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)
                for _ in range(2)]

    # HEADLINE (round 4, VERDICT r3 item 2): the TURNKEY deployment path —
    # `detect --quantize int8` with no calibrate step. The step
    # self-calibrates on its own first batches, passes the bf16-vs-int8
    # parity gate and hot-swaps to the int8 program
    # (pipeline/inference.SelfQuantizingStep; parity on real detections is
    # pinned by tests/test_int8.py). Measured INTERLEAVED with the bf16
    # base step (tunnel throughput drifts minute to minute — CLAUDE.md).
    # BENCH_INT8=0 measures the plain bf16 step alone (the old headline).
    cfg = DetectorConfig(params_path=params_path)
    turnkey = os.environ.get("BENCH_INT8", "1") != "0"
    if turnkey:
        cfg.extra["quantize"] = "int8"
    step = build_detect_step(cfg, batch=batch)

    state = "bf16-only"
    if isinstance(step, SelfQuantizingStep):
        # drive the real turnkey flow: the first two batches calibrate
        step(raws[0], bounds)
        step(raws[1], bounds)
        state = step.quantize_state
        bf16_step = step.base_step
        q_step = step.active_step if state == "int8" else None
    else:
        bf16_step, q_step = step, None

    def stage(s):
        return [jnp.asarray(s.pack_images(r)) for r in raws]

    imgs_f = stage(bf16_step)
    imgs_q = stage(q_step) if q_step is not None else None

    # Warmup (compile + first-dispatch costs)
    det, lon, lat = bf16_step.fn(bf16_step.bundle.params, imgs_f[0], bounds)
    float(np.asarray(lon).sum())

    # Steady state, best of 3 interleaved rounds; a scalar readback (not
    # just block_until_ready, which returns early through the axon tunnel)
    # forces real completion.
    tiles_per_s = v_q = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            det, lon, lat = bf16_step.fn(bf16_step.bundle.params,
                                         imgs_f[i % 2], bounds)
        assert np.isfinite(float(np.asarray(lon).sum()))
        tiles_per_s = max(tiles_per_s,
                          batch * iters / (time.perf_counter() - t0))
        if q_step is not None:
            t0 = time.perf_counter()
            for i in range(iters):
                det, lon, lat = q_step.fn(q_step.bundle.params,
                                          imgs_q[i % 2], bounds)
            assert np.isfinite(float(np.asarray(lon).sum()))
            v_q = max(v_q, batch * iters / (time.perf_counter() - t0))
    baseline = 2000.0  # tiles/s/chip target (BASELINE.json north star)

    # Real-lowering smoke for the Pallas CLAHE apply kernel (VERDICT r4
    # task 2): the kernel is opt-in (backend='pallas' — the round-5 A/B
    # measured XLA faster, BASELINE.md), but its on-chip COMPILE must stay
    # regression-guarded somewhere that runs on real hardware — the test
    # suite is CPU-only and interpret mode demonstrably hides lowering
    # bugs (round 4: 4 of them). Tiny shape (1x128x128, ~ms), result
    # embedded as a field; failures are recorded, not fatal to the bench.
    smoke = None
    if os.environ.get("BENCH_CLAHE_SMOKE", "1") != "0":
        try:
            from aerial_image_recognition_tpu.ops.clahe import (
                clahe_gray_device)
            l8 = jnp.asarray(rng.integers(0, 256, (1, 128, 128)), jnp.int32)
            got = np.asarray(clahe_gray_device(l8, 2.0, backend="pallas"))
            want = np.asarray(clahe_gray_device(l8, 2.0, backend="xla"))
            smoke = ("ok" if np.array_equal(got, want)
                     else f"MISMATCH maxabs={np.abs(got - want).max()}")
        except Exception as e:                         # noqa: BLE001
            smoke = f"ERROR: {e}"[:200]

    # Real-lowering smoke for box voting (ops/nms.box_voting): its einsum
    # must carry Precision.HIGHEST — at the TPU default the MXU rounds the
    # f32 box coordinates to bf16 (±2 px ULP at 640 px), which the round-5
    # A/B measured as a mAP50 collapse (0.703→0.297) while CPU (where the
    # whole suite runs) computes einsum at full precision and shows
    # nothing. Guard: a single-voter vote must return the box bit-near
    # itself (<0.05 px) on 600-px-scale coordinates.
    bv_smoke = None
    if os.environ.get("BENCH_BV_SMOKE", "1") != "0":
        try:
            from aerial_image_recognition_tpu.ops.nms import (
                Detections, box_voting)
            # disjoint 9×4 px boxes at 600-px-scale coordinates: each box's
            # only voter is itself, so any output drift is pure precision
            bx = jnp.asarray(
                [[[310.7 + 40 * i, 501.3 + (i % 3), 9.2, 4.1]
                  for i in range(8)]], jnp.float32)
            det_s = Detections(
                boxes=bx, scores=jnp.full((1, 8), 0.9, jnp.float32),
                classes=jnp.zeros((1, 8), jnp.int32),
                valid=jnp.ones((1, 8), bool))
            vt = box_voting(det_s, bx, det_s.scores, det_s.classes,
                            vote_iou=0.5, conf_threshold=0.1,
                            class_aware=True)
            err = float(jnp.max(jnp.abs(vt.boxes - bx)))
            bv_smoke = "ok" if err < 0.05 else f"PRECISION LOSS {err:.3f} px"
        except Exception as e:                         # noqa: BLE001
            bv_smoke = f"ERROR: {e}"[:200]

    # Same bug class, second site: matmul_resize_float's f32 path promises
    # full f32 precision (its 4e-5 parity pin runs on CPU only) — on TPU
    # that requires the Precision.HIGHEST pin in _separable_resize_core.
    rz_smoke = None
    if os.environ.get("BENCH_RESIZE_SMOKE", "1") != "0":
        try:
            from aerial_image_recognition_tpu.ops.preprocess import (
                matmul_resize_float)
            xf = jnp.asarray(rng.random((2, 96, 96, 3)), jnp.float32)
            got = matmul_resize_float(xf, 64, "bilinear")
            want = jax.image.resize(xf, (2, 64, 64, 3), method="bilinear")
            err = float(jnp.max(jnp.abs(got - want)))
            rz_smoke = "ok" if err < 1e-4 else f"PRECISION LOSS {err:.2e}"
        except Exception as e:                         # noqa: BLE001
            rz_smoke = f"ERROR: {e}"[:200]

    if q_step is not None:
        out = {
            "metric": "yolov7_itcvd_640px_turnkey_int8_tiles_per_sec_per_chip",
            "value": round(v_q, 2),
            "unit": "tiles/s",
            "vs_baseline": round(v_q / baseline, 4),
            "bf16_tiles_per_s": round(tiles_per_s, 2),
            "bf16_vs_baseline": round(tiles_per_s / baseline, 4),
            "turnkey_state": state,
            "parity": step.parity,
        }
        if smoke is not None:
            out["clahe_pallas_smoke"] = smoke
        if bv_smoke is not None:
            out["box_voting_smoke"] = bv_smoke
        if rz_smoke is not None:
            out["resize_f32_smoke"] = rz_smoke
    else:
        # turnkey declined (parity/fallback) or BENCH_INT8=0: report the
        # bf16 path under its round-1..3 metric name for comparability
        out = {
            "metric": "yolov7_itcvd_640px_tiles_per_sec_per_chip",
            "value": round(tiles_per_s, 2),
            "unit": "tiles/s",
            "vs_baseline": round(tiles_per_s / baseline, 4),
            "turnkey_state": state,
        }
        if state == "bf16-fallback":
            out["fallback_reason"] = step.fallback_reason
        if smoke is not None:
            out["clahe_pallas_smoke"] = smoke
        if bv_smoke is not None:
            out["box_voting_smoke"] = bv_smoke
        if rz_smoke is not None:
            out["resize_f32_smoke"] = rz_smoke
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
