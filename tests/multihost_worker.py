"""Worker process for the 2-process DCN integration test.

Run via subprocess by tests/test_distributed_multihost.py:
    python multihost_worker.py <coordinator> <process_id> <n_processes> \
        <out.json> <tile_server_url> <frame.geojson>

Each worker joins the jax.distributed job (the DCN path the reference never
had — SURVEY.md §2.3) and runs the REAL pipeline over its share of the AOI:
a full CarDetector scan (fetch from the shared fake tile server → batched
jitted inference with the committed trained fixture → device NMS → georef),
restricted to its stripe of the deterministic GLOBAL tile grid via the
tile_filter hook. Per-tile results are therefore bitwise-identical to a
single-process scan of the same tiles; the test asserts the cross-host
merge equals the single-process result exactly. Cross-process comms are
proven with a process_allgather of the per-host counts.
"""

import json
import os
import sys


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np
    import jax.numpy as jnp

    from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
    from aerial_image_recognition_tpu.gio.geojson import read_geojson
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.parallel.distributed import initialize
    from aerial_image_recognition_tpu.pipeline.detector import CarDetector
    from aerial_image_recognition_tpu.pipeline.inference import (
        DetectStep, make_detect_fn)
    from aerial_image_recognition_tpu.runtime.config import DetectorConfig

    (coord, pid, nproc, out_path, server_url, frame_path) = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6])
    ctx = initialize(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
    assert ctx.process_count == nproc, ctx

    # Establish the cross-process collective transport NOW, while every
    # worker is at the same point: the scans below can finish minutes
    # apart (cold jit cache, CPU contention), and Gloo's pair CONNECT
    # times out if the first-ever collective is attempted with that skew.
    # After this barrier the post-scan allgather only waits on recv,
    # which has no connect deadline.
    from jax.experimental import multihost_utils
    multihost_utils.process_allgather(np.zeros(1, np.int32))

    # AOI bounds come from the shared frame; the GLOBAL tile grid is a pure
    # function of them, so every process derives the identical grid and
    # scans a disjoint stripe of it (fetch-plane sharding).
    frame = read_geojson(frame_path)
    ring = np.asarray(
        frame["features"][0]["geometry"]["coordinates"][0], np.float64)
    west, east = ring[:, 0].min(), ring[:, 0].max()
    lon_edges = np.linspace(west, east, nproc + 1)

    def stripe_filter(tiles: np.ndarray) -> np.ndarray:
        centers = (tiles[:, 0] + tiles[:, 2]) / 2.0
        lo, hi = lon_edges[pid], lon_edges[pid + 1]
        mask = (centers >= lo) & (centers < hi)
        if pid == nproc - 1:
            mask |= centers >= hi          # east edge inclusive on the last
        return mask

    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures", "yolov7_tiny_fakeworld.npz")
    cfg = DetectorConfig(confidence_threshold=0.4, nms_iou_threshold=0.45,
                         duplicate_distance=0.0)
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(fixture))
    fn = jax.jit(make_detect_fn(bundle, cfg, model_size=96))
    step = DetectStep(bundle=bundle, fn=fn, batch=16, input_size=96,
                      model_size=96)
    fetcher = WMSFetcher(server_url + "/wms", layer="fake", size=(96, 96),
                         num_workers=8, submit_spacing=0.0)

    import tempfile
    workdir = tempfile.mkdtemp(prefix=f"dcn_host{pid}_")
    det = CarDetector(workdir, {
        "frame_path": frame_path,
        "tile_size_meters": 48.0,
        "tile_overlap": 0.25,
        "confidence_threshold": 0.4,
        "duplicate_distance": 0.0,       # dedup happens at the MERGE
        "batch_size": 32, "device_batch": 16,
        "checkpoint_interval": 10**9,
    }, fetcher=fetcher, detect_step=step, tile_filter=stripe_filter)
    summary = det.detect(interactive=False, force_restart=True)

    from aerial_image_recognition_tpu.gio.geojson import (
        feature_collection_to_detections)
    recs = feature_collection_to_detections(read_geojson(summary["output"]))

    # Cross-process collective over the distributed runtime: every process
    # must see every other process's count.
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(recs)], np.int32)))

    with open(out_path, "w") as f:
        json.dump({"process_index": ctx.process_index,
                   "process_count": ctx.process_count,
                   "global_devices": ctx.global_devices,
                   "stripe_lon": [float(lon_edges[pid]),
                                  float(lon_edges[pid + 1])],
                   "tiles_scanned": summary["tiles"],
                   "counts_allgather": counts.reshape(-1).tolist(),
                   "records": recs}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
