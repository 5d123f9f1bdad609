"""Multi-host (DCN) integration: two real jax.distributed processes.

Closes SURVEY.md §2.3's distributed-comms row at the level this environment
allows (no second host): two OS processes join one jax.distributed job over
a local coordinator, each scans only its host_stripe of the AOI (fetch-plane
sharding — the reference's closest analogue is per-server HTTP round-robin,
simple_detector.py:176-179), they exchange counts with a cross-process
allgather, and the merged detection set must equal a single-process scan.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
BOUNDS = (20.99, 52.19, 21.01, 52.21)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_scan_merges_to_single_process_result(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"host{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(i), "2", outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=300)
            logs.append(stdout.decode(errors="replace"))
        assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = [json.load(open(o)) for o in outs]
    assert {r["process_index"] for r in results} == {0, 1}
    assert all(r["process_count"] == 2 for r in results)
    # the distributed job aggregates devices across both processes
    assert all(r["global_devices"] >= 2 for r in results)
    # allgather delivered both counts to both processes
    counts = [len(r["records"]) for r in sorted(results,
                                                key=lambda r: r["process_index"])]
    assert all(r["counts_allgather"] == counts for r in results)

    # halo overlap ⇒ border cars are detected by BOTH hosts
    all_recs = [rec for r in results for rec in r["records"]]
    assert len(all_recs) > max(counts), "expected cross-border duplicates"

    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.parallel.distributed import (
        merge_host_detections)

    merged = merge_host_detections(all_recs, radius_m=1.0)

    # single-process reference scan over the whole AOI
    world = FakeWorld(n_cars=300)
    single = [{"lon": float(lon), "lat": float(lat),
               "confidence": 0.5 + (i % 50) / 100.0}
              for i, (lon, lat, _hd) in enumerate(world.cars)
              if BOUNDS[0] <= lon <= BOUNDS[2]
              and BOUNDS[1] <= lat <= BOUNDS[3]]
    from aerial_image_recognition_tpu.post.dedup import dedup_records
    single = dedup_records(single, radius_m=1.0)

    got = sorted((round(r["lon"], 9), round(r["lat"], 9)) for r in merged)
    want = sorted((round(r["lon"], 9), round(r["lat"], 9)) for r in single)
    assert got == want
