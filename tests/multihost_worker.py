"""Worker process for the 2-process DCN integration test.

Run via subprocess by tests/test_distributed_multihost.py:
    python multihost_worker.py <coordinator> <process_id> <n_processes> <out.json>

Each worker joins the jax.distributed job (the DCN path the reference never
had — SURVEY.md §2.3), takes its host_stripe of the AOI, "scans" it against
the deterministic FakeWorld ground truth (the full fetch+infer chain is
covered by the single-process e2e tests; the subject here is process
topology + cross-host merge), proves cross-process comms with a
process_allgather, and writes its per-stripe records to JSON.
"""

import json
import sys


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aerial_image_recognition_tpu.fetch.fake import FakeWorld
    from aerial_image_recognition_tpu.parallel.distributed import (
        host_stripe, initialize)

    coord, pid, nproc, out_path = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    ctx = initialize(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
    assert ctx.process_count == nproc, ctx

    bounds = (20.99, 52.19, 21.01, 52.21)
    stripe = host_stripe(bounds, ctx, halo_m=30.0)
    world = FakeWorld(n_cars=300)
    recs = []
    for i, (lon, lat, _hd) in enumerate(world.cars):
        if (stripe[0] <= lon <= stripe[2]
                and stripe[1] <= lat <= stripe[3]
                and bounds[0] <= lon <= bounds[2]
                and bounds[1] <= lat <= bounds[3]):
            # confidence deterministic per car so halo duplicates are exact
            # ties across hosts (the hard dedup case)
            recs.append({"lon": float(lon), "lat": float(lat),
                         "confidence": 0.5 + (i % 50) / 100.0})

    # Cross-process collective over the distributed runtime: every process
    # must see every other process's count.
    import numpy as np
    from jax.experimental import multihost_utils
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(recs)], np.int32)))

    with open(out_path, "w") as f:
        json.dump({"process_index": ctx.process_index,
                   "process_count": ctx.process_count,
                   "global_devices": ctx.global_devices,
                   "stripe": list(stripe),
                   "counts_allgather": counts.reshape(-1).tolist(),
                   "records": recs}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
