"""Multi-host (DCN) scaling helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3). The
TPU framework scales a city scan across hosts with jax.distributed: every
host joins the global mesh (ICI within a slice, DCN across), fetches ONLY
its own AOI stripe's tiles (parallel.stripes.split_aoi_stripes — the
fetch-plane analogue of the reference's per-server queue sharding at
simple_detector.py:176-179), runs the same jitted detect step on its local
devices, and the cross-stripe dedup rides the halo exchange.

Single-host multi-device works identically with no initialization (the
default mesh covers local devices).
"""

import os
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass
class DistributedContext:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> DistributedContext:
    """Join (or skip, when single-host) the jax.distributed job.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so a
    launcher only needs to export those.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(
                os.environ.get("JAX_PROCESS_ID", "0")))
    return DistributedContext(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count())


def host_stripe(bounds, ctx: DistributedContext,
                halo_m: float = 64.0) -> Tuple[float, float, float, float]:
    """The WGS84 sub-AOI this host should fetch and scan: one stripe per
    process, halo-widened so cross-host dedup only needs the boundary
    band."""
    from aerial_image_recognition_tpu.parallel.stripes import split_aoi_stripes
    stripes, _, _ = split_aoi_stripes(bounds, max(ctx.process_count, 1),
                                      halo_m=halo_m)
    return tuple(stripes[ctx.process_index])


def merge_host_detections(records, radius_m: float):
    """Host-local convenience: after per-host scans write per-stripe
    GeoJSONs, any host (or a driver) concatenates and runs the global
    dedup — the exact grid-bucketed kernel, so the merged output equals a
    single-host scan."""
    from aerial_image_recognition_tpu.post.dedup import dedup_records
    return dedup_records(list(records), radius_m)
