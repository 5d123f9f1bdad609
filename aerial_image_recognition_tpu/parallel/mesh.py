"""Device mesh + sharding helpers.

The reference is single-process single-GPU (device_id 0 hardcoded,
_script/gpu_handler.py:42) with no collective layer (SURVEY.md §2.3). The
TPU rebuild's primary parallelism is data parallelism over tiles: a 1-D
``data`` mesh; batches sharded on axis 0; params replicated. Multi-host city
scans extend the same mesh over DCN via jax.distributed (each host fetches
only its own AOI stripe — see parallel.stripes).
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def mesh_from_flag(dp) -> Optional[Mesh]:
    """Config-level data-parallel knob → mesh (or None when off).

    ``True`` uses every visible device; an int limits the mesh size. Shared
    by CarDetector and DetectionServer so `data_parallel: true` means the
    same thing everywhere.
    """
    if not dp:
        return None
    return make_mesh(None if isinstance(dp, bool) else int(dp))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (the tile batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """device_put host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> Tuple[np.ndarray, int]:
    """Pad axis to a multiple (static shapes for pjit); returns (arr, n_pad)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, 0
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill), pad
