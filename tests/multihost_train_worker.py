"""Worker process for the 2-process DCN TRAINING integration test.

Run via subprocess by tests/test_distributed_multihost.py:
    python multihost_train_worker.py <coordinator> <process_id> \
        <n_processes> <out.json>

Each worker joins the jax.distributed job and runs the PRODUCTION
mesh-sharded train step (pipeline/train.make_train_step) over a mesh that
spans both processes' devices: per-step global batches are assembled with
jax.make_array_from_process_local_data (each process owns its rows), and
XLA's automatic gradient all-reduce crosses the process boundary — the
DCN leg of SURVEY.md §2.3 for the TRAINING plane, which the detection
multihost test doesn't exercise (the reference trained on one Colab GPU;
x_arch/01_train_tokyo.ipynb cell 14).

The data stream is a seeded function of the step index only, so the
parent test can rerun the identical stream single-process and assert the
final parameters match.
"""

import json
import os
import sys


BATCH = 8
SIZE = 64
STEPS = 3


def batch_for_step(t: int):
    """Deterministic global batch for step t (same on every process)."""
    import numpy as np
    rng = np.random.default_rng(1000 + t)
    imgs = rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    # blobby masks so the loss has structure (not pure noise)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    masks = np.zeros((BATCH, SIZE, SIZE, 1), np.float32)
    for b in range(BATCH):
        cy, cx = rng.integers(8, SIZE - 8, 2)
        r = rng.integers(4, 12)
        masks[b, :, :, 0] = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)
    return imgs, masks


def param_probe(params):
    """Order-stable flattened probe of the parameter tree."""
    import jax
    import numpy as np
    leaves = jax.tree_util.tree_leaves(params)
    checksum = float(sum(float(np.abs(np.asarray(l, np.float64)).sum())
                         for l in leaves))
    head = np.asarray(leaves[0], np.float32).reshape(-1)[:16]
    return checksum, head.tolist()


def train(mesh_devices, steps=STEPS):
    """Run the production train step; mesh_devices=None → plain jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aerial_image_recognition_tpu.models.registry import create_model
    from aerial_image_recognition_tpu.pipeline.train import (
        init_train_state, make_optimizer, make_train_step)

    bundle = create_model("xunet_256", dtype=jnp.float32)
    tx = make_optimizer(lr=1e-3, weight_decay=0.0)
    mesh = (Mesh(np.asarray(mesh_devices), ("data",))
            if mesh_devices is not None else None)
    step_fn = make_train_step(bundle, tx, mesh=mesh, bn_mode="frozen")
    state = init_train_state(bundle, tx)
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
        data_sh = NamedSharding(mesh, P("data"))
    losses = []
    for t in range(steps):
        imgs, masks = batch_for_step(t)
        if mesh is not None:
            n = jax.process_count()
            pid = jax.process_index()
            lo, hi = pid * BATCH // n, (pid + 1) * BATCH // n
            gi = jax.make_array_from_process_local_data(data_sh, imgs[lo:hi])
            gm = jax.make_array_from_process_local_data(data_sh,
                                                        masks[lo:hi])
        else:
            gi, gm = imgs, masks
        state, metrics = step_fn(state, gi, gm)
        losses.append(float(metrics["loss"]))
    params = jax.device_get(state["params"])
    return losses, params


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np

    from aerial_image_recognition_tpu.parallel.distributed import initialize

    coord, pid, nproc, out_path = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    ctx = initialize(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
    assert ctx.process_count == nproc, ctx

    # Establish the collective transport while every worker is at the same
    # point (Gloo pair CONNECT has a deadline; see multihost_worker.py).
    from jax.experimental import multihost_utils
    multihost_utils.process_allgather(np.zeros(1, np.int32))

    losses, params = train(jax.devices())
    checksum, head = param_probe(params)

    # every process must have converged to the SAME replicated parameters
    sums = np.asarray(multihost_utils.process_allgather(
        np.asarray([checksum], np.float64)))

    with open(out_path, "w") as f:
        json.dump({"process_index": ctx.process_index,
                   "process_count": ctx.process_count,
                   "global_devices": ctx.global_devices,
                   "losses": losses,
                   "checksum": checksum,
                   "checksums_allgather": sums.reshape(-1).tolist(),
                   "param_head": head}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
