"""Ingest pipeline mechanics + yolov8 anchor-free loss."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.fetch.xyz import TileImage
from aerial_image_recognition_tpu.ingest.pipeline import (
    ThreadedPrefetcher, assemble_batches, run_pipeline,
)


def _tiles(n, size=32, fail_every=None):
    for i in range(n):
        if fail_every and i % fail_every == 0:
            yield i, None
        else:
            px = np.full((size, size, 3), i % 255, np.uint8)
            yield i, TileImage(px, (20.0 + i * 1e-4, 52.0,
                                    20.0 + (i + 1) * 1e-4, 52.0001))


def test_assemble_batches_shapes_and_padding():
    batches = list(assemble_batches(_tiles(10), batch_size=4, src_size=32))
    assert len(batches) == 3
    assert batches[0].images.shape == (4, 32, 32, 3)
    assert batches[0].n_valid == 4
    assert batches[2].n_valid == 2
    assert list(batches[2].indices[2:]) == [-1, -1]
    # bounds of padding rows are finite (degenerate)
    assert np.isfinite(batches[2].bounds).all()


def test_assemble_batches_records_failures():
    batches = list(assemble_batches(_tiles(9, fail_every=3),
                                    batch_size=4, src_size=32))
    failed = [i for b in batches for i in b.failed_indices]
    assert failed == [0, 3, 6]
    valid_total = sum(b.n_valid for b in batches)
    assert valid_total == 6


def test_assemble_batches_resizes_wrong_size():
    # reference behavior (gpu_handler.py:74-76): ragged tiles are resized
    # to the expected window, not fatal (round-3 parity fix; was a raise)
    px = np.full((16, 16, 3), 200, np.uint8)
    gen = iter([(0, TileImage(px, (0, 0, 1, 1)))])
    batches = list(assemble_batches(gen, batch_size=2, src_size=32))
    assert batches[0].n_valid == 1
    assert batches[0].images.shape[1:3] == (32, 32)
    assert batches[0].images[0].mean() > 150


def test_threaded_prefetcher_order_and_errors():
    batches = list(assemble_batches(_tiles(8), batch_size=4, src_size=32))
    pf = ThreadedPrefetcher(iter(batches), depth=2)
    got = list(pf)
    assert [b.n_valid for b in got] == [b.n_valid for b in batches]

    def boom():
        yield batches[0]
        raise RuntimeError("producer failed")
    pf2 = ThreadedPrefetcher(boom(), depth=2)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(pf2)


def test_run_pipeline_overlap_and_stats():
    batches = list(assemble_batches(_tiles(12), batch_size=4, src_size=32))

    @jax.jit
    def step(images, bounds):
        return jnp.sum(images.astype(jnp.float32), axis=(1, 2, 3)), bounds

    seen = []
    stats = run_pipeline(batches, step,
                         on_result=lambda b, o: seen.append(
                             (b.n_valid, float(np.asarray(o[0]).sum()))))
    assert stats["batches"] == 3
    assert stats["tiles"] == 12
    assert len(seen) == 3


def test_run_pipeline_keeps_one_batch_in_flight():
    """Readback of batch N must happen AFTER batch N+1 is dispatched, for
    every N (round-1 advisor finding: the old drain condition flushed the
    just-dispatched batch too, so overlap only happened every other
    batch)."""
    batches = list(assemble_batches(_tiles(16), batch_size=4, src_size=32))
    events = []

    def step(images, bounds):
        events.append(("dispatch", int(np.asarray(images)[0, 0, 0, 0])))
        return (images, bounds)

    def on_result(b, o):
        events.append(("readback", int(b.indices[0])))

    run_pipeline(batches, step, on_result, prefetch_device=False)
    assert events == [
        ("dispatch", 0), ("dispatch", 4), ("readback", 0),
        ("dispatch", 8), ("readback", 4),
        ("dispatch", 12), ("readback", 8), ("readback", 12)]


@pytest.mark.slow
def test_yolov8_loss_finite_and_learns(rng):
    from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
    from aerial_image_recognition_tpu.ops.losses import yolov8_loss
    import optax

    module = YOLOv8(num_classes=2, scale="n", dtype=jnp.float32)
    x = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3),
                                 dtype=np.uint8)).astype(jnp.float32) / 255
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    targets = np.full((2, 8, 5), -1.0, np.float32)
    targets[:, 0] = (0, 20.0, 24.0, 14.0, 10.0)   # size band → level 0
    targets[:, 1] = (1, 40.0, 40.0, 40.0, 40.0)   # larger → level 1
    targets = jnp.asarray(targets)

    def loss_fn(params):
        outs = module.apply({"params": params["params"],
                             "batch_stats": params["batch_stats"]},
                            x, train=False)
        return yolov8_loss(outs, targets, 2)

    (l0, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
    assert np.isfinite(float(l0))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # a few SGD steps reduce the loss
    tx = optax.adam(1e-3)
    state = tx.init(variables)
    v = variables
    for _ in range(5):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(v)
        upd, state = tx.update(g, state, v)
        v = optax.apply_updates(v, upd)
    l_final, _ = loss_fn(v)
    assert float(l_final) < float(l0)
