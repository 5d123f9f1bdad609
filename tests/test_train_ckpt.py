"""Orbax train-state round trip + profiler tracer smoke test."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.train import (
    init_train_state, make_optimizer, make_train_step,
)
from aerial_image_recognition_tpu.runtime.train_ckpt import (
    load_train_state, save_train_state,
)
from aerial_image_recognition_tpu.runtime.observability import Tracer


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path, rng):
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    tx = make_optimizer(lr=1e-3)
    step = make_train_step(bundle, tx)
    state = init_train_state(bundle, tx)
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    targets = np.full((2, 8, 5), -1.0, np.float32)
    targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)
    state, _ = step(state, images, jnp.asarray(targets))

    path = str(tmp_path / "ckpt")
    save_train_state(state, path)
    fresh = init_train_state(bundle, tx)
    restored = load_train_state(path, fresh)
    assert int(restored["step"]) == 1
    a = jax.tree_util.tree_leaves(state["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    # training continues from the restored state
    state2, m = step(restored, images, jnp.asarray(targets))
    assert int(state2["step"]) == 2 and np.isfinite(float(m["loss"]))


def test_tracer_noop_and_annotation():
    with Tracer(None):
        with Tracer.annotate("region"):
            x = jnp.ones((4,)) + 1
    assert float(x.sum()) == 8.0


@pytest.mark.slow
def test_fit_resumes_from_ckpt_dir(tmp_path, rng):
    """fit(ckpt_dir=...) saves per-epoch orbax state and resumes exactly:
    a second fit() call with more epochs continues from the saved epoch."""
    import jax
    from aerial_image_recognition_tpu.pipeline.train import fit

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    loader = OneBatchLoader()
    ck = str(tmp_path / "ck")
    logs = []
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    s1 = fit(bundle, loader, epochs=2, ckpt_dir=ck, log_fn=logs.append)
    assert int(s1["step"]) == 2
    assert sorted(os.listdir(ck)) == ["epoch_0", "epoch_1"]

    bundle2 = create_model("yolov7_itcvd", dtype=jnp.float32, seed=9)
    logs2 = []
    s2 = fit(bundle2, loader, epochs=4, ckpt_dir=ck, log_fn=logs2.append)
    assert any("resumed from epoch 1" in m for m in logs2)
    assert int(s2["step"]) == 4                      # 2 saved + 2 new
    assert len(s2["history"]) == 2                   # only epochs 2..3 ran
