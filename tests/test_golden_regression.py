"""Golden regression fixtures: lock model numerics across refactors.

The reference's ONNX weights are unobtainable in this environment
(git-LFS-missing, zero egress — SURVEY.md §6), so goldens are
self-referential: seeded-init models on a fixed synthetic input, with
decoded outputs recorded to an .npz fixture on first run and compared
exactly (to tolerance) afterwards. Any unintended change to conv layout,
decode math, activation, or NMS ordering trips these tests. When real
weights become importable, the same harness holds the ONNX-parity goldens
(IoU ≥ 0.99 gate, BASELINE.json).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
os.makedirs(FIXTURE_DIR, exist_ok=True)


def _synthetic_image(size=96):
    gy, gx = np.mgrid[0:size, 0:size]
    img = (127 + 60 * np.sin(gx / 7.0) * np.cos(gy / 5.0)).astype(np.uint8)
    img = np.stack([img, np.roll(img, 3, 0), np.roll(img, 7, 1)], -1)
    img[30:40, 20:44] = 240      # a bright "car"
    img[60:68, 50:66] = 235
    return img[None]


def _golden_check(name, arrays, atol=2e-4):
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    if not os.path.exists(path):
        np.savez_compressed(path, **arrays)
        pytest.skip(f"golden {name} recorded — rerun to compare")
    with np.load(path) as ref:
        for k, v in arrays.items():
            np.testing.assert_allclose(
                v, ref[k], atol=atol, rtol=1e-4,
                err_msg=f"{name}/{k} drifted from golden fixture")


def test_yolov7_tiny_golden():
    from aerial_image_recognition_tpu.models.registry import create_model
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32, seed=0)
    x = jnp.asarray(_synthetic_image()).astype(jnp.float32) / 255.0
    boxes, scores = jax.jit(bundle.forward)(bundle.params, x)
    _golden_check("yolov7_tiny_s0", {
        "boxes_head": np.asarray(boxes)[0, :64],
        "scores_head": np.asarray(scores)[0, :64],
        "boxes_sum": np.asarray([float(jnp.sum(boxes))]),
        "scores_mean": np.asarray([float(jnp.mean(scores))]),
    }, atol=5e-3)


def test_yolov8_nano_golden():
    from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
    from aerial_image_recognition_tpu.ops.decode import decode_yolov8
    module = YOLOv8(num_classes=2, scale="n", dtype=jnp.float32)
    x = jnp.asarray(_synthetic_image()).astype(jnp.float32) / 255.0
    params = module.init(jax.random.PRNGKey(0), x, train=False)
    boxes, scores = decode_yolov8(
        jax.jit(lambda p, y: module.apply(p, y, train=False))(params, x), 2)
    _golden_check("yolov8_n_s0", {
        "boxes_head": np.asarray(boxes)[0, :64],
        "scores_head": np.asarray(scores)[0, :64],
    }, atol=5e-3)


def test_nms_golden(rng):
    from aerial_image_recognition_tpu.ops.nms import batched_nms
    boxes = jnp.asarray(rng.uniform(0, 640, (1, 200, 4)).astype(np.float32))
    scores = jnp.asarray(rng.uniform(0, 1, (1, 200, 1)).astype(np.float32))
    det = batched_nms(boxes, scores, num_classes=1, conf_threshold=0.3,
                      iou_threshold=0.45, max_det=32, pre_topk=128,
                      use_pallas=False)
    _golden_check("nms_s0", {
        "scores": np.asarray(det.scores)[0],
        "valid": np.asarray(det.valid)[0].astype(np.int8),
    }, atol=1e-6)


def test_int8_tiny_golden():
    """Lock the int8 graph (transcription + scale folding + epilogues) the
    way the bf16 goldens lock the flax graph: trained fixture, fixed
    synthetic calibration and input, decoded outputs compared to a
    recorded .npz. Quantization is fully deterministic, so drift here
    means the int8 lowering changed behavior."""
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    trained = os.path.join(FIXTURE_DIR, "yolov7_tiny_fakeworld.npz")
    if not os.path.exists(trained):
        pytest.skip("trained fixture not present")
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    bundle.params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), load_params(trained))
    img = _synthetic_image()
    qb = quantize_bundle(bundle, [img], model_size=96)
    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    boxes, scores = jax.jit(qb.forward)(qb.params, x)
    _golden_check("int8_tiny_trained", {
        "boxes_head": np.asarray(boxes)[0, :64],
        "scores_head": np.asarray(scores)[0, :64],
    }, atol=5e-3)


@pytest.mark.slow
def test_int8_xunet_golden():
    from aerial_image_recognition_tpu.models.int8 import quantize_bundle
    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    trained = os.path.join(FIXTURE_DIR, "xunet_fakeworld.npz")
    if not os.path.exists(trained):
        pytest.skip("trained xunet fixture not present")
    bundle = create_model("xunet_256", dtype=jnp.float32)
    bundle.params = load_params(trained)
    img = np.tile(_synthetic_image(96), (1, 3, 3, 1))[:, :256, :256]
    qb = quantize_bundle(bundle, [img])
    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    logits = jax.jit(qb.forward)(qb.params, x)
    _golden_check("int8_xunet_trained", {
        "logits_patch": np.asarray(logits)[0, 96:128, 96:128, 0],
        "logits_mean": np.asarray([float(jnp.mean(logits))]),
    }, atol=5e-3)
