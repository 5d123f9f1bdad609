"""Weight-bridge round trips: flax tree ↔ torch-style state dict."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.import_torch import (
    export_torch_state, fold_idetect, import_torch_state,
    yolov7_tiny_mapping, yolov8_mapping, yolov7_tiny_detect_from_torch,
)


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_yolov7_tiny_roundtrip_and_coverage():
    from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
    module = YOLOv7(num_classes=1, variant="tiny", dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    mapping = yolov7_tiny_mapping()

    torch_sd = export_torch_state(variables, mapping)
    back = import_torch_state(torch_sd, mapping)

    # every exported tensor round-trips exactly
    for path, v in _tree_paths(back):
        ref = variables
        for p in path:
            ref = ref[p]
        np.testing.assert_array_equal(v, np.asarray(ref), err_msg=str(path))

    # coverage: the mapping must hit every ConvBN parameter of the model
    # (detect heads are imported separately via the IDetect folding)
    mapped = {tuple(p) for _, p, _ in mapping}
    for path, _ in _tree_paths(variables):
        if "detect" in path[1]:
            continue
        assert tuple(path) in mapped, f"unmapped parameter {path}"


def test_yolov8_mapping_roundtrip_nano():
    from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
    module = YOLOv8(num_classes=2, scale="n", dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # nano: depth 1/3 → C2f counts (3,6,6,3)·d → 1,2,2,1; necks 1 each
    n_c2f = {"c2f1": 1, "c2f2": 2, "c2f3": 2, "c2f4": 1,
             "fpn4": 1, "fpn3": 1, "pan4": 1, "pan5": 1}
    mapping = yolov8_mapping(n_c2f)
    torch_sd = export_torch_state(variables, mapping)
    back = import_torch_state(torch_sd, mapping)
    mapped = {tuple(p) for _, p, _ in mapping}
    for path, _ in _tree_paths(variables):
        assert tuple(path) in mapped, f"unmapped parameter {path}"
    for path, v in _tree_paths(back):
        ref = variables
        for p in path:
            ref = ref[p]
        np.testing.assert_array_equal(v, np.asarray(ref))


def test_idetect_folding_math():
    rng = np.random.default_rng(0)
    o, i = 18, 128
    w = rng.normal(size=(o, i, 1, 1)).astype(np.float32)
    b = rng.normal(size=(o,)).astype(np.float32)
    ia = rng.normal(size=(1, i, 1, 1)).astype(np.float32)
    im = rng.normal(size=(1, o, 1, 1)).astype(np.float32)
    x = rng.normal(size=(i,)).astype(np.float32)
    # reference computation: y = im * (W(x+ia) + b)
    y_ref = (w.reshape(o, i) @ (x + ia.reshape(-1)) + b) * im.reshape(-1)
    w2, b2 = fold_idetect(w, b, ia, im)
    y = w2.reshape(o, i) @ x + b2
    np.testing.assert_allclose(y, y_ref, rtol=1e-5)


def test_detect_head_import():
    from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
    module = YOLOv7(num_classes=1, variant="tiny", dtype=jnp.float32)
    variables = jax.tree_util.tree_map(
        np.asarray, module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    rng = np.random.default_rng(1)
    sd = {}
    for lvl, c in enumerate((128, 256, 512)):
        sd[f"model.77.m.{lvl}.weight"] = rng.normal(
            size=(18, c, 1, 1)).astype(np.float32)
        sd[f"model.77.m.{lvl}.bias"] = rng.normal(size=(18,)).astype(np.float32)
        sd[f"model.77.ia.{lvl}.implicit"] = rng.normal(
            size=(1, c, 1, 1)).astype(np.float32)
        sd[f"model.77.im.{lvl}.implicit"] = rng.normal(
            size=(1, 18, 1, 1)).astype(np.float32)
    out = yolov7_tiny_detect_from_torch(sd, variables)
    assert out["params"]["detect0"]["kernel"].shape == (1, 1, 128, 18)
    assert out["params"]["detect2"]["bias"].shape == (18,)
