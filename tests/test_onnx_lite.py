"""Schema-less ONNX initializer extraction round trip + bridge into the
torch-name weight mapping."""

import numpy as np
import pytest

from aerial_image_recognition_tpu.models.onnx_lite import (
    load_onnx_initializers, write_minimal_onnx,
)


def test_onnx_roundtrip(tmp_path, rng):
    tensors = {
        "model.0.conv.weight": rng.normal(size=(32, 12, 3, 3)).astype(np.float32),
        "model.0.bn.weight": rng.normal(size=(32,)).astype(np.float32),
        "model.77.m.0.bias": rng.normal(size=(18,)).astype(np.float32),
        "some.int64": np.arange(7, dtype=np.int64),
        "scalarish": np.asarray([3.5], np.float32),
    }
    p = str(tmp_path / "m.onnx")
    write_minimal_onnx(p, tensors)
    back = load_onnx_initializers(p)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k], err_msg=k)
        assert back[k].dtype == tensors[k].dtype


def test_onnx_feeds_torch_mapping(tmp_path):
    """Full bridge: fabricate an 'exported checkpoint' ONNX holding every
    yolov7-tiny tensor (shapes from a real init), read it back with the
    lite parser, and import through the torch-name mapping."""
    import jax
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
    from aerial_image_recognition_tpu.models.import_torch import (
        export_torch_state, import_torch_state, yolov7_tiny_mapping)

    module = YOLOv7(num_classes=1, variant="tiny", dtype=jnp.float32)
    variables = jax.tree_util.tree_map(
        np.asarray, module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    mapping = yolov7_tiny_mapping()
    torch_sd = export_torch_state(variables, mapping)

    p = str(tmp_path / "fake_export.onnx")
    write_minimal_onnx(p, torch_sd)
    sd_from_onnx = load_onnx_initializers(p)
    restored = import_torch_state(sd_from_onnx, mapping)

    ref_leaf = variables["params"]["elan1"]["cv1"]["conv"]["kernel"]
    got_leaf = restored["params"]["elan1"]["cv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got_leaf), np.asarray(ref_leaf))
