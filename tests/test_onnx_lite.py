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


@pytest.mark.parametrize("model,family", [
    ("yolov7_itcvd", "yolov7_tiny"),
    ("yolov8n", "yolov8"),
])
def test_cli_import_weights_drill(tmp_path, model, family):
    """The turnkey weight-drop drill (VERDICT r2 item 6): fabricate a
    synthetic upstream-named .onnx blob, run the CLI `import-weights` verb,
    and verify the resulting .npz forward-matches the independent torch
    interpreter on the same weights. When a real blob ever lands, parity
    goldens are exactly this one command away."""
    import json

    import jax.numpy as jnp

    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.models.upstream_spec import (
        YOLOV7_TINY_SPEC, make_state_dict, run_spec_torch, yolov8_spec)
    from aerial_image_recognition_tpu.pipeline.cli import main

    nc = 1 if family == "yolov7_tiny" else 2
    spec = YOLOV7_TINY_SPEC if family == "yolov7_tiny" else yolov8_spec("n")
    sd = make_state_dict(spec, nc=nc, seed=3)
    blob = str(tmp_path / "blob.onnx")
    write_minimal_onnx(blob, sd)

    out = str(tmp_path / "imported.npz")
    assert main(["import-weights", blob, "--model", model,
                 "--out", out]) == 0

    bundle = create_model(model, dtype=jnp.float32)
    variables = load_params(out)
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 64, 64)).astype(
        np.float32)
    flax_outs = bundle.module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    torch_outs = run_spec_torch(spec, sd, x, nc=nc, family=family)
    for f, t in zip(flax_outs, torch_outs):
        f, t = np.asarray(f), np.transpose(t, (0, 2, 3, 1))
        assert np.max(np.abs(f - t)) / (np.max(np.abs(t)) + 1e-6) < 2e-4


def test_cli_import_weights_shape_validation(tmp_path):
    """Importing a blob against the wrong registry model must fail loudly
    with a shape report, not save a silently-wrong checkpoint."""
    from aerial_image_recognition_tpu.models.upstream_spec import (
        YOLOV7_TINY_SPEC, make_state_dict)
    from aerial_image_recognition_tpu.pipeline.cli import main

    sd = make_state_dict(YOLOV7_TINY_SPEC, nc=3, seed=0)  # wrong nc
    blob = str(tmp_path / "blob.onnx")
    write_minimal_onnx(blob, sd)
    with pytest.raises((ValueError, SystemExit)):
        main(["import-weights", blob, "--model", "yolov7_itcvd",
              "--out", str(tmp_path / "x.npz")])


def test_cli_export_roundtrip(tmp_path):
    """CLI `export` writes a reference-format .onnx initializer blob that
    imports back to the identical weight tree (the switch-back path for
    users returning to the reference's onnxruntime flow)."""
    import os

    import numpy as np

    from aerial_image_recognition_tpu.models.import_torch import (
        import_torch_state, yolov7_tiny_mapping)
    from aerial_image_recognition_tpu.models.onnx_lite import (
        load_onnx_initializers)
    from aerial_image_recognition_tpu.models.registry import load_params
    from aerial_image_recognition_tpu.pipeline.cli import main

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "yolov7_tiny_fakeworld.npz")
    if not os.path.exists(fixture):
        import pytest
        pytest.skip("trained fixture not present")
    out = str(tmp_path / "exported.onnx")
    assert main(["export", fixture, out]) == 0
    back = import_torch_state(load_onnx_initializers(out),
                              yolov7_tiny_mapping())
    orig = load_params(fixture)
    a = np.asarray(orig["params"]["stem0"]["conv"]["kernel"], np.float32)
    b = np.asarray(back["params"]["stem0"]["conv"]["kernel"], np.float32)
    np.testing.assert_array_equal(a, b)


def _tree_equal(a, b):
    import jax
    import numpy as np
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


@pytest.mark.slow
def test_full_export_import_roundtrip_all_families(tmp_path):
    """torch_state_from_variables ∘ variables_from_torch_state == identity
    over the COMPLETE variables tree, detect heads included — the
    round-2 export covered only the trunk mapping, so an exported blob
    carried untrained detect heads (silently broken on switch-back to the
    reference's onnxruntime flow)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aerial_image_recognition_tpu.models.import_torch import (
        torch_state_from_variables, variables_from_torch_state)
    from aerial_image_recognition_tpu.models.onnx_lite import (
        load_onnx_initializers, write_minimal_onnx)
    from aerial_image_recognition_tpu.models.registry import create_model

    for model in ("yolov7_itcvd", "yolov7_base", "yolov8n"):
        bundle = create_model(model, dtype=jnp.float32)
        variables = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32), bundle.params)
        tensors = torch_state_from_variables(variables, model)
        # detect heads must be present in upstream naming
        head_keys = [k for k in tensors if ".m.0.weight" in k
                     or k.endswith("cv3.0.2.weight")
                     or ".detect" in k]
        if model.startswith("yolov7"):
            assert any(".m.0.weight" in k for k in tensors), model
            assert any(".m.2.bias" in k for k in tensors), model
        del head_keys
        p = str(tmp_path / f"{model}.onnx")
        write_minimal_onnx(p, tensors)
        back = variables_from_torch_state(load_onnx_initializers(p), model)
        _tree_equal(variables, back)


def _fake_ultralytics_checkpoint(path, torch_sd, with_ema=False):
    """torch.save a DetectionModel-shaped object whose classes live under
    'ultralytics.*' module paths that are NOT importable at load time, with
    half-precision tensors — the shape of a real yolov8_tokyo_checkpoint.pt
    (x_arch/01_train_tokyo.ipynb cell 14 output)."""
    import sys
    import types

    import torch
    import torch.nn as nn

    created = []
    for mn in ("ultralytics", "ultralytics.nn", "ultralytics.nn.tasks"):
        if mn not in sys.modules:
            sys.modules[mn] = types.ModuleType(mn)
            created.append(mn)
    DetectionModel = type("DetectionModel", (nn.Module,),
                          {"__module__": "ultralytics.nn.tasks"})
    sys.modules["ultralytics.nn.tasks"].DetectionModel = DetectionModel

    def build():
        root = DetectionModel()
        root.yaml = {"nc": 2}          # non-tensor attrs ride along
        for name, arr in torch_sd.items():
            parts = name.split(".")
            node = root
            for p in parts[:-1]:
                child = node._modules.get(p)
                if child is None:
                    child = nn.Module()
                    node.add_module(p, child)
                node = child
            t = torch.tensor(np.asarray(arr), dtype=torch.float16)
            if parts[-1].startswith("running_"):
                node.register_buffer(parts[-1], t)
            else:
                node.register_parameter(parts[-1], nn.Parameter(t))
        return root

    torch.save({"model": build(), "ema": build() if with_ema else None,
                "epoch": 7, "train_args": {"imgsz": 768}}, path)
    for mn in created:
        del sys.modules[mn]


def test_pt_checkpoint_loads_without_ultralytics(tmp_path, rng):
    """models.torch_pt recovers the flat state dict from an ultralytics
    .pt whose classes aren't importable, converting half → float32."""
    from aerial_image_recognition_tpu.models.torch_pt import (
        load_checkpoint_state)

    sd = {
        "model.0.conv.weight": rng.normal(size=(8, 3, 3, 3)),
        "model.0.bn.weight": rng.normal(size=(8,)),
        "model.0.bn.running_mean": rng.normal(size=(8,)),
        "model.22.cv3.0.2.bias": rng.normal(size=(2,)),
    }
    sd = {k: v.astype(np.float32) for k, v in sd.items()}
    p = str(tmp_path / "ckpt.pt")
    _fake_ultralytics_checkpoint(p, sd)
    back = load_checkpoint_state(p)
    assert set(back) == set(sd)
    for k, v in sd.items():
        assert back[k].dtype == np.float32
        np.testing.assert_array_equal(back[k],
                                      np.float16(v).astype(np.float32),
                                      err_msg=k)


def test_cli_import_weights_pt_drill(tmp_path):
    """The .pt leg of the turnkey weight-drop drill: a fabricated
    ultralytics-style yolov8n checkpoint (EMA weights, half precision,
    unimportable classes) imports through the CLI and forward-matches the
    independent torch interpreter on the same weights."""
    import jax.numpy as jnp

    from aerial_image_recognition_tpu.models.registry import (
        create_model, load_params)
    from aerial_image_recognition_tpu.models.upstream_spec import (
        make_state_dict, run_spec_torch, yolov8_spec)
    from aerial_image_recognition_tpu.pipeline.cli import main

    spec = yolov8_spec("n")
    sd = make_state_dict(spec, nc=2, seed=5)
    # round through f16 up front so the checkpoint's half storage is exact
    # and both forward paths see identical weights
    sd = {k: np.float16(v).astype(np.float32) for k, v in sd.items()}
    p = str(tmp_path / "yolov8_tokyo_checkpoint.pt")
    _fake_ultralytics_checkpoint(p, sd, with_ema=True)

    out = str(tmp_path / "imported.npz")
    assert main(["import-weights", p, "--model", "yolov8n",
                 "--out", out]) == 0

    bundle = create_model("yolov8n", dtype=jnp.float32)
    variables = load_params(out)
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 64, 64)).astype(
        np.float32)
    flax_outs = bundle.module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    torch_outs = run_spec_torch(spec, sd, x, nc=2, family="yolov8")
    for f, t in zip(flax_outs, torch_outs):
        f, t = np.asarray(f), np.transpose(t, (0, 2, 3, 1))
        assert np.max(np.abs(f - t)) / (np.max(np.abs(t)) + 1e-6) < 2e-4


def test_pt_loader_never_executes_untrusted_globals(tmp_path):
    """The .pt ingestion surface exists to accept THIRD-PARTY blobs, so a
    crafted pickle stream referencing an importable callable (the classic
    ``os.system`` reduce) must come back as an inert stub, not execute.
    The allowlist unpickler resolves only tensor-rebuild primitives."""
    import os
    import pickle
    import zipfile

    from aerial_image_recognition_tpu.models.torch_pt import (
        load_checkpoint_state)

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            return (os.system, (f"touch {marker}",))

    p = str(tmp_path / "evil.pt")
    # torch zip-format container with a malicious data.pkl
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("evil/data.pkl", pickle.dumps({"model": Evil()}))
        z.writestr("evil/version", "3\n")
    try:
        load_checkpoint_state(p)
    except Exception:
        pass  # rejecting the stream entirely is also fine
    assert not marker.exists(), "untrusted pickle executed code"


def test_pt_loader_stub_allowlist_unit():
    """Direct unit check of the allowlist: os.system and subprocess are
    stubbed even though importable; tensor-rebuild primitives resolve."""
    import io
    import pickle

    from aerial_image_recognition_tpu.models.torch_pt import _StubUnpickler

    u = _StubUnpickler(io.BytesIO(b""))
    stub = u.find_class("os", "system")
    assert getattr(stub, "_aerial_stub_origin", None) == "os.system"
    from collections import OrderedDict
    stub("echo should-not-run")  # calling a stub is an inert no-op
    assert u.find_class("subprocess", "Popen") is not None  # stubbed too
    assert getattr(u.find_class("subprocess", "Popen"),
                   "_aerial_stub_origin", None) == "subprocess.Popen"
    import torch
    assert u.find_class("torch._utils", "_rebuild_tensor_v2") \
        is torch._utils._rebuild_tensor_v2
    assert u.find_class("collections", "OrderedDict") is OrderedDict
    assert u.find_class("torch", "float16") is torch.float16
