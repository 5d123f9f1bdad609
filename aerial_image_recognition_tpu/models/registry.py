"""Model registry: name → (flax module, decode fn, input contract).

Replaces the reference's model-file switch (DEFAULT_CONFIG['model_path'] at
_script/config.py:25 choosing which .onnx to load). Parameters are stored as
orbax/npz checkpoints; an ONNX weight importer can be added when onnx is
available (the reference's blobs are git-LFS-missing, .MISSING_LARGE_BLOBS).
"""

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
from aerial_image_recognition_tpu.models.xunet import XUnet


@dataclass
class ModelSpec:
    name: str
    family: str                   # yolov7 | yolov8 | xunet
    num_classes: int
    input_size: int               # square input edge (pixels)
    make_module: Callable[..., Any]
    class_names: Tuple[str, ...] = ()


def _yolov7_itcvd(dtype=jnp.bfloat16):
    return YOLOv7(num_classes=1, variant="tiny", dtype=dtype)


def _yolov7_base(dtype=jnp.bfloat16):
    return YOLOv7(num_classes=1, variant="base", dtype=dtype)


def _yolov8_tokyo(dtype=jnp.bfloat16):
    # nc=2 {Car, Truck} per the training notebook's class remap
    # (x_arch/01_train_tokyo.ipynb cell 2), YOLOv8l scale (cell 14).
    return YOLOv8(num_classes=2, scale="l", dtype=dtype)


def _xunet_256(dtype=jnp.bfloat16):
    return XUnet(out_channels=1, dtype=dtype)


REGISTRY: Dict[str, ModelSpec] = {
    # Primary car detector: car_aerial_detection_yolo7_ITCVD_deepness.onnx slot
    "yolov7_itcvd": ModelSpec("yolov7_itcvd", "yolov7", 1, 640,
                              _yolov7_itcvd, ("car",)),
    "yolov7_base": ModelSpec("yolov7_base", "yolov7", 1, 640,
                             _yolov7_base, ("car",)),
    # yolov8_tokyo_checkpoint.onnx slot
    "yolov8_tokyo": ModelSpec("yolov8_tokyo", "yolov8", 2, 640,
                              _yolov8_tokyo, ("car", "truck")),
    # ramp_XUnet_256.onnx slot
    "xunet_256": ModelSpec("xunet_256", "xunet", 1, 256, _xunet_256,
                           ("building",)),
}


def _yolov8_at_scale(sc):
    def make(dtype=jnp.bfloat16):
        return YOLOv8(num_classes=2, scale=sc, dtype=dtype)
    return make


# every upstream yolov8 scale (the ultralytics n/s/m/l/x ladder) as its own
# registry slot — "yolov8n" must build the 3M-param nano, not silently
# alias the Tokyo L model
for _sc in "nsmlx":
    REGISTRY[f"yolov8{_sc}"] = ModelSpec(
        f"yolov8{_sc}", "yolov8", 2, 640, _yolov8_at_scale(_sc),
        ("car", "truck"))


def resolve_model_name(model_path: str) -> str:
    """Map reference-style .onnx paths to registry names."""
    base = os.path.basename(model_path).lower()
    stem = os.path.splitext(base)[0]
    if base in REGISTRY:
        return base
    if stem in REGISTRY:                 # "yolov8n.onnx" → yolov8n, not L
        return stem
    if "yolo7" in base or "yolov7" in base or "itcvd" in base:
        return "yolov7_itcvd"
    if "yolov8" in base or "tokyo" in base:
        return "yolov8_tokyo"
    if "xunet" in base or "ramp" in base:
        return "xunet_256"
    raise KeyError(f"cannot resolve model {model_path!r}")


@dataclass
class ModelBundle:
    """A constructed model + its pure forward functions."""
    spec: ModelSpec
    module: Any
    params: Any

    def raw_apply(self, params, images, train: bool = False):
        """images [B,S,S,3] float (already /255) → raw head outputs."""
        if train:
            return self.module.apply(params, images, train=True,
                                     mutable=["batch_stats"])
        return self.module.apply(params, images, train=False)

    def forward(self, params, images):
        """images → (boxes [B,A,4], scores [B,A,nc]) or mask logits."""
        # deferred: ops.decode ↔ models would otherwise be an import cycle
        from aerial_image_recognition_tpu.ops.decode import (
            decode_yolov7, decode_yolov8)
        outs = self.raw_apply(params, images)
        if self.spec.family == "yolov7":
            anchors = self.module.anchors
            return decode_yolov7(outs, anchors, self.spec.num_classes)
        if self.spec.family == "yolov8":
            return decode_yolov8(outs, self.spec.num_classes)
        return outs  # xunet: mask logits

    def _s2d2_meta(self):
        """(stem scope names, activation, bn_eps) for the quad-stem
        lowering, or None when it doesn't apply. Any model whose entry is
        two stride-2 3x3 ConvBNs qualifies (yolov7-tiny and every yolov8
        scale). bn_eps follows the family (ConvBN.bn_eps)."""
        if (self.spec.family == "yolov7"
                and getattr(self.module, "variant", "") == "tiny"
                and not getattr(self.module, "s2d_stem", False)):
            return ("stem0", "stem1"), "leaky", 1e-5
        if self.spec.family == "yolov8":
            return ("stem", "down2"), "silu", 1e-3
        return None

    def supports_s2d2(self) -> bool:
        """True when the quad-stem inference lowering applies."""
        return self._s2d2_meta() is not None

    def forward_s2d2(self, params, xq, in_scale=1.0 / 255.0):
        """Quad-stem inference path: xq is the host-relayouted s2d^2 batch
        [B,S/4,S/4,48] (uint8 or float). The /255 normalize folds into the
        stem's first conv; the rest of the network runs from the P2 feature
        map (from_p2 on the model). Numerically the standard forward on
        x/255 up to bf16 rounding — see ops/quadstem.py for the measured
        perf rationale (6.4 vs 10.1 ms for the stem chain on v5e)."""
        from aerial_image_recognition_tpu.ops.decode import (
            decode_yolov7, decode_yolov8)
        from aerial_image_recognition_tpu.ops.quadstem import (
            quad_stem_forward)
        meta = self._s2d2_meta()
        assert meta is not None
        stem_names, act, bn_eps = meta
        feat = quad_stem_forward(params, xq, act=act, in_scale=in_scale,
                                 dtype=self.module.dtype,
                                 stem_names=stem_names, bn_eps=bn_eps)
        outs = self.module.clone(from_p2=True).apply(
            params, feat, train=False)
        if self.spec.family == "yolov7":
            return decode_yolov7(outs, self.module.anchors,
                                 self.spec.num_classes)
        return decode_yolov8(outs, self.spec.num_classes)


def create_model(name: str, *, dtype=jnp.bfloat16, seed: int = 0,
                 params_path: Optional[str] = None) -> ModelBundle:
    spec = REGISTRY[resolve_model_name(name)]
    module = spec.make_module(dtype=dtype)
    if params_path:
        if not os.path.exists(params_path):
            raise FileNotFoundError(
                f"model checkpoint {params_path!r} does not exist — refusing "
                "to fall back to random weights")
        params = load_params(params_path)
    else:
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, spec.input_size, spec.input_size, 3),
                          dtype=dtype)
        params = module.init(rng, dummy, train=False)
        params = _prior_init_detect_bias(params, spec)
    return ModelBundle(spec=spec, module=module, params=params)


def _prior_init_detect_bias(params, spec: ModelSpec):
    """Detection-prior bias init (the upstream yolo trick): objectness /
    class logits start at σ≈exp(−5)≈0.7%, so fresh training isn't flooded
    by background gradient. No-op for loaded checkpoints."""
    import flax
    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    p = params.get("params", {})
    if spec.family == "yolov7":
        no = 5 + spec.num_classes
        for key in list(p.keys()):
            if key.startswith("detect"):
                bias = np.asarray(p[key]["bias"]).copy()
                for a in range(3):
                    bias[a * no + 4] = -5.0          # objectness prior
                    bias[a * no + 5:(a + 1) * no] = -5.0  # class priors
                p[key] = dict(p[key], bias=jnp.asarray(bias))
    elif spec.family == "yolov8":
        det = p.get("detect", {})
        for key in list(det.keys()):
            if key.startswith("cls") and key.endswith("_out"):
                bias = np.asarray(det[key]["bias"]).copy()
                bias[:] = -5.0
                det[key] = dict(det[key], bias=jnp.asarray(bias))
        p["detect"] = det
    return params


# ------------------------------------------------------------ persistence

def save_params(params, path: str) -> None:
    """Flat-npz checkpoint (portable, no orbax dependency at load time).

    bfloat16 leaves are stored bit-exact as uint16 with a ``:bf16`` key
    suffix (numpy has no native bfloat16)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        key = "/".join(_keystr(k) for k in keypath)
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            out[key + ":bf16"] = arr.view(np.uint16)
        else:
            out[key] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez_compressed(f, **out)


def load_params(path: str):
    with np.load(path) as data:
        flat = {}
        for k, v in data.items():
            if k.endswith(":bf16"):
                flat[k[:-5]] = jnp.asarray(v).view(jnp.bfloat16)
            else:
                flat[k] = jnp.asarray(v)
    tree: Dict[str, Any] = {}
    for key, leaf in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def _keystr(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)
