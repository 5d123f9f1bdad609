"""Weight bridge: upstream torch checkpoints ↔ this framework's flax trees.

The reference ships detector weights as ONNX/torch blobs
(car_aerial_detection_yolo7_ITCVD_deepness.onnx from the WongKinYiu/yolov7
lineage; yolov8_tokyo_checkpoint.pt from ultralytics — both git-LFS-missing
in the snapshot). This module holds the tested name/layout mapping so real
weights drop in the moment the files are available:

  * torch conv kernels [O, I, kh, kw] → flax [kh, kw, I, O]
  * torch BatchNorm (weight, bias, running_mean, running_var) →
    flax bn params (scale, bias) + batch_stats (mean, var)
  * yolov7 IDetect implicit layers (ia add / im mul) folded into the 1×1
    detect conv (the deploy fusion the ONNX export performs)

The mapping is validated by a round-trip property test (export → import ≡
identity over every parameter), so structural drift in either naming
convention is caught without the upstream package.
"""

from typing import Any, Dict, List, Tuple

import numpy as np


# --------------------------------------------------------------- helpers

def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def _set(tree: Dict, path: List[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get(tree: Dict, path: List[str]) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return node


# ------------------------------------------------------- mapping tables

# yolov7-tiny: upstream yaml layer index ↔ our module name
# (see models/yolov7.py _tiny; concat orders documented there)
_V7_TINY_CONVBN: List[Tuple[int, str]] = [
    (0, "stem0"), (1, "stem1"),
    (2, "elan1/cv1"), (3, "elan1/cv2"), (4, "elan1/cv3"),
    (5, "elan1/cv4"), (7, "elan1/out"),
    (9, "elan2/cv1"), (10, "elan2/cv2"), (11, "elan2/cv3"),
    (12, "elan2/cv4"), (14, "elan2/out"),
    (16, "elan3/cv1"), (17, "elan3/cv2"), (18, "elan3/cv3"),
    (19, "elan3/cv4"), (21, "elan3/out"),
    (23, "elan4/cv1"), (24, "elan4/cv2"), (25, "elan4/cv3"),
    (26, "elan4/cv4"), (28, "elan4/out"),
    (29, "sppcspc/cv1"), (30, "sppcspc/cv2"), (35, "sppcspc/cv3"),
    (37, "sppcspc/out"),
    (38, "up4_cv"), (40, "route4"),
    (42, "head_elan4/cv1"), (43, "head_elan4/cv2"),
    (44, "head_elan4/cv3"), (45, "head_elan4/cv4"), (47, "head_elan4/out"),
    (48, "up3_cv"), (50, "route3"),
    (52, "head_elan3/cv1"), (53, "head_elan3/cv2"),
    (54, "head_elan3/cv3"), (55, "head_elan3/cv4"), (57, "head_elan3/out"),
    (58, "down4_cv"),
    (60, "pan_elan4/cv1"), (61, "pan_elan4/cv2"),
    (62, "pan_elan4/cv3"), (63, "pan_elan4/cv4"), (65, "pan_elan4/out"),
    (66, "down5_cv"),
    (68, "pan_elan5/cv1"), (69, "pan_elan5/cv2"),
    (70, "pan_elan5/cv3"), (71, "pan_elan5/cv4"), (73, "pan_elan5/out"),
    (74, "out3"), (75, "out4"), (76, "out5"),
]
_V7_TINY_DETECT_IDX = 77


def _v8_module_names(depth_n: Dict[str, int]) -> List[Tuple[str, str]]:
    """(torch prefix, our module name) for the yolov8 graph.

    depth_n: bottleneck counts per C2f (resolved from the scale).
    """
    pairs = [
        ("model.0", "stem"), ("model.1", "down2"), ("model.2", "c2f1"),
        ("model.3", "down3"), ("model.4", "c2f2"), ("model.5", "down4"),
        ("model.6", "c2f3"), ("model.7", "down5"), ("model.8", "c2f4"),
        ("model.9", "sppf"),
        ("model.12", "fpn4"), ("model.15", "fpn3"),
        ("model.16", "pan_down4"), ("model.18", "pan4"),
        ("model.19", "pan_down5"), ("model.21", "pan5"),
    ]
    return pairs


# ----------------------------------------------------------- conversion

def _convbn_pairs(torch_prefix: str, flax_name: str):
    """(torch key, flax path, transform) for one ConvBN block."""
    fp = flax_name.split("/")
    return [
        (f"{torch_prefix}.conv.weight", ["params"] + fp + ["conv", "kernel"],
         "conv"),
        (f"{torch_prefix}.bn.weight", ["params"] + fp + ["bn", "scale"], ""),
        (f"{torch_prefix}.bn.bias", ["params"] + fp + ["bn", "bias"], ""),
        (f"{torch_prefix}.bn.running_mean",
         ["batch_stats"] + fp + ["bn", "mean"], ""),
        (f"{torch_prefix}.bn.running_var",
         ["batch_stats"] + fp + ["bn", "var"], ""),
    ]


def yolov7_tiny_mapping() -> List[Tuple[str, List[str], str]]:
    out = []
    for idx, name in _V7_TINY_CONVBN:
        out.extend(_convbn_pairs(f"model.{idx}", name))
    return out


def yolov8_mapping(n_c2f: Dict[str, int]) -> List[Tuple[str, List[str], str]]:
    out = []
    for tp, ours in _v8_module_names(n_c2f):
        if ours.startswith(("c2f", "fpn", "pan4", "pan5")):
            out.extend(_convbn_pairs(f"{tp}.cv1", f"{ours}/cv1"))
            out.extend(_convbn_pairs(f"{tp}.cv2", f"{ours}/cv2"))
            for i in range(n_c2f[ours]):
                out.extend(_convbn_pairs(f"{tp}.m.{i}.cv1", f"{ours}/m{i}/cv1"))
                out.extend(_convbn_pairs(f"{tp}.m.{i}.cv2", f"{ours}/m{i}/cv2"))
        elif ours == "sppf":
            out.extend(_convbn_pairs(f"{tp}.cv1", "sppf/cv1"))
            out.extend(_convbn_pairs(f"{tp}.cv2", "sppf/cv2"))
        else:
            out.extend(_convbn_pairs(tp, ours))
    # detect head: model.22.cv2 = box branch, cv3 = cls branch
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls")):
            for j, tail in ((0, "cv1"), (1, "cv2")):
                out.extend(_convbn_pairs(
                    f"model.22.{branch}.{lvl}.{j}",
                    f"detect/{ours}{lvl}_{tail}"))
            out.append((f"model.22.{branch}.{lvl}.2.weight",
                        ["params", "detect", f"{ours}{lvl}_out", "kernel"],
                        "conv"))
            out.append((f"model.22.{branch}.{lvl}.2.bias",
                        ["params", "detect", f"{ours}{lvl}_out", "bias"], ""))
    return out


def import_torch_state(state_dict: Dict[str, np.ndarray],
                       mapping: List[Tuple[str, List[str], str]]
                       ) -> Dict[str, Any]:
    """torch-style {name: array} → flax variables {'params','batch_stats'}."""
    tree: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    missing = []
    for tkey, fpath, kind in mapping:
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        v = np.asarray(state_dict[tkey])
        if kind == "conv":
            v = _conv_to_flax(v)
        _set(tree, fpath, v)
    if missing:
        raise KeyError(f"{len(missing)} keys missing from state dict, e.g. "
                       f"{missing[:5]}")
    return tree


def export_torch_state(variables: Dict[str, Any],
                       mapping: List[Tuple[str, List[str], str]]
                       ) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state (used by the round-trip tests)."""
    out = {}
    for tkey, fpath, kind in mapping:
        v = np.asarray(_get(variables, fpath))
        if kind == "conv":
            v = _conv_to_torch(v)
        out[tkey] = v
    return out


def fold_idetect(conv_w: np.ndarray, conv_b: np.ndarray,
                 ia: np.ndarray, im: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold yolov7 IDetect implicit layers into the 1×1 detect conv
    (the deploy fusion): y = im·(W(x + ia) + b) ⇒
    W' = im·W, b' = im·(b + W·ia)."""
    o, i = conv_w.shape[:2]
    w2 = conv_w.reshape(o, i)
    b_new = (conv_b + w2 @ ia.reshape(-1)) * im.reshape(-1)
    w_new = conv_w * im.reshape(-1, 1, 1, 1)
    return w_new, b_new


def yolov7_tiny_detect_from_torch(state_dict, variables, nc: int = 1):
    """Import the (IDetect) head: model.77.m.{i} convs + ia/im folding into
    our detect{i} flax convs."""
    import copy
    variables = copy.deepcopy(variables)
    for lvl in range(3):
        w = np.asarray(state_dict[f"model.{_V7_TINY_DETECT_IDX}.m.{lvl}.weight"])
        b = np.asarray(state_dict[f"model.{_V7_TINY_DETECT_IDX}.m.{lvl}.bias"])
        ia_key = f"model.{_V7_TINY_DETECT_IDX}.ia.{lvl}.implicit"
        im_key = f"model.{_V7_TINY_DETECT_IDX}.im.{lvl}.implicit"
        if ia_key in state_dict:
            w, b = fold_idetect(w, b, np.asarray(state_dict[ia_key]),
                                np.asarray(state_dict[im_key]))
        _set(variables, ["params", f"detect{lvl}", "kernel"], _conv_to_flax(w))
        _set(variables, ["params", f"detect{lvl}", "bias"], b)
    return variables
