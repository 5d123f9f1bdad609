"""Model family shape contracts + decode + NMS correctness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.registry import (
    create_model, resolve_model_name, save_params, load_params,
)
from aerial_image_recognition_tpu.ops.nms import batched_nms, iou_matrix


# Small input so CPU tests stay fast; strides still divide evenly.
S = 160
A_TOTAL = 3 * ((S // 8) ** 2 + (S // 16) ** 2 + (S // 32) ** 2)


def test_resolve_model_name_reference_paths():
    assert resolve_model_name("car_aerial_detection_yolo7_ITCVD_deepness.onnx") == "yolov7_itcvd"
    assert resolve_model_name("models/yolov8_tokyo_checkpoint.onnx") == "yolov8_tokyo"
    assert resolve_model_name("ramp_XUnet_256.onnx") == "xunet_256"


def test_yolov7_forward_shapes():
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    imgs = jnp.zeros((2, S, S, 3), dtype=jnp.float32)
    boxes, scores = bundle.forward(bundle.params, imgs)
    assert boxes.shape == (2, A_TOTAL, 4)
    assert scores.shape == (2, A_TOTAL, 1)
    assert bool(jnp.all(jnp.isfinite(boxes)))
    assert bool(jnp.all((scores >= 0) & (scores <= 1)))


def test_yolov8_forward_shapes():
    # nano scale on CPU for speed; the tokyo registry entry is the l scale
    from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
    from aerial_image_recognition_tpu.ops.decode import decode_yolov8
    module = YOLOv8(num_classes=2, scale="n", dtype=jnp.float32)
    imgs = jnp.zeros((1, S, S, 3), dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), imgs, train=False)
    outs = module.apply(params, imgs, train=False)
    assert len(outs) == 3
    assert outs[0].shape == (1, S // 8, S // 8, 64 + 2)
    boxes, scores = decode_yolov8(outs, 2)
    # anchor-free: one box per cell (vs 3 anchors/cell for v7)
    assert boxes.shape == (1, A_TOTAL // 3, 4)
    assert scores.shape == (1, A_TOTAL // 3, 2)
    assert bool(jnp.all(jnp.isfinite(boxes)))
    # DFL decode: zero-ish logits → ltrb expectation ≈ mean bin (7.5):
    # centers near cell centers, sizes positive and bounded by 15·stride
    assert bool(jnp.all(boxes[..., 2:] > 0))
    assert bool(jnp.all(boxes[..., 2:] <= 15 * 32 * 2))


def test_yolov7_decode_geometry():
    # With zero logits, sigmoid=0.5 → xy = (2*0.5-0.5 + grid)*stride =
    # (grid+0.5)*stride: box centers must tile the image uniformly.
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    imgs = jnp.zeros((1, S, S, 3), dtype=jnp.float32)
    outs = bundle.raw_apply(bundle.params, imgs)
    zeroed = [jnp.zeros_like(o) for o in outs]
    from aerial_image_recognition_tpu.ops.decode import decode_yolov7
    boxes, scores = decode_yolov7(zeroed, bundle.module.anchors, 1)
    n0 = 3 * (S // 8) ** 2
    lvl0 = boxes[0, :n0].reshape(S // 8, S // 8, 3, 4)
    assert abs(float(lvl0[0, 0, 0, 0]) - 4.0) < 1e-5   # (0+0.5)*8
    assert abs(float(lvl0[0, 1, 0, 0]) - 12.0) < 1e-5  # (1+0.5)*8
    assert abs(float(lvl0[1, 0, 0, 1]) - 12.0) < 1e-5
    # wh = (2*0.5)^2 * anchor = anchor
    assert abs(float(lvl0[0, 0, 0, 2]) - 10.0) < 1e-5
    # nc=1 → confidence is objectness alone: σ(0) = 0.5
    assert float(scores[0, 0, 0]) == pytest.approx(0.5, abs=1e-6)


def test_xunet_shapes():
    bundle = create_model("xunet_256", dtype=jnp.float32)
    imgs = jnp.zeros((2, 256, 256, 3), dtype=jnp.float32)
    masks = bundle.forward(bundle.params, imgs)
    assert masks.shape == (2, 256, 256, 1)


def test_params_save_load_roundtrip(tmp_path):
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    p = str(tmp_path / "m.npz")
    save_params(bundle.params, p)
    loaded = load_params(p)
    flat_a = jax.tree_util.tree_leaves(bundle.params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    imgs = jnp.ones((1, S, S, 3), dtype=jnp.float32) * 0.5
    out_a = bundle.forward(bundle.params, imgs)
    out_b = bundle.forward(loaded, imgs)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               rtol=0, atol=0)


# ----------------------------------------------------------------- NMS

def nms_reference_numpy(boxes, scores, conf_t, iou_t, max_det,
                        class_aware=True):
    """Trusted O(n²) greedy NMS oracle (numpy)."""
    best = scores.max(-1)
    cls = scores.argmax(-1)
    order = np.argsort(-best, kind="stable")
    kept = []
    for i in order:
        if best[i] < conf_t or len(kept) >= max_det:
            if best[i] < conf_t:
                break
            continue
        ok = True
        for j in kept:
            if class_aware and cls[i] != cls[j]:
                continue
            iou = _iou_np(boxes[i], boxes[j])
            if iou > iou_t:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept, cls


def _iou_np(a, b):
    ax1, ay1, ax2, ay2 = a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1, bx2, by2 = b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / max(ua, 1e-9)


def test_iou_matrix_known_values():
    boxes = jnp.asarray([[10.0, 10.0, 10.0, 10.0],
                         [15.0, 10.0, 10.0, 10.0],
                         [100.0, 100.0, 10.0, 10.0]])
    m = np.asarray(iou_matrix(boxes, boxes))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(50.0 / 150.0)   # half-overlap squares
    assert m[0, 2] == pytest.approx(0.0)


@pytest.mark.parametrize("nc,class_aware", [(1, True), (3, True), (3, False)])
def test_nms_matches_numpy_oracle(rng, nc, class_aware):
    n = 200
    boxes = np.stack([
        rng.uniform(0, 640, n), rng.uniform(0, 640, n),
        rng.uniform(5, 60, n), rng.uniform(5, 60, n)], axis=1).astype(np.float32)
    # Force clusters of overlapping boxes
    boxes[n // 2:] = boxes[: n // 2] + rng.normal(0, 3, (n // 2, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (n, nc)).astype(np.float32)

    det = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                      num_classes=nc, conf_threshold=0.3, iou_threshold=0.45,
                      max_det=64, pre_topk=n, class_aware=class_aware)
    got_idx_boxes = np.asarray(det.boxes[0])[np.asarray(det.valid[0])]
    got_scores = np.asarray(det.scores[0])[np.asarray(det.valid[0])]

    kept, cls = nms_reference_numpy(boxes, scores, 0.3, 0.45, 64,
                                    class_aware=class_aware)
    want_boxes = boxes[kept]
    want_scores = scores.max(-1)[kept]

    assert len(got_scores) == len(want_scores)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    np.testing.assert_allclose(got_idx_boxes, want_boxes, rtol=1e-5)


def test_nms_conf_threshold_and_validity():
    boxes = jnp.asarray([[[100.0, 100, 10, 10], [300.0, 300, 10, 10]]])
    scores = jnp.asarray([[[0.9], [0.1]]])
    det = batched_nms(boxes, scores, num_classes=1, conf_threshold=0.3,
                      max_det=8, pre_topk=2)
    assert int(det.valid.sum()) == 1
    assert float(det.scores[0, 0]) == pytest.approx(0.9)
    assert int(det.classes[0, 1]) == -1


def test_yolov7_s2d_stem_shapes():
    # opt-in space-to-depth stem: identical output contract
    from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
    module = YOLOv7(num_classes=1, variant="tiny", dtype=jnp.float32,
                    s2d_stem=True)
    imgs = jnp.zeros((1, S, S, 3), dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), imgs, train=False)
    outs = module.apply(params, imgs, train=False)
    assert [o.shape for o in outs] == [
        (1, S // 8, S // 8, 18), (1, S // 16, S // 16, 18),
        (1, S // 32, S // 32, 18)]
    # stem kernel consumes 12 channels after the 2×2 fold
    assert params["params"]["stem0"]["conv"]["kernel"].shape[2] == 12


def test_convbn_split_lowering_matches_concat(rng):
    """ConvBN's SPLIT_LISTS lowering must be numerically equivalent to the
    default concat lowering (same params, same outputs) — it's a pure
    scheduling experiment knob."""
    from aerial_image_recognition_tpu.models.layers import ConvBN

    bundle = create_model("yolov7_itcvd", dtype=jnp.float32, seed=5)
    x = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8),
                    jnp.float32) / 255.0
    assert ConvBN.SPLIT_LISTS is False
    ref = bundle.raw_apply(bundle.params, x)
    try:
        ConvBN.SPLIT_LISTS = True
        alt = bundle.raw_apply(bundle.params, x)
    finally:
        ConvBN.SPLIT_LISTS = False
    for a, b in zip(ref, alt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fold_batchnorm_parity():
    """fold_batchnorm + the FOLDED lowering must reproduce the standard
    BN graph to f32 rounding — the deployment path is conv+bias+act only.
    (The BN affine can't be constant-folded by XLA under jit — params are
    runtime inputs — so this is a genuine alternative graph.)"""
    import jax.numpy as jnp
    from aerial_image_recognition_tpu.models.layers import (
        fold_batchnorm, folded_convbn)
    from aerial_image_recognition_tpu.models.registry import create_model

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)).astype(np.float32))
    for name, eps in (("yolov7_itcvd", 1e-5), ("yolov8_tokyo", 1e-3)):
        bundle = create_model(name, dtype=jnp.float32, seed=4)
        ref_b, ref_s = bundle.forward(bundle.params, x)
        folded = fold_batchnorm(bundle.params, eps=eps)
        assert "batch_stats" not in folded
        with folded_convbn():
            fb, fs = bundle.forward(folded, x)
        np.testing.assert_allclose(np.asarray(ref_b), np.asarray(fb),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ref_s), np.asarray(fs),
                                   atol=1e-5, rtol=1e-4)
