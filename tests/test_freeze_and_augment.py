"""Layer freezing (notebook cell 14: freeze=[0,1,2]) + the remaining
ultralytics augmentations (copy_paste / fliplr / flipud).

Reference: x_arch/01_train_tokyo.ipynb trains with freeze=[0,1,2],
copy_paste=True and the ultralytics default fliplr=0.5; round 3 adds
these to close the training-recipe parity gap.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.import_torch import (
    layer_index_prefixes,
)
from aerial_image_recognition_tpu.models.registry import create_model
from aerial_image_recognition_tpu.pipeline.data import (
    copy_paste, flip_boxes,
)
from aerial_image_recognition_tpu.pipeline.train import (
    _freeze_mask, init_train_state, make_optimizer, make_train_step,
    resolve_freeze_prefixes,
)


# ------------------------------------------------------- augmentations

def test_copy_paste_appends_label_and_pixels(rng):
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.asarray([[0, 8, 8, 8, 8]], np.float32)
    donor = np.full((64, 64, 3), 200, np.uint8)
    donor_boxes = np.asarray([[0, 40, 40, 10, 6]], np.float32)
    out, nb = copy_paste(img, boxes, donor, donor_boxes, rng)
    assert nb.shape == (2, 5)
    cls, cx, cy, w, h = nb[1]
    assert (w, h) == (10.0, 6.0) and cls == 0.0
    # the pasted rect's pixels really are the donor's
    x1, y1 = int(cx - w / 2), int(cy - h / 2)
    patch = out[y1:y1 + 6, x1:x1 + 10]
    assert (patch == 200).all()
    # and nothing outside any labeled rect changed
    assert out.sum() == patch.sum()


def test_copy_paste_never_buries_existing_labels(rng):
    # one existing box covering the whole image: any paste would cover it
    # far beyond max_overlap of ITS area? No — a 10x6 paste covers only
    # 60/4096 of it. Use many small existing boxes tiling the image so
    # every candidate position overlaps one of them heavily.
    img = np.zeros((64, 64, 3), np.uint8)
    cells = [[0, x + 4, y + 4, 8, 8]
             for x in range(0, 64, 8) for y in range(0, 64, 8)]
    boxes = np.asarray(cells, np.float32)
    donor = np.full((64, 64, 3), 200, np.uint8)
    donor_boxes = np.asarray([[0, 32, 32, 32, 32]], np.float32)
    out, nb = copy_paste(img, boxes, donor, donor_boxes, rng,
                         max_overlap=0.05, tries=25)
    # every 32x32 placement covers some 8x8 cell >5% of its area → skipped
    assert len(nb) == len(boxes)
    assert (out == img).all()


def test_copy_paste_empty_donor_is_identity(rng):
    img = np.zeros((16, 16, 3), np.uint8)
    boxes = np.zeros((0, 5), np.float32)
    out, nb = copy_paste(img, boxes, img, np.zeros((0, 5), np.float32), rng)
    assert out is img and nb is boxes


def test_flip_boxes_lr_ud_roundtrip(rng):
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    boxes = np.asarray([[0, 10.0, 5.0, 8.0, 6.0],
                        [1, 40.0, 30.0, 4.0, 2.0]], np.float32)
    fl, bl = flip_boxes(img, boxes, lr=True)
    assert (fl == img[:, ::-1]).all()
    np.testing.assert_allclose(bl[:, 1], 48.0 - boxes[:, 1])
    np.testing.assert_allclose(bl[:, [0, 2, 3, 4]], boxes[:, [0, 2, 3, 4]])
    fu, bu = flip_boxes(img, boxes, ud=True)
    assert (fu == img[::-1]).all()
    np.testing.assert_allclose(bu[:, 2], 32.0 - boxes[:, 2])
    # involution: flipping twice restores image and boxes
    f2, b2 = flip_boxes(fl, bl, lr=True)
    assert (f2 == img).all()
    np.testing.assert_allclose(b2, boxes)


def test_random_scale_translate_geometry():
    """Deterministic check of the affine box math: force a known factor
    and offset through a scripted rng."""
    from aerial_image_recognition_tpu.pipeline.data import (
        random_scale_translate,
    )

    class ScriptedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self, lo, hi):
            # return a value that maps the U(lo,hi) draw to the scripted
            # fraction: frac=0 → lo, 1 → hi
            frac = self.vals.pop(0)
            return lo + frac * (hi - lo)

    img = np.zeros((64, 64, 3), np.uint8)
    img[24:40, 24:40] = 255                       # a white box at center
    boxes = np.asarray([[0, 32, 32, 16, 16]], np.float32)
    # scale draw frac=1.0 → f=1.5; translate draws frac=0.5 → center stays
    rng = ScriptedRng([1.0, 0.5, 0.5])
    out, nb = random_scale_translate(img, boxes, rng, scale=0.5,
                                     translate=0.1)
    assert out.shape == img.shape
    assert nb.shape == (1, 5)
    np.testing.assert_allclose(nb[0], [0, 32, 32, 24, 24], atol=1.0)
    # the white square really did scale 1.5×
    white = (out == 255).all(axis=2)
    assert abs(int(white.sum()) - 24 * 24) <= 100
    # gray 114 fill appears nowhere (f>1 covers the canvas) but does for
    # a shrink
    rng2 = ScriptedRng([0.0, 0.5, 0.5])           # f=0.5
    out2, nb2 = random_scale_translate(img, boxes, rng2, scale=0.5,
                                       translate=0.1)
    assert (out2[0, 0] == 114).all()
    np.testing.assert_allclose(nb2[0], [0, 32, 32, 8, 8], atol=1.0)


def test_random_scale_translate_drops_clipped_out_boxes():
    from aerial_image_recognition_tpu.pipeline.data import (
        random_scale_translate,
    )

    class ScriptedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self, lo, hi):
            return lo + self.vals.pop(0) * (hi - lo)

    img = np.zeros((64, 64, 3), np.uint8)
    # a box hugging the left edge: translating right by the max keeps it;
    # translating the image far left clips it out
    boxes = np.asarray([[0, 4, 32, 8, 8]], np.float32)
    rng = ScriptedRng([0.5, 0.0, 0.5])   # f=1.0, cx at (0.5-t)*64
    out, nb = random_scale_translate(img, boxes, rng, scale=0.0,
                                     translate=0.5)
    # image center moved to 0, i.e. shifted left 32 px: the box at x≈4
    # is fully outside → dropped
    assert len(nb) == 0


def test_close_mosaic_window(rng):
    """close_mosaic=N (ultralytics): the composite augmentations switch
    off for the last N epochs — single images with exactly their own
    labels — while earlier epochs keep the mosaic recipe."""
    from aerial_image_recognition_tpu.pipeline.data import (
        DetectionLoader, LoaderConfig, Sample,
    )

    def decode(path):
        return np.full((32, 32, 3), 100, np.uint8)

    # one centered box per sample → a mosaic composite carries up to 4
    samples = [Sample(image_path=f"s{i}.png",
                      boxes=np.asarray([[0, .5, .5, .4, .4]], np.float32))
               for i in range(8)]
    cfg = LoaderConfig(image_size=32, batch_size=4, mosaic=1.0, mixup=0.0,
                       hsv=0.0, close_mosaic=1, seed=3)
    loader = DetectionLoader(samples, cfg, decode_fn=decode)
    loader.total_epochs = 2

    def valid_counts(epoch_idx):
        return [int((t[:, 0] >= 0).sum())
                for _, tg in loader.epoch(epoch_idx) for t in tg]

    assert max(valid_counts(0)) > 1      # mosaic active: composite labels
    assert valid_counts(1) == [1] * 8    # closing window: clean singles


# --------------------------------------------------------- freeze spec

def test_layer_index_prefixes_v7_tiny():
    table = layer_index_prefixes("yolov7_itcvd")
    assert table[0] == ["stem0"] and table[1] == ["stem1"]
    assert table[2] == ["elan1/cv1"]
    assert 6 not in table            # maxpool: parameterless, no entry
    assert table[77] == ["detect0", "detect1", "detect2"]


def test_layer_index_prefixes_v7_base_and_v8():
    base = layer_index_prefixes("yolov7_base")
    assert base[51] == ["sppcspc"] and base[102] == ["rep3"]
    assert base[105] == ["detect0", "detect1", "detect2"]
    v8 = layer_index_prefixes("yolov8n")
    assert v8[0] == ["stem"] and v8[9] == ["sppf"] and v8[22] == ["detect"]


def test_resolve_freeze_prefixes_mixed():
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    got = resolve_freeze_prefixes(bundle, [0, "1", "elan2/cv1", 6])
    assert got == ("stem0", "stem1", "elan2/cv1")
    assert resolve_freeze_prefixes(bundle, None) == ()
    assert resolve_freeze_prefixes(bundle, []) == ()


# ----------------------------------------------------- train-step semantics

def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("bn_mode", ["frozen", "batch"])
def test_freeze_train_step(rng, bn_mode):
    """freeze=[0,1,2]: stem0/stem1/elan1.cv1 get NO update (params frozen
    byte-identical, incl. no weight decay) and in batch mode their BN
    running statistics do not drift either; everything else trains."""
    freeze = [0, 1, 2]
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    mask = _freeze_mask(bundle.params["params"],
                        resolve_freeze_prefixes(bundle, freeze))
    tx = make_optimizer(lr=1e-2, param_mask=mask)
    step = make_train_step(bundle, tx, bn_mode=bn_mode, freeze=freeze)
    state = init_train_state(bundle, tx)
    p0 = _flat(state["params"])
    bs0 = _flat(state["batch_stats"])
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3),
                                      dtype=np.uint8))
    targets = np.full((2, 8, 5), -1.0, np.float32)
    targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)
    state, m = step(state, images, jnp.asarray(targets))
    assert np.isfinite(float(m["loss"]))
    p1 = _flat(state["params"])
    bs1 = _flat(state["batch_stats"])

    def is_frozen(k):
        return (k.startswith("['stem0']") or k.startswith("['stem1']")
                or k.startswith("['elan1']['cv1']"))

    frozen = [k for k in p0 if is_frozen(k)]
    live = [k for k in p0 if not is_frozen(k)]
    assert frozen and live
    for k in frozen:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)
    assert any(not np.array_equal(p0[k], p1[k]) for k in live)
    for k in bs0:
        if is_frozen(k):
            np.testing.assert_array_equal(bs0[k], bs1[k], err_msg=k)
    if bn_mode == "batch":
        assert any(is_frozen(k) for k in bs0)
        assert any(not np.array_equal(bs0[k], bs1[k])
                   for k in bs0 if not is_frozen(k))


def test_finetune_imported_weights_with_freeze(rng):
    """The notebook's actual workflow (cell 14): load pretrained weights,
    freeze the first yaml layers, train. Composition check: weights that
    arrive through the upstream import bridge stay byte-identical in the
    frozen layers after fine-tuning — params AND BN statistics."""
    from aerial_image_recognition_tpu.models.registry import (
        ModelBundle, REGISTRY)
    from aerial_image_recognition_tpu.models.import_torch import (
        variables_from_torch_state)
    from aerial_image_recognition_tpu.models.upstream_spec import (
        YOLOV7_TINY_SPEC, make_state_dict)
    from aerial_image_recognition_tpu.pipeline.train import fit

    sd = make_state_dict(YOLOV7_TINY_SPEC, nc=1, seed=3)
    variables = variables_from_torch_state(sd, "yolov7_itcvd")
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables)
    spec = REGISTRY["yolov7_itcvd"]
    bundle = ModelBundle(spec=spec, module=spec.make_module(
        dtype=jnp.float32), params=variables)

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    state = fit(bundle, OneBatchLoader(), epochs=2, lr=1e-2,
                bn_mode="batch", freeze=[0, 1, 2])
    imported_p = _flat(variables["params"])
    imported_bs = _flat(variables["batch_stats"])
    p1 = _flat(state["params"])
    bs1 = _flat(state["batch_stats"])

    def is_frozen(k):
        return (k.startswith("['stem0']") or k.startswith("['stem1']")
                or k.startswith("['elan1']['cv1']"))

    for k in imported_p:
        if is_frozen(k):
            np.testing.assert_array_equal(imported_p[k], p1[k], err_msg=k)
    for k in imported_bs:
        if is_frozen(k):
            np.testing.assert_array_equal(imported_bs[k], bs1[k],
                                          err_msg=k)
    assert any(not np.array_equal(imported_p[k], p1[k])
               for k in imported_p if not is_frozen(k))


@pytest.mark.slow
def test_cli_finetune_drill(tmp_path, rng):
    """The complete migration fine-tune drill, all through the CLI: a
    synthetic upstream-named blob → `import-weights` → `train --params
    ... --freeze 0,1,2` → the deployed checkpoint's frozen layers are
    byte-identical to the import. This is the notebook workflow (load
    pretrained, freeze, train) as two shell commands."""
    import json

    from PIL import Image

    from aerial_image_recognition_tpu.models.onnx_lite import (
        write_minimal_onnx)
    from aerial_image_recognition_tpu.models.registry import load_params
    from aerial_image_recognition_tpu.models.upstream_spec import (
        YOLOV7_TINY_SPEC, make_state_dict)
    from aerial_image_recognition_tpu.pipeline.cli import main

    sd = make_state_dict(YOLOV7_TINY_SPEC, nc=1, seed=5)
    blob = str(tmp_path / "blob.onnx")
    write_minimal_onnx(blob, sd)
    imported = str(tmp_path / "imported.npz")
    assert main(["import-weights", blob, "--model", "yolov7_itcvd",
                 "--out", imported]) == 0

    imdir = tmp_path / "images"
    imdir.mkdir()
    images, anns = [], []
    for i in range(4):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(imdir / f"im{i}.png"))
        images.append({"id": i, "file_name": f"im{i}.png",
                       "width": 64, "height": 64})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [15, 20, 20, 10]})
    coco = str(tmp_path / "coco.json")
    with open(coco, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "car"}]}, f)

    out = str(tmp_path / "tuned.npz")
    assert main(["train", "--coco", coco, "--images", str(imdir),
                 "--model", "yolov7_itcvd", "--imgsz", "64", "--batch",
                 "2", "--epochs", "1", "--n-train", "3", "--lr", "1e-2",
                 "--params", imported, "--freeze", "0,1,2",
                 "--out", out]) == 0

    before = _flat(load_params(imported))
    after = _flat(load_params(out))

    def is_frozen(k):
        return (k.startswith("['params']['stem0']")
                or k.startswith("['params']['stem1']")
                or k.startswith("['params']['elan1']['cv1']")
                or k.startswith("['batch_stats']['stem0']")
                or k.startswith("['batch_stats']['stem1']")
                or k.startswith("['batch_stats']['elan1']['cv1']"))

    frozen = [k for k in before if is_frozen(k)]
    assert frozen
    for k in frozen:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)
    assert any(not np.array_equal(before[k], after[k])
               for k in before if not is_frozen(k))


def test_recalibrate_bn_keeps_frozen_stats(rng):
    """Post-training BN recalibration must not touch frozen layers: their
    statistics describe the (pretrained) distribution they were trained
    on, not this loader's."""
    from aerial_image_recognition_tpu.pipeline.train import recalibrate_bn

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)

        def epoch(self, i):
            yield self.images, None

    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    state = {"params": bundle.params["params"],
             "batch_stats": bundle.params["batch_stats"]}
    out = recalibrate_bn(bundle, state, OneBatchLoader(), passes=1,
                         freeze_prefixes=("stem0",))
    bs0 = _flat(state["batch_stats"])
    bs1 = _flat(out["batch_stats"])
    for k in bs0:
        if k.startswith("['stem0']"):
            np.testing.assert_array_equal(bs0[k], bs1[k], err_msg=k)
    assert any(not np.array_equal(bs0[k], bs1[k])
               for k in bs0 if not k.startswith("['stem0']"))


def test_fit_patience_early_stop_and_best(rng, monkeypatch):
    """patience (notebook cell 14: patience=40): training stops after N
    non-improving evals and state['best'] holds the best-fitness epoch's
    weights (the ultralytics best.pt analogue)."""
    import aerial_image_recognition_tpu.pipeline.train as T

    maps = iter([(0.5, 0.4), (0.9, 0.8), (0.3, 0.2), (0.3, 0.2),
                 (0.3, 0.2), (0.3, 0.2)])

    def fake_evaluate(bundle, state, loader, conf_threshold=0.25):
        m50, m5095 = next(maps)
        return {"mAP50": m50, "mAP50_95": m5095}

    monkeypatch.setattr(T, "evaluate", fake_evaluate)

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    loader = OneBatchLoader()
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    logs = []
    state = T.fit(bundle, loader, epochs=10, lr=1e-2, eval_loader=loader,
                  eval_every=1, patience=2, log_fn=logs.append)
    # best at epoch 1 (fitness .1*.9+.9*.8=0.81), stop at epoch 3
    hist = state["history"]
    assert len(hist) == 4
    assert hist[1]["fitness"] == pytest.approx(0.81)
    assert any("early stop at epoch 3" in m for m in logs)
    best = state["best"]
    assert best["epoch"] == 1 and best["fitness"] == pytest.approx(0.81)
    # the retained weights are the epoch-1 snapshot, not the final ones
    b = _flat(best["params"])
    f = _flat(state["params"])
    assert any(not np.array_equal(b[k], f[k]) for k in b)


def test_fit_best_flat_curve_keeps_latest(rng, monkeypatch):
    """On a flat fitness curve (e.g. mAP pinned at 0 early in a
    from-scratch run) ties go to the LATER epoch: 'best' must not freeze
    the first eval's near-untrained weights."""
    import aerial_image_recognition_tpu.pipeline.train as T

    def fake_evaluate(bundle, state, loader, conf_threshold=0.25):
        return {"mAP50": 0.0, "mAP50_95": 0.0}

    monkeypatch.setattr(T, "evaluate", fake_evaluate)

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    loader = OneBatchLoader()
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    state = T.fit(bundle, loader, epochs=3, lr=1e-2, eval_loader=loader,
                  eval_every=1)
    assert state["best"]["epoch"] == 2     # the LAST eval's snapshot
    b = _flat(state["best"]["params"])
    f = _flat(state["params"])
    for k in b:
        np.testing.assert_array_equal(b[k], f[k], err_msg=k)


def test_fit_patience_counts_only_at_evals(rng, monkeypatch):
    """With eval_every > 1, patience must not fire between evals — the
    model always gets another eval before stopping."""
    import aerial_image_recognition_tpu.pipeline.train as T

    calls = []

    def fake_evaluate(bundle, state, loader, conf_threshold=0.25):
        calls.append(1)
        return {"mAP50": 0.5, "mAP50_95": 0.5}

    monkeypatch.setattr(T, "evaluate", fake_evaluate)

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    loader = OneBatchLoader()
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    logs = []
    state = T.fit(bundle, loader, epochs=12, lr=1e-2, eval_loader=loader,
                  eval_every=3, patience=2, log_fn=logs.append)
    # evals at epochs 2,5 (flat): best at 2; patience=2 would fire at
    # epoch 4 under epoch-granular checking — it must instead fire AT the
    # epoch-5 eval (5-2 >= 2), after a second eval ran
    assert len(calls) == 2
    assert len(state["history"]) == 6
    assert any("early stop at epoch 5" in m for m in logs)


def test_fit_eval_fn_drives_best_and_patience(rng):
    """fit(eval_fn=...) — the segmentation-style metric hook: a supplied
    'fitness' drives best-weight retention and early stopping; a
    fitness-less eval_fn only logs and never early-stops."""
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
    fitnesses = iter([0.8, 0.5, 0.5, 0.5])

    def eval_fn(bundle, state):
        f = next(fitnesses)
        return {"mask_iou": f, "fitness": f}

    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    logs = []
    state = fit(bundle, loader, epochs=10, lr=1e-2, eval_fn=eval_fn,
                eval_every=1, patience=2, log_fn=logs.append)
    assert state["best"]["epoch"] == 0
    assert state["best"]["fitness"] == pytest.approx(0.8)
    assert len(state["history"]) == 3      # best at 0, stop at epoch 2
    assert any("early stop at epoch 2" in m for m in logs)
    assert state["history"][0]["mask_iou"] == pytest.approx(0.8)

    def no_fitness(bundle, state):
        return {"mask_iou": 0.0}

    bundle2 = create_model("yolov7_itcvd", dtype=jnp.float32)
    state2 = fit(bundle2, loader, epochs=4, lr=1e-2, eval_fn=no_fitness,
                 eval_every=1, patience=1)
    assert len(state2["history"]) == 4     # never early-stops
    assert "best" not in state2


def test_freeze_typo_raises():
    """A mistyped freeze prefix must not silently train the layer the
    user believes is frozen."""
    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    mask_prefixes = resolve_freeze_prefixes(bundle, ["setm0", "stem1"])
    with pytest.raises(ValueError, match="setm0"):
        _freeze_mask(bundle.params["params"], mask_prefixes)


def test_fit_freeze_smoke(rng):
    """fit(freeze=...) end to end on one batch — the CLI path."""
    from aerial_image_recognition_tpu.pipeline.train import fit

    class OneBatchLoader:
        def __init__(self):
            self.images = rng.integers(0, 255, (2, 64, 64, 3),
                                       dtype=np.uint8)
            self.targets = np.full((2, 8, 5), -1.0, np.float32)
            self.targets[:, 0] = (0, 32.0, 32.0, 12.0, 10.0)

        def epoch(self, i):
            yield self.images, self.targets

    bundle = create_model("yolov7_itcvd", dtype=jnp.float32)
    s0 = _flat(bundle.params["params"])
    state = fit(bundle, OneBatchLoader(), epochs=2, lr=1e-2,
                freeze=[0, 1, "elan1/cv1"])
    s1 = _flat(state["params"])
    for k in s0:
        if (k.startswith("['stem0']") or k.startswith("['stem1']")
                or k.startswith("['elan1']['cv1']")):
            np.testing.assert_array_equal(s0[k], s1[k], err_msg=k)
    assert any(not np.array_equal(s0[k], s1[k]) for k in s1)
