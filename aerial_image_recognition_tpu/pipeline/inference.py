"""The fused detection step: uint8 tiles → georeferenced detections.

One jit-compiled program per (model, batch, size): preprocess → backbone →
decode → NMS → pixel→geo, replacing the reference's host-side
preprocess + per-image ONNX session.run + python postprocess chain
(simple_detector.py:648-677). Batched end to end — the single biggest
perf win over the reference's batch=1 constraint (simple_detector.py:649).
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from aerial_image_recognition_tpu.models.registry import ModelBundle, create_model
from aerial_image_recognition_tpu.ops.nms import batched_nms
from aerial_image_recognition_tpu.ops.preprocess import (matmul_resize_float,
                                                         preprocess_batch)
from aerial_image_recognition_tpu.post.georef import lonlat_jax
from aerial_image_recognition_tpu.runtime.config import DetectorConfig


@dataclass
class DetectStep:
    """Compiled detection step + its host-side metadata."""
    bundle: ModelBundle
    fn: Callable  # (params, images_u8 [B,S,S,3], bounds [B,4]) -> (Detections, lon, lat)
    batch: int
    input_size: int          # source pixels per tile edge entering the step
    model_size: int = 640    # network input edge (pixel frame of det.boxes)
    # when data-parallel: NamedShardings for (images, bounds) so the ingest
    # plane can device_put straight into the sharded layout (one H2D per chip)
    input_shardings: Optional[tuple] = None
    # "hwc": images arrive [B,S,S,3]; "s2d2": the host assembles batches in
    # space_to_depth^2 layout [B,S/4,S/4,48] for the quad-stem lowering
    # (ops/quadstem.py — same PCIe bytes, stems run as MXU-shaped convs)
    input_layout: str = "hwc"

    def __call__(self, images_u8, bounds):
        return self.fn(self.bundle.params, self.pack_images(images_u8),
                       bounds)

    def pack_images(self, images_u8):
        """Convert a host [B,S,S,3] uint8 batch to this step's input
        layout (no-op for already-packed or hwc input). The ingest plane
        assembles directly in the right layout; this covers callers that
        build plain image batches (serve, geotiff windows, tests)."""
        if (self.input_layout == "s2d2" and hasattr(images_u8, "shape")
                and images_u8.ndim == 4 and images_u8.shape[-1] == 3):
            from aerial_image_recognition_tpu.ops.quadstem import host_s2d2
            import numpy as _np
            return host_s2d2(_np.asarray(images_u8))
        return images_u8


def _resolve_vote_iou(cfg: DetectorConfig):
    """extra.box_voting → the vote_iou passed to batched_nms.

    Explicitly set: that value (0/False/None = off). Unset: 0.5 when
    multiscale is on (the round-5 on-chip A/B measured cross-scale voting
    best-of-any-mode — candidates from every scale refine the kept box),
    off single-scale (measured neutral there: each box has ~1 voter).
    """
    if not hasattr(cfg, "extra"):
        return None
    if "box_voting" in cfg.extra:
        v = cfg.extra["box_voting"]
        return float(v) if v else None
    return 0.5 if cfg.extra.get("multiscale") else None


def make_detect_fn(bundle: ModelBundle, cfg: DetectorConfig,
                   src_size: Optional[int] = None,
                   crop_size: Optional[int] = None,
                   model_size: Optional[int] = None,
                   quad: bool = False):
    """Build the pure (params, images_u8, bounds) → results function.

    src_size: source pixel edge of incoming tiles (e.g. 1024 mosaics or 864
    crops); defaults to the model input size. model_size overrides the
    network input edge (fully-convolutional, used for tiny-shape dry runs).
    The whole chain is one XLA program: normalize/resize fuses into the
    first conv, NMS and georef run on device so only ~max_det·6 floats
    return to host per tile.
    """
    spec = bundle.spec
    model_size = model_size or spec.input_size
    tta = bool(cfg.extra.get("tta", False)) if hasattr(cfg, "extra") else False
    # quad: caller asserts the input arrives in s2d^2 layout (decided by
    # build_detect_step via use_quad_stem — direct make_detect_fn callers
    # keep the [B,S,S,3] contract unless they opt in)
    if hasattr(cfg, "extra") and cfg.extra.get("multiscale") \
            and cfg.extra.get("multiscale_weights") is not None \
            and len(cfg.extra["multiscale_weights"]) \
            != len(cfg.extra["multiscale"]):
        raise ValueError(
            f"multiscale_weights has "
            f"{len(cfg.extra['multiscale_weights'])} entries for "
            f"{len(cfg.extra['multiscale'])} scales")

    def finish(boxes, scores, bounds):
        det = batched_nms(
            boxes, scores,
            num_classes=spec.num_classes,
            conf_threshold=cfg.confidence_threshold,
            iou_threshold=cfg.nms_iou_threshold,
            max_det=cfg.max_detections_per_tile,
            # defaults from the round-2 interleaved A/B (BASELINE.md):
            # approx_max_k preselect (the TPU-native partial sort) over
            # 256 candidates is +10% step throughput vs exact/512, with
            # detection-set parity on realistic loads (the reference
            # keeps only top-10/tile; 256 candidates >= anything a 64 m
            # tile holds). Exact mode stays one config knob away.
            pre_topk=int(cfg.extra.get("nms_pre_topk", 256)),
            class_aware=True,
            preselect=cfg.extra.get("nms_preselect", "approx"),
            # None → pallas on TPU, scan elsewhere; "fixpoint" selects the
            # Jacobi-fixpoint formulation (ops/nms._nms_fixpoint)
            suppression=cfg.extra.get("nms_suppression"),
            # extra.box_voting: IoU gate for score-weighted box refinement
            # of NMS survivors (ops/nms.box_voting). Unset → DEFAULT 0.5
            # under multiscale, off otherwise: the round-5 on-chip A/B
            # (artifacts/accuracy_r5/box_voting.json, after the einsum
            # precision pin) measured cross-scale voting as the best mode
            # of any tested — mAP50 0.749 vs 0.731 ms_w80 / 0.720 TTA,
            # hard-recall@.5 +2–4 pts — while single-scale voting was
            # neutral (0.703 vs 0.703). Explicit 0/False disables.
            vote_iou=_resolve_vote_iou(cfg))
        lon, lat = lonlat_jax(det.boxes[..., :2], bounds, model_size)
        return det, lon, lat

    def detect(params, images_u8, bounds):
        if quad:
            # host-relayouted s2d^2 uint8 batch [B,S/4,S/4,48]: preprocess
            # (/255) folds into the quad stem's first conv (ops/quadstem.py)
            boxes, scores = bundle.forward_s2d2(params, images_u8)
            return finish(boxes, scores, bounds)
        x = preprocess_batch(
            images_u8, out_size=model_size, crop_size=crop_size,
            method="bilinear",
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
            # MXU separable resize (ops/preprocess._matmul_resize);
            # extra.resize_matmul=false restores the f32 gather lowering
            matmul=bool(cfg.extra.get("resize_matmul", True)))
        if cfg.extra.get("enhance_shadows"):
            # XYZ-path shadow enhancement (xyz_handler.py:177-185), on device
            from aerial_image_recognition_tpu.ops.augment import enhance_shadows
            x = enhance_shadows(x)
        if tta:
            # variation stack folded into the batch dim: one forward for
            # B·V images, detections unioned before NMS (ops.augment).
            from aerial_image_recognition_tpu.ops.augment import (
                DEFAULT_VARIATIONS, expand_tta)
            b = x.shape[0]
            # extra.tta_hist_subsample > 1: stride-s CLAHE histogram
            # estimation (throughput/accuracy knob — BASELINE.md round 4);
            # extra.tta_clahe_backend: 'auto' = XLA apply (measured-best
            # on chip, round-5 A/B) / 'pallas' forces the kernel
            xv, wts = expand_tta(
                x, clahe_hist_subsample=int(
                    cfg.extra.get("tta_hist_subsample", 1)),
                clahe_backend=str(
                    cfg.extra.get("tta_clahe_backend", "auto")))
            boxes_v, scores_v = bundle.forward(params, xv)
            v = len(DEFAULT_VARIATIONS)
            a = boxes_v.shape[1]
            boxes = boxes_v.reshape(v, b, a, 4).transpose(1, 0, 2, 3) \
                .reshape(b, v * a, 4)
            scores = (scores_v.reshape(v, b, a, -1)
                      * wts[:, None, None, None].astype(scores_v.dtype)) \
                .transpose(1, 0, 2, 3).reshape(b, v * a, -1)
        elif cfg.extra.get("multiscale"):
            # multiscale inference — same scale set as the archived
            # generation (x_arch/03_analyze_wms.ipynb cell 8: [0.85, 1.0,
            # 1.15]) but a pixel-rescale APPROXIMATION of its bbox-rescale:
            # the notebook refetched a scaled ground bbox at a fixed 640 px
            # (scale 0.85 makes objects LARGER) and deduped by 2 m UTM
            # distance; here each scale resizes the same tile's pixels
            # (0.85 → 544 px makes objects smaller) and the union is merged
            # by one NMS. Forward at each scale, union the decoded boxes
            # (rescaled to the base frame) before NMS.
            scales = tuple(cfg.extra["multiscale"])
            # extra.multiscale_weights: per-scale confidence weights (the
            # TTA ladder's per-variation-weight idea, gpu_handler_archive
            # .py:69-122, applied across scales): the round-5 accuracy A/B
            # showed union-NMS letting a misfit off-scale box outscore and
            # suppress the better native-scale box on 9x4 px cars
            # (easy-recall@IoU.5 0.983->0.740); downweighting off-native
            # scales makes the native box win those NMS ties while
            # off-scale-only discoveries still surface. Default 0.8 for
            # every non-native scale: the on-chip sweep (0.7/0.8/0.9 vs
            # unweighted, artifacts/accuracy_r5/ms_weights.json) measured
            # 0.8 best — mAP50 0.731 vs 0.508 unweighted with multiscale's
            # hard-case discovery intact (BASELINE.md round-5 section).
            # Explicit all-1.0 restores the unweighted union.
            ms_wts = cfg.extra.get("multiscale_weights")
            if ms_wts is None:
                ms_wts = [1.0 if float(sc) == 1.0 else 0.8 for sc in scales]
            use_mm = bool(cfg.extra.get("resize_matmul", True))
            boxes_l, scores_l = [], []
            for si, sc in enumerate(scales):
                size_s = max(32, int(round(model_size * sc / 32)) * 32)
                if size_s == model_size:
                    xs = x
                elif use_mm:
                    # bf16 MXU separable resize (same exact weights as
                    # jax.image.resize — ops/preprocess.matmul_resize_float)
                    xs = matmul_resize_float(x, size_s, "bilinear")
                else:
                    xs = jax.image.resize(
                        x, (x.shape[0], size_s, size_s, x.shape[3]),
                        method="bilinear")
                bb, ss = bundle.forward(params, xs)
                boxes_l.append(bb * (model_size / size_s))
                if ms_wts is not None and float(ms_wts[si]) != 1.0:
                    ss = ss * jnp.asarray(float(ms_wts[si]), ss.dtype)
                scores_l.append(ss)
            boxes = jnp.concatenate(boxes_l, axis=1)
            scores = jnp.concatenate(scores_l, axis=1)
        else:
            boxes, scores = bundle.forward(params, x)
        return finish(boxes, scores, bounds)

    return detect


def use_quad_stem(bundle: ModelBundle, cfg: DetectorConfig, *,
                  src_size=None, crop_size=None, model_size=None) -> bool:
    """True when the quad-stem lowering applies: yolov7-tiny standard
    stems, native-size tiles (no device crop/resize), and none of the
    pixel-space options (TTA / multiscale / shadow enhancement / CLAHE)
    that need the [B,S,S,3] image form. Opt out via extra.quad_stem=false.
    """
    if not bool(cfg.extra.get("quad_stem", True)):
        return False
    if not bundle.supports_s2d2():
        return False
    eff_model = model_size or bundle.spec.input_size
    if eff_model % 4:
        return False
    # the quad stem consumes the raw tile pixels — any device-side crop or
    # resize would have to happen before it, so those paths keep the
    # standard stems
    if crop_size is not None or src_size not in (None, eff_model):
        return False
    for key in ("tta", "multiscale", "enhance_shadows"):
        if cfg.extra.get(key):
            return False
    return True


def build_detect_step(cfg: DetectorConfig, *, batch: Optional[int] = None,
                      bundle: Optional[ModelBundle] = None,
                      src_size: Optional[int] = None,
                      crop_size: Optional[int] = None,
                      model_size: Optional[int] = None,
                      donate: bool = False,
                      mesh=None, mesh_axis: str = "data") -> DetectStep:
    """Single-device by default; pass a `jax.sharding.Mesh` for data-parallel
    inference — the batch dim is sharded over the mesh via shard_map (each
    chip runs the full per-tile program, including the Pallas NMS kernel,
    on its batch shard; no collectives — detection is embarrassingly
    parallel over tiles). This is the production form of SURVEY §2.3's
    primary parallelism; the reference is hard-wired to one GPU
    (_script/gpu_handler.py:42, device_id 0).

    shard_map (not jit-with-in_shardings) is deliberate: the NMS tail is a
    Pallas custom call, opaque to GSPMD's propagation, so explicit per-shard
    execution is the only layout XLA can't silently replicate.
    """
    # donate defaults False: the uint8 image input can never alias the
    # f32/int outputs, so donation frees nothing and XLA warns on every
    # trace. (The cuDNN-allocator parity story is the readback-synced
    # measurement + H2D overlap in ingest.run_pipeline, not donation.)
    bundle = bundle or create_model(
        cfg.model_path,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        params_path=cfg.params_path)
    if (cfg.extra.get("quantize") == "int8"
            and bundle.__class__.__name__ != "Int8Bundle"):
        # int8 trunk PTQ (models/int8.py) — with a saved calibration
        # (CLI `calibrate` / models.int8.save_absmax) quantize up front;
        # WITHOUT one, self-calibrate on the scan's own first batches
        # (exactly as segment_geotiff does on its raster windows), guarded
        # by a first-batch bf16-vs-int8 parity check with automatic
        # bf16 fallback. Callers may instead pass a pre-built Int8Bundle
        # via bundle=.
        from aerial_image_recognition_tpu.models.int8 import (
            load_absmax, quantize_bundle)
        calib = cfg.extra.get("quantize_calib")
        if calib:
            bundle = quantize_bundle(bundle, [], absmax=load_absmax(calib))
        else:
            if donate:
                # self-calibration must replay calibration inputs (host
                # copies for absmax, the reference batch through the int8
                # rebuild) — donation would free those buffers under the
                # first call. donate defaults False everywhere; fail loudly
                # rather than read donated memory.
                raise ValueError(
                    "donate=True cannot compose with turnkey int8 "
                    "self-calibration (inputs are replayed for the parity "
                    "gate); pass a calibration file or donate=False")
            kwargs = dict(batch=batch, src_size=src_size,
                          crop_size=crop_size, model_size=model_size,
                          donate=donate, mesh=mesh, mesh_axis=mesh_axis)
            base = _compile_detect_step(bundle, cfg, **kwargs)
            return SelfQuantizingStep(base, cfg, kwargs)
    return _compile_detect_step(bundle, cfg, batch=batch, src_size=src_size,
                                crop_size=crop_size, model_size=model_size,
                                donate=donate, mesh=mesh,
                                mesh_axis=mesh_axis)


def _compile_detect_step(bundle: ModelBundle, cfg: DetectorConfig, *,
                         batch: Optional[int] = None,
                         src_size: Optional[int] = None,
                         crop_size: Optional[int] = None,
                         model_size: Optional[int] = None,
                         donate: bool = False,
                         mesh=None, mesh_axis: str = "data") -> DetectStep:
    """Compile a DetectStep for an already-resolved bundle (the shared tail
    of build_detect_step and the int8 self-calibration rebuild)."""
    quad = use_quad_stem(bundle, cfg, src_size=src_size,
                         crop_size=crop_size, model_size=model_size)
    detect = make_detect_fn(bundle, cfg, src_size=src_size,
                            crop_size=crop_size, model_size=model_size,
                            quad=quad)
    eff_batch = batch or cfg.device_batch
    input_shardings = None
    if mesh is None:
        fn = jax.jit(detect, donate_argnums=(1,) if donate else ())
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = mesh.shape[mesh_axis]
        if eff_batch % n:
            raise ValueError(
                f"device_batch {eff_batch} must divide evenly over the "
                f"{n}-device '{mesh_axis}' mesh axis (set device_batch to a "
                f"multiple of {n})")
        # check_vma=False: the body is collective-free (embarrassingly
        # parallel over tiles) and the Pallas NMS custom call doesn't carry
        # the varying-mesh-axes metadata the checker wants on TPU.
        fn = jax.jit(jax.shard_map(
            detect, mesh=mesh,
            in_specs=(P(), P(mesh_axis), P(mesh_axis)),
            out_specs=P(mesh_axis), check_vma=False))
        import dataclasses
        bundle = dataclasses.replace(
            bundle, params=jax.device_put(bundle.params,
                                          NamedSharding(mesh, P())))
        bsh = NamedSharding(mesh, P(mesh_axis))
        input_shardings = (bsh, bsh)
    # input_size: what the ingest plane should hand the step. A model_size
    # override (tiny dry runs, reduced-resolution scans) moves the expected
    # tile edge too — leaving it at the spec's 640 made ingest silently
    # UPSCALE small tiles into the step (caught by
    # tests/test_int8.py::test_int8_full_city_scan)
    step = DetectStep(bundle=bundle, fn=fn, batch=eff_batch,
                      input_size=src_size or model_size
                      or bundle.spec.input_size,
                      input_shardings=input_shardings,
                      input_layout="s2d2" if quad else "hwc")
    step.model_size = model_size or bundle.spec.input_size
    return step


def detection_sets_agree(out_a, out_b, *, min_match_frac: float = 0.9,
                         iou_threshold: float = 0.5,
                         max_mean_score_delta: float = 0.05):
    """Compare two detect-step outputs (Detections, lon, lat) for practical
    equivalence: per image, greedy same-class IoU≥0.5 matching; pass iff
    matched ≥ min_match_frac of the larger set AND the mean |Δscore| over
    matches stays small. Returns (ok, stats_dict) — the int8 turnkey
    parity gate (and reusable for any A/B of two step builds)."""
    import numpy as np
    det_a, det_b = out_a[0], out_b[0]
    va = np.asarray(det_a.valid)
    vb = np.asarray(det_b.valid)
    ba, bb = np.asarray(det_a.boxes), np.asarray(det_b.boxes)
    sa, sb = np.asarray(det_a.scores), np.asarray(det_b.scores)
    ca, cb = np.asarray(det_a.classes), np.asarray(det_b.classes)
    total_a = int(va.sum())
    total_b = int(vb.sum())
    matched = 0
    deltas = []
    for i in range(va.shape[0]):
        ia, ib = np.where(va[i])[0], np.where(vb[i])[0]
        if not len(ia) or not len(ib):
            continue
        A, B = ba[i][ia], bb[i][ib]
        ax1, ay1 = A[:, 0] - A[:, 2] / 2, A[:, 1] - A[:, 3] / 2
        ax2, ay2 = A[:, 0] + A[:, 2] / 2, A[:, 1] + A[:, 3] / 2
        bx1, by1 = B[:, 0] - B[:, 2] / 2, B[:, 1] - B[:, 3] / 2
        bx2, by2 = B[:, 0] + B[:, 2] / 2, B[:, 1] + B[:, 3] / 2
        ix = np.maximum(0.0, np.minimum(ax2[:, None], bx2[None, :])
                        - np.maximum(ax1[:, None], bx1[None, :]))
        iy = np.maximum(0.0, np.minimum(ay2[:, None], by2[None, :])
                        - np.maximum(ay1[:, None], by1[None, :]))
        inter = ix * iy
        union = ((ax2 - ax1) * (ay2 - ay1))[:, None] \
            + ((bx2 - bx1) * (by2 - by1))[None, :] - inter
        iou = inter / np.maximum(union, 1e-9)
        iou[ca[i][ia][:, None] != cb[i][ib][None, :]] = 0.0
        used = np.zeros(len(ib), bool)
        for j in np.argsort(-sa[i][ia], kind="stable"):
            k = int(np.argmax(np.where(used, -1.0, iou[j])))
            if iou[j, k] >= iou_threshold and not used[k]:
                used[k] = True
                matched += 1
                deltas.append(abs(float(sa[i][ia[j]]) -
                                  float(sb[i][ib[k]])))
    bigger = max(total_a, total_b)
    mean_delta = float(np.mean(deltas)) if deltas else 0.0
    ok = (matched >= min_match_frac * bigger if bigger else True) \
        and mean_delta <= max_mean_score_delta
    return ok, {"total_a": total_a, "total_b": total_b,
                "matched": matched, "mean_score_delta": round(mean_delta, 4)}


class SelfQuantizingStep:
    """Turnkey int8: a DetectStep shim that calibrates itself on the scan's
    own first batches, then hot-swaps to the int8-quantized program behind
    a NON-VACUOUS parity gate.

    The reference's int8 story is an archived TensorRT deployment config
    (simple_detector_arch.py:40-78) requiring an offline engine build; the
    segmentation path here already self-calibrates on its raster
    (pipeline/rasters.py) — this brings the same UX to detect/serve:
    ``--quantize int8`` with no ``calibrate`` step.

    Semantics (round 5 — the round-4 gate could pass vacuously when the
    calibration batches held no detections, silently hot-swapping exactly
    the scans whose detections only arrive later):

    * The first ``quantize_calib_batches`` (default 2) batches run in bf16
      (their results are final — nothing is reprocessed) and their images
      calibrate the activation absmax table.
    * The swap additionally requires a *detection-bearing* bf16 reference
      batch: calibration keeps waiting (bf16, no further image collection)
      until some batch's bf16 output holds at least
      ``quantize_parity_min_detections`` (default 1) detections; that
      batch's images join the calibration set and its output anchors the
      parity gate (detection_sets_agree), so the gate can never pass on an
      empty-vs-empty comparison.
    * Bounded wait, settling on bf16: after ``quantize_calib_wait_batches``
      (default 16) batches with no detection anywhere, the step STAYS bf16
      (state 'bf16-fallback', reason recorded) — correctness-neutral by
      definition on the detections seen so far, and it ends the per-batch
      host readback the wait costs. The alternative ('int8-unvalidated':
      swap now, validate retroactively) was built and rejected by its own
      regression test: an int8 program calibrated on degenerate content can
      silently DROP detections, and a retroactive gate keyed on the int8
      output's own detections can never see them. Scans known to start
      sparse (ocean approach, cloud deck) should raise
      ``quantize_calib_wait_batches``.
    * Any quantization error or parity miss ⇒ the scan silently continues
      in bf16 (state 'bf16-fallback', reason recorded).

    States: 'calibrating' → 'int8' | 'bf16-fallback'; observable via
    .quantize_state/.parity.
    """

    def __init__(self, base: DetectStep, cfg: DetectorConfig, kwargs: dict):
        self._base = base
        self._active = base
        self._cfg = cfg
        self._kwargs = kwargs
        self._target = max(1, int(cfg.extra.get("quantize_calib_batches",
                                                2)))
        self._min_det = max(1, int(cfg.extra.get(
            "quantize_parity_min_detections", 1)))
        self._max_wait = max(self._target, int(cfg.extra.get(
            "quantize_calib_wait_batches", 16)))
        self._collected = []      # host uint8 [B,S,S,3] copies
        self._ref = None          # (images-as-given, bounds, bf16 out)
        self._seen = 0            # bf16 batches observed while calibrating
        self.quantize_state = "calibrating"
        self.parity = None
        self.fallback_reason = None

    @property
    def active_step(self) -> DetectStep:
        """The DetectStep currently serving calls (bf16 until the swap)."""
        return self._active

    @property
    def base_step(self) -> DetectStep:
        """The bf16 step (kept after the swap — bench A/Bs against it)."""
        return self._base

    # -- DetectStep surface (run_pipeline/CarDetector/serve read these) --
    @property
    def bundle(self):
        return self._active.bundle

    @property
    def batch(self):
        return self._active.batch

    @property
    def input_size(self):
        return self._active.input_size

    @property
    def model_size(self):
        return self._active.model_size

    @property
    def input_shardings(self):
        return self._active.input_shardings

    @property
    def input_layout(self):
        return self._active.input_layout

    def pack_images(self, images_u8):
        return self._active.pack_images(images_u8)

    def __call__(self, images, bounds):
        if self.quantize_state != "calibrating":
            return self._active(images, bounds)
        import numpy as np
        collect = len(self._collected) < self._target
        host = np.asarray(images) if collect else None  # donation-safe copy
        out = self._base(images, bounds)
        self._seen += 1
        # non-vacuous gate: a parity reference must carry detections
        ndet = int(np.asarray(out[0].valid).sum())
        if ndet >= self._min_det and self._ref is None:
            self._ref = (images, bounds, out)
            if not collect:
                # the reference batch joins the calibration set so absmax
                # sees detection-bearing content even when the first
                # `target` batches were empty scenery
                collect, host = True, np.asarray(images)
        if collect:
            if self._base.input_layout == "s2d2" and host.shape[-1] != 3:
                from aerial_image_recognition_tpu.ops.quadstem import (
                    host_s2d2_inverse)
                host = host_s2d2_inverse(host)
            self._collected.append(host)
        if len(self._collected) >= self._target and self._ref is not None:
            self._quantize()
        elif self._seen >= self._max_wait:
            # settle on bf16: no detection-bearing batch to validate
            # against within the wait budget (see class docstring for why
            # swapping unvalidated is unsound)
            self.quantize_state = "bf16-fallback"
            self.fallback_reason = (
                f"no detections in the first {self._seen} batches to "
                "validate int8 parity — staying bf16 (raise "
                "quantize_calib_wait_batches for scans that start sparse)")
            print(f"int8 self-calibration: {self.fallback_reason}")
            self._collected = []
            self._ref = None
        return out

    def _quantize(self):
        from aerial_image_recognition_tpu.models.int8 import quantize_bundle
        try:
            # chunk to 8-row calibration batches: calibrate_absmax captures
            # EVERY intermediate of its forward, so a full 128×640² device
            # batch OOMs the chip (absmax is a running max — chunking is
            # exact; same discipline as pipeline/rasters.py and cli.py)
            calib = [c[i:i + 8] for c in self._collected
                     for i in range(0, len(c), 8)]
            qb = quantize_bundle(self._base.bundle, calib,
                                 model_size=self._base.model_size)
            qstep = _compile_detect_step(qb, self._cfg, **self._kwargs)
            if qstep.input_layout != self._base.input_layout:
                raise RuntimeError(
                    f"int8 step layout {qstep.input_layout!r} != bf16 "
                    f"{self._base.input_layout!r} — ingest batches would "
                    "be misshaped")
            images, bounds, bf16_out = self._ref
            qout = qstep(images, bounds)
            ok, stats = detection_sets_agree(bf16_out, qout)
            self.parity = stats
            if not ok:
                raise RuntimeError(
                    f"first-batch bf16-vs-int8 parity check failed: {stats}")
            self._active = qstep
            self.quantize_state = "int8"
            print(f"int8 self-calibration: switched to int8 after "
                  f"{self._seen} batches (parity {stats})")
        except Exception as e:          # noqa: BLE001 — any failure ⇒ bf16
            self.quantize_state = "bf16-fallback"
            self.fallback_reason = repr(e)
            print(f"int8 self-calibration failed — continuing in bf16: {e}")
        finally:
            self._collected = []
            self._ref = None


def make_segment_fn(bundle: ModelBundle, cfg: DetectorConfig):
    """XUnet path: uint8 tiles → sigmoid masks (shares the batched executor)."""
    model_size = bundle.spec.input_size

    def segment(params, images_u8):
        x = preprocess_batch(
            images_u8, out_size=model_size,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
        logits = bundle.forward(params, x)
        return jax.nn.sigmoid(logits)

    return segment
