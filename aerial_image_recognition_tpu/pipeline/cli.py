"""Command-line interface.

The reference has no CLI — entry scripts hardcode config dicts
(car_detection_on_wms.py:11-15, simple_detector.py:710-713; SURVEY.md §5
config/flag system). This exposes the same knobs (same key names as
DEFAULT_CONFIG) as flags, plus a resolution sweep subcommand mirroring
test_configurations.py.

Usage:
  python -m aerial_image_recognition_tpu detect --frame warsaw.shp \
      --xyz-url "http://mt{s}.google.com/vt/lyrs=s&x={x}&y={y}&z={z}" --use-xyz
  python -m aerial_image_recognition_tpu sweep --frame warsaw.shp
"""

import argparse
import json
import sys
from typing import Dict, List, Optional


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--base-dir", default=".")
    p.add_argument("--frame", dest="frame_path",
                   help="AOI frame (.shp or .geojson)")
    p.add_argument("--model", dest="model_path", default="yolov7_itcvd")
    p.add_argument("--wms-url", dest="wms_url")
    p.add_argument("--wms-layer", dest="wms_layer")
    p.add_argument("--xyz-url", dest="xyz_url")
    p.add_argument("--use-xyz", dest="use_xyz", action="store_true",
                   default=None)
    p.add_argument("--zoom", type=int)
    p.add_argument("--tile-size-meters", dest="tile_size_meters", type=float)
    p.add_argument("--tile-overlap", dest="tile_overlap", type=float)
    p.add_argument("--confidence-threshold", dest="confidence_threshold",
                   type=float)
    p.add_argument("--batch-size", dest="batch_size", type=int)
    p.add_argument("--device-batch", dest="device_batch", type=int)
    p.add_argument("--checkpoint-interval", dest="checkpoint_interval",
                   type=int)
    p.add_argument("--duplicate-distance", dest="duplicate_distance",
                   type=float)
    p.add_argument("--num-workers", dest="num_workers", type=int)
    p.add_argument("--output-prefix", dest="output_prefix")
    p.add_argument("--event-log", dest="event_log")
    p.add_argument("--params", dest="params_path",
                   help="model parameter checkpoint (.npz)")
    p.add_argument("--tta", action="store_true", default=None,
                   help="lighting TTA variation stack (gpu_handler parity)")
    p.add_argument("--multiscale", default=None,
                   help="comma-separated inference scales, e.g. 0.85,1,1.15")
    p.add_argument("--heatmap-hex", dest="heatmap_hex_m", type=float,
                   help="emit hex-density heatmap with this hex size (m)")
    p.add_argument("--enhance-shadows", dest="enhance_shadows",
                   action="store_true", default=None)
    p.add_argument("--data-parallel", dest="data_parallel", nargs="?",
                   const=True, type=int, default=None, metavar="N",
                   help="shard the device batch over all (or N) chips")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="int8-PTQ the detector trunk (models/int8.py). "
                        "Without --quantize-calib it self-calibrates on "
                        "the scan's own first batches, parity-gated with "
                        "automatic bf16 fallback")
    p.add_argument("--quantize-calib", dest="quantize_calib", default=None,
                   help="optional calibration JSON from the `calibrate` "
                        "verb (skips self-calibration)")


def _overrides(args) -> Dict:
    skip = {"base_dir", "command", "force_restart", "interactive"}
    out = {k: v for k, v in vars(args).items()
           if v is not None and k not in skip}
    if isinstance(out.get("multiscale"), str):
        out["multiscale"] = [float(s) for s in out["multiscale"].split(",")]
    return out


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="aerial_image_recognition_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    pd = sub.add_parser("detect", help="run a city scan")
    _add_common(pd)
    pd.add_argument("--force-restart", action="store_true")
    pd.add_argument("--interactive", action="store_true")

    ps = sub.add_parser("sweep", help="resolution sweep "
                        "(test_configurations.py parity)")
    _add_common(ps)
    ps.add_argument("--tile-sizes", default="100,64,51.2,25,20",
                    help="comma-separated tile sizes in meters")

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.add_argument("--batch", type=int, default=128)

    sub.add_parser("doctor", help="environment diagnostic "
                   "(check_gpu.py parity)")

    pt = sub.add_parser("train", help="train a detector from COCO labels "
                        "(01_train_tokyo.ipynb workflow)")
    pt.add_argument("--coco", required=True, help="COCO instances json")
    pt.add_argument("--images", required=True, help="image directory")
    pt.add_argument("--model", default="yolov8_tokyo")
    pt.add_argument("--epochs", type=int, default=300)
    pt.add_argument("--imgsz", type=int, default=768)
    pt.add_argument("--batch", type=int, default=8)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--n-train", type=int, default=80)
    pt.add_argument("--params", default=None,
                    help="start from an existing .npz checkpoint instead "
                         "of random init — the notebook's fine-tune "
                         "workflow (load pretrained, freeze, train); "
                         "combine with import-weights for upstream blobs")
    pt.add_argument("--bn-mode", default="auto",
                    choices=["auto", "batch", "frozen"])
    pt.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine", "linear"])
    pt.add_argument("--warmup-epochs", type=float, default=0.0)
    pt.add_argument("--freeze", default=None,
                    help="comma list of upstream yaml layer indices and/or "
                         "module prefixes to freeze (notebook cell 14: "
                         "freeze=[0,1,2])")
    pt.add_argument("--copy-paste", dest="copy_paste", type=float,
                    default=0.0, help="copy-paste augmentation probability "
                    "(notebook: copy_paste=True)")
    pt.add_argument("--fliplr", type=float, default=0.0,
                    help="horizontal-flip probability (ultralytics "
                         "default 0.5)")
    pt.add_argument("--flipud", type=float, default=0.0)
    pt.add_argument("--close-mosaic", dest="close_mosaic", type=int,
                    default=0, help="disable mosaic/mixup/copy-paste for "
                    "the last N epochs (ultralytics default 10)")
    pt.add_argument("--scale", type=float, default=0.0,
                    help="random affine scale range (upstream default 0.5)")
    pt.add_argument("--translate", type=float, default=0.0,
                    help="random affine translate range (upstream 0.1)")
    pt.add_argument("--patience", type=int, default=0,
                    help="early stopping: epochs without fitness "
                         "improvement (notebook cell 14: patience=40); "
                         "0 disables")
    pt.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="EMA weight averaging, e.g. 0.9999 "
                    "(ultralytics recipe)")
    pt.add_argument("--out", required=True, help="output checkpoint (.npz)")

    pg = sub.add_parser("geotiff", help="sliding-window detection over a "
                        "GeoTIFF (02_analyze_images workflow)")
    pg.add_argument("path")
    pg.add_argument("--model", default="yolov8_tokyo")
    pg.add_argument("--params")
    pg.add_argument("--window", type=int, default=1200)
    pg.add_argument("--stride", type=int, default=600)
    pg.add_argument("--confidence", type=float, default=0.4)
    pg.add_argument("--out", help="output geojson")
    pg.add_argument("--quantize", choices=["int8"], default=None)
    pg.add_argument("--quantize-calib", dest="quantize_calib", default=None)

    pv = sub.add_parser("serve", help="HTTP detection service with dynamic "
                        "batching")
    pv.add_argument("--host", default="127.0.0.1")
    pv.add_argument("--port", type=int, default=8000)
    pv.add_argument("--model", dest="model_path", default="yolov7_itcvd")
    pv.add_argument("--params", dest="params_path")
    pv.add_argument("--batch", type=int, default=64)
    pv.add_argument("--confidence-threshold", type=float, default=0.3)
    pv.add_argument("--max-wait-ms", type=float, default=10.0)
    pv.add_argument("--data-parallel", dest="data_parallel", nargs="?",
                    const=True, type=int, default=None, metavar="N",
                    help="shard the serving batch over all (or N) chips")
    pv.add_argument("--quantize", choices=["int8"], default=None)
    pv.add_argument("--quantize-calib", dest="quantize_calib", default=None)
    pv.add_argument("--segment-params", dest="segment_params", default=None,
                    help="XUnet-256 checkpoint (.npz) — also serve "
                    "POST /segment building-segmentation requests")
    pv.add_argument("--segment-batch", dest="segment_batch", type=int,
                    default=16)

    pm = sub.add_parser("automask", help="automatic instance masks over a "
                        "GeoTIFF (SAM2 workflow parity)")
    pm.add_argument("path")
    pm.add_argument("--params")
    pm.add_argument("--window", type=int, default=256)
    pm.add_argument("--min-area", type=int, default=20)
    pm.add_argument("--stability", type=float, default=0.6)
    pm.add_argument("--quantize", choices=["int8"], default=None,
                    help="int8-PTQ the XUnet trunk (self-calibrates on "
                         "the raster's own windows)")
    pm.add_argument("--stride", type=int, default=None,
                    help="window stride; < window overlap-averages the "
                         "stitched probabilities (seam mitigation)")
    pm.add_argument("--out-mask")
    pm.add_argument("--out-polygons")

    pp = sub.add_parser("predict", help="detect on image files of any "
                        "size (the notebook's cells 27-29 spot-check; "
                        "boxes in original pixels, optional annotated "
                        "copies)")
    pp.add_argument("images", nargs="+", help="image files")
    pp.add_argument("--model", default="yolov7_itcvd")
    pp.add_argument("--params", default=None)
    pp.add_argument("--confidence", type=float, default=0.25)
    pp.add_argument("--imgsz", type=int, default=None,
                    help="inference resolution (default: the model's "
                         "registry input size)")
    pp.add_argument("--annotate", metavar="DIR", default=None,
                    help="write box-annotated copies into this directory")

    pl = sub.add_parser("val", help="evaluate a checkpoint's mAP on a "
                        "COCO-labeled set (notebook cell 22)")
    pl.add_argument("--coco", required=True)
    pl.add_argument("--images", required=True)
    pl.add_argument("--model", default="yolov8_tokyo")
    pl.add_argument("--params", default=None)
    pl.add_argument("--imgsz", type=int, default=640)
    pl.add_argument("--batch", type=int, default=8)
    pl.add_argument("--confidence", type=float, default=0.25)

    pe = sub.add_parser("export", help="export a trained checkpoint as a "
                        "reference-format .onnx initializer blob (torch "
                        "state-dict names, deploy-fused IDetect)")
    pe.add_argument("params", help="framework .npz checkpoint")
    pe.add_argument("out", help="output .onnx path")
    pe.add_argument("--model", default="yolov7_itcvd")

    pi = sub.add_parser("import-weights", help="turnkey weight drop: a "
                        "reference .onnx blob (torch state-dict initializer "
                        "names) or ultralytics .pt checkpoint → framework "
                        ".npz checkpoint, shape-validated against the "
                        "chosen registry model")
    pi.add_argument("onnx", help="reference blob: .onnx (e.g. "
                    "car_aerial_detection_yolo7_ITCVD_deepness.onnx) or "
                    ".pt/.pth (e.g. yolov8_tokyo_checkpoint.pt — no "
                    "ultralytics install needed)")
    pi.add_argument("--model", default="yolov7_itcvd",
                    help="registry model the blob belongs to "
                         "(yolov7_itcvd, yolov7_base, yolov8_tokyo, "
                         "yolov8n..x)")
    pi.add_argument("--out", required=True, help="output .npz checkpoint")

    pq = sub.add_parser("calibrate", help="record int8 activation scales "
                        "from representative imagery (a GeoTIFF) — the "
                        "TensorRT-calibration-cache analogue; feed the "
                        "result to detect/serve via extra.quantize_calib")
    pq.add_argument("path", help="representative GeoTIFF")
    pq.add_argument("--model", default="yolov7_itcvd")
    pq.add_argument("--params")
    pq.add_argument("--window", type=int, default=640)
    pq.add_argument("--max-windows", type=int, default=64)
    pq.add_argument("--model-size", type=int, default=None,
                    help="calibration resolution (defaults to --window — "
                         "activation scales are resolution-dependent, so "
                         "match the deployment model_size)")
    pq.add_argument("--out", required=True, help="output calibration JSON")

    args = parser.parse_args(argv)

    if args.command == "calibrate":
        import numpy as np
        import jax.numpy as jnp
        from aerial_image_recognition_tpu.gio.geotiff import read_geotiff
        from aerial_image_recognition_tpu.models.int8 import (
            calibrate_absmax, save_absmax)
        from aerial_image_recognition_tpu.models.registry import create_model
        from aerial_image_recognition_tpu.pipeline.rasters import (
            _extract, iter_windows)
        bundle = create_model(args.model, dtype=jnp.float32,
                              params_path=args.params)
        gt = read_geotiff(args.path)
        h, w = gt.data.shape[:2]
        corners = list(iter_windows(h, w, args.window, args.window))
        corners = corners[:args.max_windows]
        # chunked batches (absmax is a running max) — one capture-all
        # forward over 64 full-res windows would hold every intermediate
        # activation at once
        batches = [np.stack([_extract(gt.data, r, c, args.window)
                             for r, c in corners[i:i + 8]])
                   for i in range(0, len(corners), 8)]
        absmax = calibrate_absmax(bundle, batches,
                                  model_size=args.model_size or args.window)
        save_absmax(args.out, absmax)
        print(json.dumps({"out": args.out, "model": args.model,
                          "windows": len(corners),
                          "records": len(absmax)}))
        return 0

    if args.command == "import-weights":
        import jax.numpy as jnp
        from aerial_image_recognition_tpu.models.import_torch import (
            validate_variable_shapes, variables_from_torch_state)
        from aerial_image_recognition_tpu.models.onnx_lite import (
            load_onnx_initializers)
        from aerial_image_recognition_tpu.models.registry import (
            create_model, save_params)
        if args.onnx.endswith((".pt", ".pth")):
            from aerial_image_recognition_tpu.models.torch_pt import (
                load_checkpoint_state)
            sd = load_checkpoint_state(args.onnx)
        else:
            sd = load_onnx_initializers(args.onnx)
        if not sd:
            raise SystemExit(f"no initializer tensors found in {args.onnx!r}")
        variables = variables_from_torch_state(sd, args.model)
        ref = create_model(args.model, dtype=jnp.float32)
        validate_variable_shapes(variables, ref.params)
        save_params(variables, args.out)
        print(json.dumps({"out": args.out, "model": args.model,
                          "initializers": len(sd)}))
        return 0

    if args.command == "export":
        import jax
        import jax.numpy as jnp
        from aerial_image_recognition_tpu.models.import_torch import (
            torch_state_from_variables)
        from aerial_image_recognition_tpu.models.onnx_lite import (
            write_minimal_onnx)
        from aerial_image_recognition_tpu.models.registry import (
            create_model)
        bundle = create_model(args.model, dtype=jnp.float32,
                              params_path=args.params)
        if bundle.spec.family not in ("yolov7", "yolov8"):
            raise SystemExit("export supports the detection families "
                             "(yolov7 tiny/base, yolov8 n..x/tokyo); the "
                             "reference's XUnet blob has no upstream torch "
                             "naming to export to")
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), bundle.params)
        tensors = torch_state_from_variables(params, bundle.spec.name)
        write_minimal_onnx(args.out, tensors)
        print(json.dumps({"out": args.out, "tensors": len(tensors)}))
        return 0

    if args.command == "doctor":
        from aerial_image_recognition_tpu.runtime.doctor import main as doc
        return doc()

    if args.command == "detect":
        from aerial_image_recognition_tpu.pipeline.detector import CarDetector
        det = CarDetector(args.base_dir, _overrides(args))
        out = det.detect(interactive=args.interactive,
                         force_restart=args.force_restart)
        print(json.dumps(out, default=str))
        return 0

    if args.command == "sweep":
        from aerial_image_recognition_tpu.pipeline.sweep import run_sweep
        sizes = [float(s) for s in args.tile_sizes.split(",")]
        out = run_sweep(args.base_dir, _overrides(args), sizes)
        print(json.dumps(out, indent=2, default=str))
        return 0

    if args.command == "bench":
        import os
        os.environ["BENCH_BATCH"] = str(args.batch)
        import bench
        return bench.main() or 0

    if args.command == "train":
        import dataclasses
        import os

        import jax.numpy as jnp
        from aerial_image_recognition_tpu.models.registry import (
            create_model, save_params)
        from aerial_image_recognition_tpu.pipeline.data import (
            TOKYO_CLASS_REMAP, DetectionLoader, LoaderConfig, coco_to_yolo,
            train_val_split)
        from aerial_image_recognition_tpu.pipeline.train import fit

        remap = TOKYO_CLASS_REMAP if "tokyo" in args.model else None
        samples = coco_to_yolo(args.coco, class_remap=remap)
        samples = [dataclasses.replace(
            s, image_path=os.path.join(args.images,
                                       os.path.basename(s.image_path)))
            for s in samples]
        train_s, val_s = train_val_split(samples, args.n_train)
        lcfg = LoaderConfig(image_size=args.imgsz, batch_size=args.batch,
                            copy_paste=args.copy_paste,
                            fliplr=args.fliplr, flipud=args.flipud,
                            close_mosaic=args.close_mosaic,
                            scale=args.scale, translate=args.translate)
        vcfg = LoaderConfig(image_size=args.imgsz, batch_size=args.batch,
                            mosaic=0.0, mixup=0.0, hsv=0.0)
        freeze = ([s.strip() for s in args.freeze.split(",") if s.strip()]
                  if args.freeze else None)
        bundle = create_model(args.model, dtype=jnp.float32,
                              params_path=args.params)
        if args.params:
            # checkpoints may carry bf16 inference weights; the optimizer
            # needs f32
            import jax
            bundle = dataclasses.replace(
                bundle, params=jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, jnp.float32), bundle.params))
        state = fit(bundle, DetectionLoader(train_s, lcfg),
                    epochs=args.epochs, lr=args.lr,
                    eval_loader=DetectionLoader(val_s, vcfg, train=False),
                    eval_every=max(1, args.epochs // 10),
                    bn_mode=args.bn_mode, lr_schedule=args.lr_schedule,
                    warmup_epochs=args.warmup_epochs, ema_decay=args.ema,
                    freeze=freeze, patience=args.patience or None)
        history = state.pop("history")
        # the weights to deploy: best-fitness epoch when eval tracked one
        # (ultralytics best.pt), else the final (EMA when enabled) weights
        best = state.get("best")
        if best is not None:
            save_params({"params": best["params"],
                         "batch_stats": best["batch_stats"]}, args.out)
        else:
            save_params({"params": state.get("ema_params", state["params"]),
                         "batch_stats": state["batch_stats"]}, args.out)
        out = {"checkpoint": args.out, "final": history[-1]}
        if best is not None:
            out["best"] = {"epoch": best["epoch"],
                           "fitness": best["fitness"]}
        print(json.dumps(out))
        return 0

    if args.command == "predict":
        import os

        from aerial_image_recognition_tpu.pipeline.predict import (
            draw_predictions, predict_images)
        preds = predict_images(args.images, model=args.model,
                               params=args.params,
                               confidence=args.confidence,
                               imgsz=args.imgsz)
        if args.annotate:
            os.makedirs(args.annotate, exist_ok=True)
            for p in preds:
                draw_predictions(p, os.path.join(
                    args.annotate, os.path.basename(p.path)))
        print(json.dumps({"images": [p.to_json() for p in preds]}))
        return 0

    if args.command == "val":
        import dataclasses
        import os

        import jax.numpy as jnp
        from aerial_image_recognition_tpu.models.registry import create_model
        from aerial_image_recognition_tpu.pipeline.data import (
            TOKYO_CLASS_REMAP, DetectionLoader, LoaderConfig, coco_to_yolo)
        from aerial_image_recognition_tpu.pipeline.train import evaluate

        remap = TOKYO_CLASS_REMAP if "tokyo" in args.model else None
        samples = coco_to_yolo(args.coco, class_remap=remap)
        samples = [dataclasses.replace(
            s, image_path=os.path.join(args.images,
                                       os.path.basename(s.image_path)))
            for s in samples]
        loader = DetectionLoader(
            samples, LoaderConfig(image_size=args.imgsz,
                                  batch_size=args.batch, mosaic=0.0,
                                  mixup=0.0, hsv=0.0), train=False)
        bundle = create_model(args.model, dtype=jnp.float32,
                              params_path=args.params)
        metrics = evaluate(bundle, bundle.params, loader,
                           conf_threshold=args.confidence)
        print(json.dumps({"model": args.model, "params": args.params,
                          "n_images": len(samples), **metrics}))
        return 0

    if args.command == "geotiff":
        from aerial_image_recognition_tpu.pipeline.rasters import detect_geotiff
        recs = detect_geotiff(
            args.path, window=args.window, stride=args.stride,
            confidence=args.confidence, model=args.model,
            params=args.params, quantize=args.quantize,
            quantize_calib=args.quantize_calib, output_geojson=args.out)
        print(json.dumps({"detections": len(recs), "output": args.out}))
        return 0

    if args.command == "serve":
        import time as _time

        from aerial_image_recognition_tpu.pipeline.serve import DetectionServer
        srv = DetectionServer(
            {"model_path": args.model_path, "params_path": args.params_path,
             "device_batch": args.batch,
             "confidence_threshold": args.confidence_threshold,
             "data_parallel": args.data_parallel,
             "quantize": args.quantize,
             "quantize_calib": args.quantize_calib},
            host=args.host, port=args.port,
            max_wait_ms=args.max_wait_ms,
            segment_params=args.segment_params,
            segment_batch=args.segment_batch).start()
        print(json.dumps({"serving": srv.url,
                          "model": srv.step.bundle.spec.name}))
        try:
            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0

    if args.command == "automask":
        from aerial_image_recognition_tpu.pipeline.automask import (
            automask_geotiff)
        inst = automask_geotiff(
            args.path, window=args.window, params=args.params,
            quantize=args.quantize, stride=args.stride,
            min_area_px=args.min_area, stability_min=args.stability,
            output_mask=args.out_mask, output_polygons=args.out_polygons)
        print(json.dumps({"instances": len(inst)}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
