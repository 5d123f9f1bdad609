"""Detection + segmentation serving: HTTP endpoints with dynamic batching.

The reference has no serving story — every pipeline is a batch job. This
module turns the fused compute steps into a production service: concurrent
HTTP requests are coalesced into fixed-shape device batches (padded, so one
compiled program serves any load level), run through the jitted step, and
split back per request. Batching is the TPU-native serving move: the chip
is efficient at batch 64–128 and per-request dispatch would waste it.

Two model planes share the server, each with its own queue/batch/readback
threads and its own compiled program:

  * detect — the YOLO fused step (always on).
  * segment — the XUnet-256 building-segmentation head (opt-in via
    ``segment_params``). The reference ships this capability as the
    ``ramp_XUnet_256.onnx`` artifact (SURVEY §1 model artifacts; never
    wired to any code in the snapshot) — here it gets a first-class
    serving surface alongside detection.

API:
  POST /detect?west=&south=&east=&north=   body = JPEG/PNG bytes
      → {"detections": [{"lon","lat","confidence","class"}], "count": N}
  POST /segment?threshold=0.5&polygons=0   body = JPEG/PNG bytes
      → {"shape": [H,W], "mean_prob": p, "coverage": f,
         "mask_png": base64 PNG (mode L, 0/255), and with polygons=1
         "polygons": [[[x,y],...], ...] boundary rings in pixel coords}
      The mask is returned at the REQUEST image's resolution: arbitrary
      input sizes are resized to the model size on ingest (the reference's
      resize-anything contract, _script/gpu_handler.py:74-76) and the
      probability map is resized back before thresholding — the same
      model-res→window-res discipline as rasters._place_probs.
  GET  /healthz → {"ok": true, "model": ..., "batch": ..., "segment": ...}
  GET  /stats   → request/batch counters and timings (top-level keys are
                  all-plane totals; ``planes.<name>`` holds each plane's
                  own batches / batch_fill_sum / compute_s)
"""

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from aerial_image_recognition_tpu.post.georef import detections_to_records
from aerial_image_recognition_tpu.runtime.config import DetectorConfig


@dataclass
class _Pending:
    image: np.ndarray
    meta: dict                            # per-plane request context
    deadline: float = 0.0                 # perf_counter after which the
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[object] = None       # waiter has already given up
    error: Optional[str] = None


class _Plane:
    """One model's dynamic-batching plane.

    A request queue, a batch thread that assembles fixed-shape padded
    batches and DISPATCHES them (jit dispatch is async, so the step call
    returns device futures), and a readback thread that materializes
    results one batch behind dispatch — batch N+1 assembles and dispatches
    during batch N's readback (run_pipeline's overlap pattern, applied to
    serving). ``dispatch(group)`` returns an opaque payload of device
    futures; ``finish(payload, group)`` materializes it and sets
    ``p.result`` for every request in the group.
    """

    def __init__(self, server: "DetectionServer", name: str, batch: int,
                 input_size: int,
                 dispatch: Callable[[List[_Pending]], object],
                 finish: Callable[[object, List[_Pending]], None]):
        self.server = server
        self.name = name
        self.batch = batch
        self.input_size = input_size
        self.dispatch = dispatch
        self.finish = finish
        # per-plane batching counters — the top-level stats keys aggregate
        # across planes, which conflates detect's and segment's fill/latency
        self.counters = {"batches": 0, "batch_fill_sum": 0, "compute_s": 0.0}
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        # dispatched-but-unread batches: depth 2 bounds in-flight device
        # memory while letting the next batch assemble and dispatch
        self.inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self.batch_thread = threading.Thread(
            target=self._batch_loop, daemon=True,
            name=f"serve-batch-{name}")
        self.readback_thread = threading.Thread(
            target=self._readback_loop, daemon=True,
            name=f"serve-readback-{name}")

    def start(self):
        self.batch_thread.start()
        self.readback_thread.start()

    def join(self, timeout: float):
        if self.batch_thread.is_alive():
            self.batch_thread.join(timeout=timeout)
        if self.readback_thread.is_alive():
            self.readback_thread.join(timeout=timeout)

    def drain(self, error: str):
        """Release queued waiters immediately (stop() path)."""
        try:
            while True:
                p = self.q.get_nowait()
                p.error = error
                p.event.set()
        except queue.Empty:
            pass

    def _broadcast_error(self, group: List[_Pending], err: str):
        with self.server._stats_lock:
            self.server.stats["errors"] += len(group)
        for p in group:
            p.error = err
            p.event.set()

    def _batch_loop(self):
        server = self.server
        while not server._stop.is_set():
            try:
                first = self.q.get(timeout=0.2)
            except queue.Empty:
                continue
            group = [first]
            deadline = time.perf_counter() + server.max_wait_s
            while len(group) < self.batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    group.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break
            # don't burn device time on waiters that already gave up
            group = [p for p in group
                     if p.deadline == 0.0
                     or time.perf_counter() < p.deadline]
            if not group:
                continue
            t0 = time.perf_counter()
            try:
                payload = self.dispatch(group)
            except Exception as e:                  # surface to all waiters
                self._broadcast_error(group, repr(e))
                continue
            self.inflight.put((group, payload, t0))

    def _readback_loop(self):
        """Device→host readback + per-request reply, one batch behind
        dispatch. A compute error raised at readback (async dispatch
        surfaces failures on materialization) is broadcast to the batch's
        waiters."""
        server = self.server
        while True:
            try:
                item = self.inflight.get(timeout=0.2)
            except queue.Empty:
                # exit only once no more batches can arrive: stop
                # requested AND the dispatching thread is gone AND the
                # queue stayed empty — guarantees every dispatched batch
                # is read back, never dropped
                if server._stop.is_set() and not self.batch_thread.is_alive():
                    # the batch thread may have dispatched a final batch
                    # between our timeout and its exit — drain once more
                    # now that no producer exists before leaving
                    try:
                        item = self.inflight.get_nowait()
                    except queue.Empty:
                        return
                else:
                    continue
            group, payload, t0 = item
            try:
                self.finish(payload, group)
                dt = time.perf_counter() - t0
            except Exception as e:
                self._broadcast_error(group, repr(e))
                continue
            for p in group:
                p.event.set()
            with server._stats_lock:
                server.stats["batches"] += 1
                server.stats["batch_fill_sum"] += len(group)
                server.stats["compute_s"] += dt
                self.counters["batches"] += 1
                self.counters["batch_fill_sum"] += len(group)
                self.counters["compute_s"] += dt


class DetectionServer:
    def __init__(self, config: Optional[Dict] = None, *,
                 host: str = "127.0.0.1", port: int = 0,
                 max_wait_ms: float = 10.0, detect_step=None,
                 segment_fn=None, segment_params=None,
                 segment_batch: int = 16, segment_size: int = 256):
        self.config = DetectorConfig().merged(config or {})
        if detect_step is None:
            from aerial_image_recognition_tpu.parallel.mesh import (
                mesh_from_flag)
            from aerial_image_recognition_tpu.pipeline.inference import (
                build_detect_step)
            detect_step = build_detect_step(
                self.config, batch=self.config.device_batch,
                mesh=mesh_from_flag(self.config.extra.get("data_parallel")))
        self.step = detect_step
        self.max_wait_s = max_wait_ms / 1000.0
        self._stop = threading.Event()
        self.stats = {"requests": 0, "segment_requests": 0, "batches": 0,
                      "detections": 0, "errors": 0, "timeouts": 0,
                      "batch_fill_sum": 0, "resized": 0, "compute_s": 0.0}
        self._stats_lock = threading.Lock()

        self._planes: Dict[str, _Plane] = {
            "detect": _Plane(self, "detect", detect_step.batch,
                             detect_step.input_size,
                             self._detect_dispatch, self._detect_finish)}

        self._seg_fn = None
        self._seg_params = None
        if segment_fn is not None or segment_params is not None:
            if segment_fn is None:
                import jax
                import jax.numpy as jnp

                from aerial_image_recognition_tpu.models.registry import (
                    create_model)
                from aerial_image_recognition_tpu.pipeline.inference import (
                    make_segment_fn)
                bundle = create_model(
                    "xunet_256", dtype=jnp.bfloat16,
                    params_path=segment_params
                    if isinstance(segment_params, str) else None)
                if not isinstance(segment_params, str):
                    bundle.params = segment_params
                segment_fn = jax.jit(make_segment_fn(
                    bundle, DetectorConfig(model_family="xunet")))
                segment_params = bundle.params
                segment_size = bundle.spec.input_size
            self._seg_fn = segment_fn
            self._seg_params = segment_params
            self._planes["segment"] = _Plane(
                self, "segment", segment_batch, segment_size,
                self._segment_dispatch, self._segment_finish)

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: Dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = urlparse(self.path).path
                if path == "/healthz":
                    self._reply(200, {
                        "ok": True, "model": server.step.bundle.spec.name,
                        "batch": server.step.batch,
                        "input_size": server.step.input_size,
                        "segment": "segment" in server._planes})
                elif path == "/stats":
                    with server._stats_lock:
                        out = dict(server.stats)
                        out["planes"] = {n: dict(pl.counters)
                                         for n, pl in server._planes.items()}
                    # turnkey int8 self-quantization state (a
                    # SelfQuantizingStep behind `serve --quantize int8`
                    # with no calib file): state + parity are the
                    # operator's only window into whether the hot-swap
                    # happened and what validated it
                    qs = getattr(server.step, "quantize_state", None)
                    if qs is not None:
                        out["quantize_state"] = qs
                        out["quantize_parity"] = server.step.parity
                        if server.step.fallback_reason:
                            out["quantize_fallback_reason"] = \
                                server.step.fallback_reason
                    self._reply(200, out)
                else:
                    self._reply(404, {"error": "unknown path"})

            def _read_image(self, plane: _Plane):
                """Read + decode the request body, resize to the plane's
                input size (reference behavior: resize whatever arrives to
                the model size, gpu_handler.py:74-76 / simple_detector.py:
                655-659). Returns (img, orig_hw) or None after replying."""
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n) if n else b""
                from aerial_image_recognition_tpu.gio.decode import decode_rgb
                img = decode_rgb(body)
                if img is None:
                    with server._stats_lock:
                        server.stats["errors"] += 1
                    self._reply(400, {"error": "undecodable image"})
                    return None
                orig_hw = img.shape[:2]
                s = plane.input_size
                if img.shape[0] != s or img.shape[1] != s:
                    from PIL import Image
                    img = np.asarray(Image.fromarray(img).resize(
                        (s, s), Image.BILINEAR))
                    with server._stats_lock:
                        server.stats["resized"] += 1
                return img, orig_hw

            def _enqueue_and_wait(self, plane: _Plane,
                                  p: _Pending) -> bool:
                """Queue p on the plane and block for its answer. Returns
                True if p.result is valid; replies 503 itself otherwise."""
                plane.q.put(p)
                # TOCTOU with stop(): _stop may have been set (and the
                # queue drained) between the handler's check and this put —
                # answer such a request immediately instead of letting it
                # sit the full wait in a queue no loop services. Benign
                # race with a batch loop that already picked p up: the
                # event-guard keeps the first answer.
                if server._stop.is_set() and not p.event.is_set():
                    p.error = p.error or "server stopping"
                    p.event.set()
                p.event.wait(timeout=60.0)
                if p.result is None:
                    with server._stats_lock:
                        server.stats["errors"] += 1
                        server.stats["timeouts"] += p.error is None
                    self._reply(503, {"error": p.error or "timed out"})
                    return False
                return True

            def do_POST(self):
                path = urlparse(self.path).path
                if path not in ("/detect", "/segment"):
                    self._reply(404, {"error": "unknown path"})
                    return
                if path == "/segment" and "segment" not in server._planes:
                    self._reply(404, {"error": "segmentation not enabled "
                                      "(start with segment_params=...)"})
                    return
                if server._stop.is_set():
                    # stop() is draining; without this, a request enqueued
                    # after the one-shot drain would sit its full 60 s wait
                    self._reply(503, {"error": "server stopping"})
                    return
                q = parse_qs(urlparse(self.path).query)
                if path == "/detect":
                    self._post_detect(q)
                else:
                    self._post_segment(q)

            def _post_detect(self, q):
                try:
                    bounds = np.asarray(
                        [float(q[k][0]) for k in
                         ("west", "south", "east", "north")], np.float32)
                except (KeyError, ValueError):
                    self._reply(400, {"error": "west/south/east/north "
                                      "query params required"})
                    return
                plane = server._planes["detect"]
                got = self._read_image(plane)
                if got is None:
                    return
                img, _ = got
                p = _Pending(image=img, meta={"bounds": bounds},
                             deadline=time.perf_counter() + 60.0)
                if not self._enqueue_and_wait(plane, p):
                    return
                with server._stats_lock:
                    server.stats["requests"] += 1
                    server.stats["detections"] += len(p.result)
                self._reply(200, {"detections": p.result,
                                  "count": len(p.result)})

            def _post_segment(self, q):
                try:
                    threshold = float(q.get("threshold", ["0.5"])[0])
                    polygons = q.get("polygons", ["0"])[0] not in (
                        "0", "", "false")
                except ValueError:
                    self._reply(400, {"error": "bad threshold"})
                    return
                plane = server._planes["segment"]
                got = self._read_image(plane)
                if got is None:
                    return
                img, orig_hw = got
                p = _Pending(image=img,
                             meta={"orig_hw": orig_hw,
                                   "threshold": threshold,
                                   "polygons": polygons},
                             deadline=time.perf_counter() + 60.0)
                if not self._enqueue_and_wait(plane, p):
                    return
                with server._stats_lock:
                    server.stats["segment_requests"] += 1
                self._reply(200, p.result)

        class _Server(ThreadingHTTPServer):
            # socketserver's default listen backlog is 5; a burst of
            # concurrent clients (the reference's 25-32 fetch workers all
            # turning around at once) overflows the accept queue and the
            # kernel RSTs the excess connections
            request_queue_size = 128

        self._httpd = _Server((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="serve-http")

    # ----------------------------------------------------- plane callbacks

    def _detect_dispatch(self, group: List[_Pending]):
        step = self.step
        b, s = step.batch, step.input_size
        imgs = np.zeros((b, s, s, 3), np.uint8)
        bnds = np.full((b, 4), (0, 0, 1e-6, 1e-6), np.float32)
        for i, p in enumerate(group):
            imgs[i] = p.image
            bnds[i] = p.meta["bounds"]
        det, _lon, _lat = step(imgs, bnds)
        return det, bnds

    def _detect_finish(self, payload, group: List[_Pending]):
        det, bnds = payload
        step = self.step
        recs = detections_to_records(
            det, bnds, model_size=step.model_size,
            class_names=step.bundle.spec.class_names)
        by_tile: Dict[int, List[dict]] = {}
        for r in recs:
            by_tile.setdefault(r.pop("tile_index"), []).append(r)
        for i, p in enumerate(group):
            p.result = by_tile.get(i, [])

    def _segment_dispatch(self, group: List[_Pending]):
        plane = self._planes["segment"]
        b, s = plane.batch, plane.input_size
        imgs = np.zeros((b, s, s, 3), np.uint8)
        for i, p in enumerate(group):
            imgs[i] = p.image
        return self._seg_fn(self._seg_params, imgs)

    def _segment_finish(self, probs, group: List[_Pending]):
        arr = np.asarray(probs, np.float32)
        if arr.ndim == 4:
            arr = arr[..., 0]
        from PIL import Image
        for i, p in enumerate(group):
            prob = arr[i]
            h0, w0 = p.meta["orig_hw"]
            if (h0, w0) != prob.shape:
                # model-resolution probabilities back to the request's
                # resolution before thresholding (rasters._place_probs
                # discipline — resizing the binary mask instead would
                # alias the boundary)
                prob = np.asarray(Image.fromarray(prob, mode="F").resize(
                    (w0, h0), Image.BILINEAR), np.float32)
            mask = prob >= p.meta["threshold"]
            buf = io.BytesIO()
            Image.fromarray((mask * np.uint8(255))).save(buf, "PNG")
            payload = {
                "shape": [int(h0), int(w0)],
                "mean_prob": float(prob.mean()),
                "coverage": float(mask.mean()),
                "mask_png": base64.b64encode(buf.getvalue()).decode(),
            }
            if p.meta["polygons"]:
                from aerial_image_recognition_tpu.pipeline.rasters import (
                    mask_to_polygons)
                payload["polygons"] = [ring.tolist()
                                       for ring in mask_to_polygons(mask)]
            p.result = payload

    # ------------------------------------------------------------ lifecycle

    # backward-compat aliases for the detect plane's internals (tests pin
    # thread shutdown on these names)
    @property
    def _q(self):
        return self._planes["detect"].q

    @property
    def _inflight(self):
        return self._planes["detect"].inflight

    @property
    def _batch_thread(self):
        return self._planes["detect"].batch_thread

    @property
    def _readback_thread(self):
        return self._planes["detect"].readback_thread

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self, warmup: bool = True):
        if warmup:
            # trigger XLA compilation before accepting traffic — the
            # first 640-px compile takes minutes through this image's
            # remote-compile tunnel, far beyond any request timeout
            b, sz = self.step.batch, self.step.input_size
            imgs = np.zeros((b, sz, sz, 3), np.uint8)
            bnds = np.full((b, 4), (0, 0, 1e-6, 1e-6), np.float32)
            det, lon, lat = self.step(imgs, bnds)
            float(np.asarray(lon).sum())
            if self._seg_fn is not None:
                plane = self._planes["segment"]
                simgs = np.zeros(
                    (plane.batch, plane.input_size, plane.input_size, 3),
                    np.uint8)
                float(np.asarray(
                    self._seg_fn(self._seg_params, simgs)).sum())
        self._serve_thread.start()
        for plane in self._planes.values():
            plane.start()
        return self

    def stop(self):
        self._stop.set()
        # release queued waiters immediately instead of letting their
        # 60 s waits expire one by one (the handler 503s new requests
        # once _stop is set, and self-answers any put that raced this
        # drain, so no request is left in an unserviced queue)
        for plane in self._planes.values():
            plane.drain("server stopping")
        # in-flight batches still complete: each readback loop keeps
        # draining its inflight queue until its batch thread is dead AND
        # the queue is empty (no sentinel — a sentinel could race a batch
        # the still-running batch thread dispatches after it, orphaning
        # its waiters)
        for plane in self._planes.values():
            plane.join(timeout=90.0)
        self._httpd.shutdown()
        self._httpd.server_close()
