"""Host-side ingest plane: fetch → batch → prefetch → device.

The reference couples fetching and inference serially per batch
(_script/detector.py:117-155: fetch_batch blocks, then process_batch
blocks). Here the stages are pipelined: fetcher threads produce TileImages,
an assembler packs fixed-shape uint8 batches (padding the tail; XLA needs
static shapes), a bounded queue decouples stages, and the executor uploads
batch N+1 (async device_put) while batch N computes — so fetch, H2D DMA,
and TPU compute overlap. The pipeline tolerates fetch:infer throughput
ratios far below 1 by simply backpressuring on the queue
(SURVEY.md §7 hard part #3).
"""

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from aerial_image_recognition_tpu.fetch.xyz import TileImage


@dataclass
class TileBatch:
    indices: np.ndarray      # [B] int64 global tile indices (−1 = padding)
    images: np.ndarray       # [B, S, S, 3] uint8
    bounds: np.ndarray       # [B, 4] float32 (west, south, east, north)
    n_valid: int
    failed_indices: List[int] = field(default_factory=list)


def assemble_batches(tiles: Iterable[Tuple[int, Optional[TileImage]]],
                     batch_size: int, src_size: int,
                     layout: str = "hwc") -> Iterator[TileBatch]:
    """Pack (index, TileImage) streams into fixed-shape batches.

    Failed tiles (None) are recorded, not batched. The final partial batch
    is zero-padded with index −1 so every device step sees identical shapes
    (one compiled program for the whole scan).

    layout "s2d2" packs each tile in space_to_depth^2 order
    [S/4, S/4, 48] for the quad-stem lowering (DetectStep.input_layout) —
    a strided host copy in place of the straight memcpy; identical bytes
    cross PCIe and no device-side relayout is needed (ops/quadstem.py).
    """
    if layout == "s2d2":
        from aerial_image_recognition_tpu.ops.quadstem import host_s2d2_into
        imgs = np.zeros((batch_size, src_size // 4, src_size // 4, 48),
                        dtype=np.uint8)
    else:
        imgs = np.zeros((batch_size, src_size, src_size, 3), dtype=np.uint8)
    bnds = np.zeros((batch_size, 4), dtype=np.float32)
    idxs = np.full((batch_size,), -1, dtype=np.int64)
    fill = 0
    failed: List[int] = []
    for index, tile in tiles:
        if tile is None:
            failed.append(index)
            continue
        px = tile.pixels
        if px.shape[0] != src_size or px.shape[1] != src_size:
            # tolerate ragged tiles the way the reference did — resize to
            # the expected window (gpu_handler.py:74-76 resized whatever
            # arrived). Misconfigured fetchers emitting a consistent wrong
            # size still surface immediately in coverage/throughput, but a
            # stray odd-sized edge tile no longer kills a city scan.
            from PIL import Image
            px = np.asarray(Image.fromarray(px).resize(
                (src_size, src_size), Image.BILINEAR))
        if layout == "s2d2":
            host_s2d2_into(px, imgs[fill])   # one strided copy, no temp
        else:
            imgs[fill] = px
        bnds[fill] = tile.bounds
        idxs[fill] = index
        fill += 1
        if fill == batch_size:
            yield TileBatch(idxs.copy(), imgs.copy(), bnds.copy(),
                            fill, failed)
            fill, failed = 0, []
            idxs[:] = -1
    if fill or failed:
        imgs[fill:] = 0
        bnds[fill:] = (0, 0, 1e-6, 1e-6)   # degenerate but finite bounds
        yield TileBatch(idxs.copy(), imgs.copy(), bnds.copy(), fill, failed)


class ThreadedPrefetcher:
    """Runs a batch generator on a daemon thread into a bounded queue."""

    _SENTINEL = object()

    def __init__(self, gen: Iterator[TileBatch], depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def run():
            try:
                for item in gen:
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:     # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ingest-prefetch")
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self, join_timeout: float = 5.0):
        """Stop the producer thread. Call BEFORE tearing down the fetcher
        underneath the generator, or the thread keeps fetching into a dead
        pool (noisy shutdown, wasted requests at city scale). Best-effort
        join: the thread is a daemon, so a fetch blocked in the network
        can't wedge interpreter exit."""
        self._stop.set()
        if join_timeout:
            self._thread.join(timeout=join_timeout)


def run_pipeline(batches: Iterable[TileBatch],
                 step: Callable[[np.ndarray, np.ndarray], tuple],
                 on_result: Callable[[TileBatch, tuple], None],
                 prefetch_device: bool = True,
                 depth: int = 1) -> dict:
    """Drive batches through a device step with H2D/compute overlap.

    ``step(images_u8, bounds)`` must be an async-dispatching jitted call;
    ``on_result`` receives (batch, device_outputs) and is where host
    readback (and therefore synchronization) happens — by the time result N
    is being read back, batch N+1's upload and compute are already in
    flight.

    depth: how many dispatched-but-unread batches to keep in flight. 1 is
    the classic double-buffer; raise it when per-call latency dominates
    (e.g. remote-device links), at the cost of depth× batch HBM.
    """
    import jax

    stats = {"batches": 0, "tiles": 0, "failed": 0,
             "h2d_s": 0.0, "compute_s": 0.0}
    it = iter(batches)
    pending: List[Tuple[TileBatch, tuple]] = []
    # data-parallel steps advertise per-input NamedShardings so the upload
    # lands pre-sharded on every chip (one H2D slice per device, no
    # reshard-on-dispatch)
    shardings = getattr(step, "input_shardings", None)

    def upload(b: TileBatch):
        if not prefetch_device:
            return (b.images, b.bounds)
        t0 = time.perf_counter()
        if shardings is not None:
            d = (jax.device_put(b.images, shardings[0]),
                 jax.device_put(b.bounds, shardings[1]))
        else:
            d = (jax.device_put(b.images), jax.device_put(b.bounds))
        stats["h2d_s"] += time.perf_counter() - t0
        return d

    def drain(b: TileBatch, o: tuple):
        on_result(b, o)                    # host readback syncs here
        stats["batches"] += 1
        stats["tiles"] += b.n_valid
        stats["failed"] += len(b.failed_indices)

    nxt = next(it, None)
    d_nxt = upload(nxt) if nxt is not None else None
    while nxt is not None:
        cur, d_cur = nxt, d_nxt
        nxt = next(it, None)
        d_nxt = upload(nxt) if nxt is not None else None
        t0 = time.perf_counter()
        out = step(*d_cur)                 # async dispatch
        pending.append((cur, out))
        # Drain only batches OLDER than the newest `depth` in flight
        # (draining the just-dispatched batch too would kill the overlap
        # every other iteration — round-1 advisor finding).
        while len(pending) > depth:
            drain(*pending.pop(0))
        stats["compute_s"] += time.perf_counter() - t0
    for b, o in pending:
        drain(b, o)
    pending.clear()
    return stats
