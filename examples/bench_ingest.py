"""Host ingest-plane throughput: JPEG decode → s2d2 batch assembly.

Evidence for SURVEY §7 hard part 3 ("keeping TPUs fed"): the fused step
consumes 4616 tiles/s/chip, so the host must decode + pack at least that
fast. Measures the decode plane (native libjpeg, GIL-released, thread
pool) and both batch-assembly layouts on this machine's cores. No TPU.

Run: python examples/bench_ingest.py
"""
import concurrent.futures as cf
import io
import os
import time

import numpy as np


def main():
    from PIL import Image

    from aerial_image_recognition_tpu.fetch.xyz import TileImage
    from aerial_image_recognition_tpu.gio.decode import decode_rgb
    from aerial_image_recognition_tpu.ingest.pipeline import (
        assemble_batches)

    rng = np.random.default_rng(0)
    n_src = 64
    jpegs = []
    for i in range(n_src):
        # realistic aerial-ish content (smooth + blocks), 640^2 q85
        base = rng.integers(60, 160, (40, 40, 3), np.uint8)
        img = np.asarray(Image.fromarray(base).resize((640, 640)))
        img = (img + rng.integers(0, 30, img.shape, np.uint8))
        buf = io.BytesIO()
        Image.fromarray(img.astype(np.uint8)).save(buf, "JPEG", quality=85)
        jpegs.append(buf.getvalue())
    print(f"avg jpeg size {np.mean([len(j) for j in jpegs])/1024:.0f} KiB",
          flush=True)

    n_tiles = 1024
    workers = min(16, os.cpu_count() or 4)

    # ---- decode throughput (thread pool, native path releases the GIL)
    def decode_one(i):
        decode_rgb(jpegs[i % n_src])      # discard: throughput only

    with cf.ThreadPoolExecutor(workers) as ex:
        list(ex.map(decode_one, range(64)))       # warm
        t0 = time.perf_counter()
        for _ in ex.map(decode_one, range(n_tiles)):
            pass
        dt = time.perf_counter() - t0
    print(f"decode: {n_tiles/dt:.0f} tiles/s on {workers} threads",
          flush=True)
    pixels = [decode_rgb(jpegs[i]) for i in range(min(32, n_src))]

    # ---- assembly throughput per layout (single thread — it runs inline
    # on the consumer side of the fetch pool)
    tiles = [(i, TileImage(pixels[i % len(pixels)], (0, 0, 1e-3, 1e-3)))
             for i in range(n_tiles)]
    for layout in ("hwc", "s2d2"):
        list(assemble_batches(iter(tiles[:256]), 128, 640, layout=layout))
        t0 = time.perf_counter()
        nb = sum(1 for _ in assemble_batches(iter(tiles), 128, 640,
                                             layout=layout))
        dt = time.perf_counter() - t0
        print(f"assemble[{layout}]: {n_tiles/dt:.0f} tiles/s "
              f"({nb} batches, single thread)", flush=True)

    # ---- full chain: decode + s2d2 assembly overlapped via the pool
    from aerial_image_recognition_tpu.ops.quadstem import host_s2d2_into
    outs = [np.empty((160, 160, 48), np.uint8) for _ in range(workers * 2)]

    def chain(i):
        px = decode_rgb(jpegs[i % n_src])
        host_s2d2_into(px, outs[i % len(outs)])

    with cf.ThreadPoolExecutor(workers) as ex:
        list(ex.map(chain, range(64)))
        t0 = time.perf_counter()
        for _ in ex.map(chain, range(n_tiles)):
            pass
        dt = time.perf_counter() - t0
    print(f"decode+s2d2 pack: {n_tiles/dt:.0f} tiles/s on {workers} "
          f"threads", flush=True)


if __name__ == "__main__":
    main()
