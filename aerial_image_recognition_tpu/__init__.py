"""aerial_image_recognition_tpu — a TPU-native aerial-imagery car-detection framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
jacgeborys/aerial_image_recognition (see SURVEY.md): city-scale car detection
from aerial/satellite imagery with WMS/XYZ/WMTS acquisition, batched TPU
inference, vectorized georeferencing, metric dedup, and resumable GeoJSON
output.

Layer map (bottom-up):
  geo       pure geodesy & tiling math (web mercator, transverse mercator/UTM,
            slippy tiles, metric tile grids) — numpy + jax implementations
  gio       geospatial IO: GeoJSON, ESRI shapefile read/write (pure python)
  models    JAX/flax model families: YOLOv7-ITCVD, YOLOv8-Tokyo, XUnet-256
  ops       compute kernels: preprocess, detect-head decode, NMS (Pallas + XLA)
  ingest    host-side decode/stage/batch plane feeding HBM
  fetch     async WMS/XYZ/WMTS tile acquisition with retry taxonomy + fake server
  post      georeferencing + cross-tile dedup + results emission
  parallel  device mesh, sharded inference, AOI stripe sharding, halo exchange
  runtime   config, checkpoints, observability, executor
  pipeline  the CarDetector-equivalent orchestrator and CLI
"""

__version__ = "0.1.0"

from aerial_image_recognition_tpu.runtime.config import DetectorConfig, DEFAULT_CONFIG  # noqa: F401

__all__ = ["DetectorConfig", "DEFAULT_CONFIG", "__version__"]
