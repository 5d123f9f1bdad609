"""Spatial model-parallel inference: shard the IMAGE across chips.

The latency-oriented parallelism for a CNN detector (the role TP plays for
transformers — SURVEY.md §2.3 marks classic TP N/A for a ~10 MB model but
suggests a latency experiment): partition each tile's height dimension over
the mesh and let XLA/GSPMD insert the halo exchanges every 3×3 conv needs
at the shard seams. One tile's forward then uses every chip — useful when
a single high-priority request must finish fast, as opposed to the
throughput-oriented batch DP of parallel.mesh.

No custom collectives: `jit` with spatial in_shardings is the whole
implementation — the compiler owns the seam traffic (ICI neighbor
exchanges), which is exactly the scaling-book recipe.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_detect(bundle, cfg, mesh: Mesh, *,
                        axis: str = "data",
                        model_size: Optional[int] = None):
    """Jitted (params, images_u8 [B,S,S,3], bounds [B,4]) → (det, lon, lat)
    with the image HEIGHT sharded over `axis` (batch replicated, so this is
    pure model-spatial parallelism; combine with a 2-D mesh for DP×spatial).

    S/8 (the coarsest feature stride is 32, but pooling halves happen at
    8/16/32) must divide by the axis size × 32 for even shards; standard
    tile sizes (640, 96) on 2–8 way meshes satisfy this.
    """
    from aerial_image_recognition_tpu.pipeline.inference import make_detect_fn

    detect = make_detect_fn(bundle, cfg, model_size=model_size)
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(None, axis, None, None))
    return jax.jit(detect,
                   in_shardings=(repl, img_sh, repl),
                   out_shardings=(repl, repl, repl))
