from aerial_image_recognition_tpu.parallel.mesh import (
    batch_sharding, make_mesh, pad_to_multiple, replicate, replicated,
    shard_batch,
)
from aerial_image_recognition_tpu.parallel.stripes import (
    assign_to_stripes, halo_dedup_host, make_halo_dedup, split_aoi_stripes,
)
