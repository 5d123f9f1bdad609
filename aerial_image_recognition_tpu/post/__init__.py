from aerial_image_recognition_tpu.post.dedup import (
    dedup_device, dedup_host, dedup_records, nms_geographic,
)
from aerial_image_recognition_tpu.post.georef import (
    detections_to_lonlat, detections_to_records, lonlat_jax,
)
from aerial_image_recognition_tpu.post.results import ResultsManager
from aerial_image_recognition_tpu.post.heatmap import hex_heatmap
