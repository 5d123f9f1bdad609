from aerial_image_recognition_tpu.pipeline.detector import CarDetector
from aerial_image_recognition_tpu.pipeline.simple import SimpleDetector
from aerial_image_recognition_tpu.pipeline.inference import (
    DetectStep, build_detect_step, make_detect_fn, make_segment_fn,
)
