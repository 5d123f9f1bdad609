from aerial_image_recognition_tpu.models.registry import (
    REGISTRY, ModelBundle, ModelSpec, create_model, load_params,
    resolve_model_name, save_params,
)
from aerial_image_recognition_tpu.models.yolov7 import YOLOv7
from aerial_image_recognition_tpu.models.yolov8 import YOLOv8
from aerial_image_recognition_tpu.models.xunet import XUnet
