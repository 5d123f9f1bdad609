from aerial_image_recognition_tpu.ops.decode import decode_yolov7, decode_yolov8
from aerial_image_recognition_tpu.ops.nms import Detections, batched_nms, iou_matrix
from aerial_image_recognition_tpu.ops.preprocess import assemble_mosaic, preprocess_batch
