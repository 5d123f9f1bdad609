from aerial_image_recognition_tpu.runtime.config import DetectorConfig, DEFAULT_CONFIG

__all__ = ["DetectorConfig", "DEFAULT_CONFIG"]
