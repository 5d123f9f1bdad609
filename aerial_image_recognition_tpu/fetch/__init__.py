from aerial_image_recognition_tpu.fetch.http import TileHTTP, FetchStats, FailureLog
from aerial_image_recognition_tpu.fetch.cache import TileCache
from aerial_image_recognition_tpu.fetch.xyz import XYZFetcher, TileImage
from aerial_image_recognition_tpu.fetch.wms import WMSFetcher
from aerial_image_recognition_tpu.fetch.wmts import WMTSFetcher, TileMatrix
