from aerial_image_recognition_tpu.gio.geojson import (
    detections_to_feature_collection, feature_collection_to_detections,
    coverage_to_feature_collection, read_geojson, read_polygons,
    write_geojson,
)
from aerial_image_recognition_tpu.gio.shapefile import (
    ShapeRecord, detections_to_shapefile, read_dbf, read_polygons_shp,
    read_shapefile, write_shapefile,
)
from aerial_image_recognition_tpu.gio.geotiff import (
    GeoTiff, read_geotiff, write_geotiff,
)
