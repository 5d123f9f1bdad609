"""City scan over a WMS or XYZ source — the car_detection_on_wms.py
entry-point equivalent (reference car_detection_on_wms.py:5-31: custom
config dict → CarDetector.detect).

Run:  python examples/city_scan_wms.py [frame.shp]
"""

import sys

from aerial_image_recognition_tpu.pipeline.detector import CarDetector


def main():
    frame = sys.argv[1] if len(sys.argv) > 1 else "la.shp"
    custom_config = {
        "frame_path": frame,
        "xyz_url": "http://mt{s}.google.com/vt/lyrs=s&x={x}&y={y}&z={z}",
        "use_xyz": True,
        "duplicate_distance": 1.0,
    }
    detector = CarDetector(".", custom_config)
    out = detector.detect(interactive=False, force_restart=True)
    print(out)


if __name__ == "__main__":
    main()
