"""Point-grid city scan — the simple_detector.py __main__ equivalent
(reference simple_detector.py:705-930: 60 m grid, batches of 100,
checkpoint every 2000 tiles, final dedup + GeoJSON).

Run:  python examples/point_grid_scan.py gis/frames/madrid.shp
"""

import sys

from aerial_image_recognition_tpu.pipeline.simple import SimpleDetector


def main():
    shp = sys.argv[1] if len(sys.argv) > 1 else "gis/frames/madrid.shp"
    det = SimpleDetector("yolov7_itcvd", "output")
    try:
        print(det.run(shp, spacing_meters=60.0, batch_size=100,
                      checkpoint_every=2000, duplicate_distance=1.0))
    finally:
        det.close()


if __name__ == "__main__":
    main()
