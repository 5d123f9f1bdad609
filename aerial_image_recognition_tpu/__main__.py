from aerial_image_recognition_tpu.pipeline.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
