"""Image loading and preprocessing utilities."""

from pie_tpu.vision.utils import (
    BaseImageProcessor,
    SiglipImageProcessor,
    load_image,
    process_image,
    resize_image,
)
