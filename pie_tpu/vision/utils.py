"""Image fetch / resize / normalize.

Reference parity: vision/utils.py:14-94 — load_image (URL / file / BytesIO /
data URI), EXIF transpose, RGB convert, aspect-preserving resize, and the
BaseImageProcessor mean/std/crop surface.
"""

from __future__ import annotations

import base64
import dataclasses
import io
from pathlib import Path
from typing import Any, Optional, Union

import numpy as np


def load_image(source: Union[str, bytes, "io.BytesIO", Any]):
    """Load a PIL image from URL, local path, data URI, raw bytes or
    BytesIO."""
    from PIL import Image, ImageOps

    if hasattr(source, "read"):
        img = Image.open(source)
    elif isinstance(source, bytes):
        img = Image.open(io.BytesIO(source))
    elif isinstance(source, str) and source.startswith("data:"):
        _, b64 = source.split(",", 1)
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
    elif isinstance(source, str) and source.startswith(("http://", "https://")):
        import requests

        resp = requests.get(source, timeout=30)
        resp.raise_for_status()
        img = Image.open(io.BytesIO(resp.content))
    elif isinstance(source, (str, Path)):
        img = Image.open(source)
    else:
        img = source  # already a PIL image
    img = ImageOps.exif_transpose(img)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return img


def resize_image(img, max_size: tuple[int, int]):
    """Aspect-preserving downscale to fit in max_size."""
    from PIL import Image

    w, h = img.size
    mw, mh = max_size
    scale = min(mw / w, mh / h, 1.0)
    if scale < 1.0:
        img = img.resize(
            (max(1, int(w * scale)), max(1, int(h * scale))),
            Image.Resampling.BICUBIC,
        )
    return img


def process_image(img, size: int, mean, std) -> np.ndarray:
    """Resize to (size, size), normalize -> [3, H, W] float32."""
    from PIL import Image

    img = img.resize((size, size), Image.Resampling.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(mean, np.float32).reshape(1, 1, 3)
    std = np.asarray(std, np.float32).reshape(1, 1, 3)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)


@dataclasses.dataclass
class BaseImageProcessor:
    """Mean/std/size config (reference vision/utils.py:14-42)."""

    image_size: int = 224
    image_mean: tuple = (0.5, 0.5, 0.5)
    image_std: tuple = (0.5, 0.5, 0.5)

    def __call__(self, source) -> np.ndarray:
        img = load_image(source)
        return process_image(
            img, self.image_size, self.image_mean, self.image_std
        )

    def batch(self, sources) -> np.ndarray:
        return np.stack([self(s) for s in sources])


class SiglipImageProcessor(BaseImageProcessor):
    """Gemma-3 / SigLIP defaults."""
