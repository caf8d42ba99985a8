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


OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class Qwen2VLImageProcessor:
    """Host-side Qwen2-VL preprocessing (reference models/intern/ vision
    input contract): resize to a fixed square whose side divides
    patch*merge, CLIP-normalize, and patchify into HF's
    [grid_t*grid_h*grid_w, C*temporal*patch*patch] layout with the 2x2
    merge-block interleaving the vision tower expects. Returns
    (pixel_values, grid_thw) — the ``returns_grid`` marker tells the chat
    layer to thread grid_thw through as image_kwargs."""

    image_size: int = 224
    patch_size: int = 14
    merge_size: int = 2
    temporal_patch_size: int = 2
    image_mean: tuple = OPENAI_CLIP_MEAN
    image_std: tuple = OPENAI_CLIP_STD

    returns_grid = True

    @property
    def tokens_per_image(self) -> int:
        g = self.image_size // self.patch_size
        return (g * g) // (self.merge_size**2)

    def _one(self, source) -> np.ndarray:
        img = load_image(source)
        arr = process_image(
            img, self.image_size, self.image_mean, self.image_std
        )  # [3, H, W]
        c, h, w = arr.shape
        p, m, t = self.patch_size, self.merge_size, self.temporal_patch_size
        gh, gw = h // p, w // p
        # static image: repeated along the temporal patch axis (HF
        # Qwen2VLImageProcessor semantics)
        patches = np.broadcast_to(arr[None], (t, c, h, w))
        patches = patches.reshape(
            1, t, c, gh // m, m, p, gw // m, m, p
        )
        patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        return patches.reshape(gh * gw, c * t * p * p).astype(np.float32)

    def batch(self, sources):
        pixels = np.concatenate([self._one(s) for s in sources])
        g = self.image_size // self.patch_size
        grid = np.asarray([[1, g, g]] * len(sources), np.int64)
        return pixels, grid


def make_image_processor(model):
    """Model-appropriate host-side image processor, or None for text-only
    models: Qwen2-VL family (mrope config marker) gets the patchifying
    processor with grid_thw; SigLIP-style towers (gemma-3) the square
    resize+normalize one."""
    if getattr(model, "vision", None) is None:
        return None
    cfg = model.config
    v = getattr(cfg, "vision", None) or {}
    if hasattr(cfg, "mrope_section"):
        return Qwen2VLImageProcessor(
            patch_size=int(v.get("patch_size", 14)),
            merge_size=int(v.get("spatial_merge_size", 2)),
            temporal_patch_size=int(v.get("temporal_patch_size", 2)),
        )
    return SiglipImageProcessor(image_size=int(v.get("image_size", 224)))
