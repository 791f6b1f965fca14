"""Image loading/resizing (reference: src/data/image_io.cpp, stb_image-based).

Uses PIL for decode; resize is PIL bilinear (matching the reference's CPU
bilinear resize intent, image_io.cpp:47-93). Output is float32 [H, W, 3] in
[0, 1]; alpha is dropped (reference trainer flattens RGBA->RGB,
trainer.cpp:24-46).
"""
from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    """-> float32 [H, W, 3] in [0, 1]."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        return np.asarray(im, np.float32) / 255.0


def resize_image(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Bilinear resize float [H, W, 3] -> [new_h, new_w, 3]."""
    im = Image.fromarray((np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8))
    im = im.resize((new_w, new_h), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def load_image_resized(path: str, new_w: int, new_h: int) -> np.ndarray:
    """Load + resize in one step (decode-time resize avoids a full-res copy)."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (new_w, new_h):
            im = im.resize((new_w, new_h), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0
