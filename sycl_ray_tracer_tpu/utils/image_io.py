"""PNG writeback (util.hpp:8-33 equivalent) via PIL."""

from __future__ import annotations

import numpy as np


def write_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3] float32 in [0, 1] (already gamma-encoded, as the
    reference's kernel output is) -> 8-bit RGBA PNG, alpha=255."""
    from PIL import Image

    arr = np.asarray(img)
    u8 = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if u8.shape[-1] == 3:
        a = np.full(u8.shape[:2] + (1,), 255, np.uint8)
        u8 = np.concatenate([u8, a], axis=-1)
    Image.fromarray(u8, "RGBA").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0
