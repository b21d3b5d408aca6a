"""PNG output (host side). Replaces the ``image`` crate's PNG encode
(reference src/renderer/mod.rs:433-436)."""

from __future__ import annotations


import numpy as np
from PIL import Image


def save_png(image_u8: np.ndarray, path) -> None:
    Image.fromarray(np.asarray(image_u8, np.uint8), "RGB").save(path)


def load_png_rgb(path) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"))
