"""Rendering output: PNG encoding + overlay annotations."""

from .image import save_png
from .annotate import annotate_image

__all__ = ["save_png", "annotate_image"]
