"""Panorama generators: Fast, Rectilinear, InterpolatingRectilinear."""

from .base import HitBuffer, RenderResult
from .fast import render_fast

__all__ = ["HitBuffer", "RenderResult", "render_fast"]
