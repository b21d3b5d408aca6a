"""Panorama generators: Fast, Rectilinear, InterpolatingRectilinear.

``render_fast`` is re-exported lazily (PEP 562): eager re-export would make
``import atm_raytracer_tpu.ops.objects`` circular (ops.objects needs
generators.base for HitBuffer; this package init would pull in fast.py,
which imports ops.objects back while it is still initializing).
"""

from .base import HitBuffer, RenderResult

__all__ = ["HitBuffer", "RenderResult", "render_fast"]


def __getattr__(name):
    if name == "render_fast":
        from .fast import render_fast

        return render_fast
    raise AttributeError(name)
