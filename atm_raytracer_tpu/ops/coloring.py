"""Vectorized coloring methods: Simple + Shading with Legacy/Improved palettes.

Re-implements the reference's ``ColoringMethod`` trait (src/coloring/mod.rs)
as masked array arithmetic over the hit buffers. Quantization points mirror
the reference: ``color_for_pixel`` truncates to the u8 grid before fog and
compositing (Rust ``as u8`` float casts truncate-and-saturate).

Simple (src/coloring/simple.rs): distance+elevation → HSV ramp; water below
``water_level``. Note it ignores object RGBA — object hits are also colored by
(ray) elevation, faithfully to simple.rs:23-45.

Shading (src/coloring/shading.rs): Lambert² directional light
``ambient + (1-ambient)·max(L·N, 0)²`` (shading.rs:108-112); object hits use
their own RGB, terrain uses a 4-threshold piecewise-linear elevation palette.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

FOG_COLOR = (160.0 / 255.0, 160.0 / 255.0, 160.0 / 255.0)  # renderer/mod.rs:369


@dataclasses.dataclass(frozen=True)
class ColoringParams:
    """Lowered coloring parameters. Frozen + tuple-valued so it can be a
    static (hashable) jit argument."""

    kind: str  # "Simple" | "Shading"
    water_level: float = 0.0
    max_distance: float = 0.0  # Simple only
    ambient_light: float = 0.4  # Shading only
    light_dir: Optional[Tuple[float, float, float]] = None  # global cartesian
    palette: str = "Improved"


def quantize_u8_grid(x: jnp.ndarray) -> jnp.ndarray:
    """(x*255) as u8 / 255: Rust float→int casts truncate and saturate."""
    return jnp.trunc(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def _hsv(h, s, v):
    """hsv → rgb matching simple.rs:57-87 (h degrees, wrapped)."""
    h = jnp.mod(h, 360.0)
    h = jnp.where(h < 0.0, h + 360.0, h)
    c = v * s
    x = c * (1.0 - jnp.abs(jnp.mod(h / 60.0, 2.0) - 1.0))
    m = v - c
    zeros = jnp.zeros_like(c)
    sector = jnp.floor(h / 60.0).astype(jnp.int32)
    rp = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, x, zeros, zeros, x], c)
    gp = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [x, c, c, x, zeros], zeros)
    bp = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [zeros, zeros, x, c, c], x)
    return jnp.stack([rp + m, gp + m, bp + m], axis=-1)


def _palette_colors(palette: str):
    if palette == "Legacy":  # shading.rs:33-56
        thr = (300.0, 1200.0, 1800.0, 3000.0)
        cols = np.array(
            [[0.0, 1.0, 0.0], [0.6, 1.0, 0.0], [0.5, 0.5, 0.5], [1.0, 1.0, 1.0]],
            np.float32,
        )
        sky = np.array([0.11, 0.11, 0.11], np.float32)
        water = np.array([0.0, 0.5, 1.0], np.float32)
    else:  # Improved, shading.rs:57-80
        thr = (300.0, 1000.0, 1800.0, 3000.0)
        cols = np.array(
            [[0.4, 0.8, 0.3], [0.77, 0.84, 0.4], [0.41, 0.52, 0.4], [0.85, 0.92, 0.95]],
            np.float32,
        )
        sky = np.array([0.23, 0.41, 0.55], np.float32)
        water = np.array([0.23, 0.41, 0.55], np.float32)
    return thr, cols, sky, water


def _elev_ramp(elev: jnp.ndarray, palette: str) -> jnp.ndarray:
    thr, cols, _, _ = _palette_colors(palette)
    t1, t2, t3, t4 = thr
    g, base, mid, top = [jnp.asarray(c) for c in cols]

    def lerp(a, b, p):
        return a * (1.0 - p[..., None]) + b * p[..., None]

    p12 = jnp.clip((elev - t1) / (t2 - t1), 0.0, 1.0)
    p23 = jnp.clip((elev - t2) / (t3 - t2), 0.0, 1.0)
    p34 = jnp.clip((elev - t3) / (t4 - t3), 0.0, 1.0)
    out = jnp.where(
        (elev < t2)[..., None],
        lerp(g, base, p12),
        jnp.where((elev < t3)[..., None], lerp(base, mid, p23), lerp(mid, top, p34)),
    )
    return out


def color_hits(
    params: ColoringParams,
    distance: jnp.ndarray,  # [..., K]
    elevation: jnp.ndarray,
    normal: jnp.ndarray,  # [..., K, 3]
    kind: jnp.ndarray,  # [..., K] 0=terrain 1=rgba
    rgb: jnp.ndarray,  # [..., K, 3]
    light_dir: Optional[jnp.ndarray] = None,  # traced override (sweeps)
) -> jnp.ndarray:
    """color_for_pixel over all hit slots → [..., K, 3] on the u8 grid."""
    if params.kind == "Simple":
        dist_ratio = distance / params.max_distance
        mul = 1.0 - dist_ratio * 0.6
        # Rgb([0, (128*mul) as u8, (255*mul) as u8]) — simple.rs:26-27
        water = jnp.stack(
            [jnp.zeros_like(mul),
             jnp.trunc(jnp.clip(128.0 * mul, 0.0, 255.0)) / 255.0,
             jnp.trunc(jnp.clip(255.0 * mul, 0.0, 255.0)) / 255.0],
            axis=-1,
        )
        # land: HSV ramp (simple.rs:29-43)
        elev_ratio = elevation / 4500.0
        powed = jnp.where(
            elev_ratio < 0.0,
            -jnp.power(jnp.maximum(-elev_ratio, 0.0), 0.65),
            jnp.power(jnp.maximum(elev_ratio, 0.0), 0.65),
        )
        h = 120.0 - 240.0 * powed
        v = jnp.where(
            elev_ratio > 0.7, 2.1 - elev_ratio * 2.0, 0.9 - elev_ratio / 0.7 * 0.2
        ) * (1.0 - dist_ratio * 0.6)
        s = 1.0 - dist_ratio * 0.9
        land = quantize_u8_grid(_hsv(h, s, v))
        return jnp.where((elevation <= params.water_level)[..., None], water, land)

    # Shading
    light = jnp.asarray(params.light_dir) if light_dir is None else light_dir
    light_dot = jnp.maximum((normal * light).sum(-1), 0.0)
    brightness = params.ambient_light + (1.0 - params.ambient_light) * light_dot**2
    _, _, _, water_col = _palette_colors(params.palette)
    terrain_col = jnp.where(
        (elevation <= params.water_level)[..., None],
        jnp.asarray(water_col),
        _elev_ramp(elevation, params.palette),
    )
    base = jnp.where((kind == 1)[..., None], rgb, terrain_col)
    return quantize_u8_grid(base * brightness[..., None])


def sky_color(params: ColoringParams) -> np.ndarray:
    if params.kind == "Simple":
        return np.array([28, 28, 28], np.float32) / 255.0  # simple.rs:47-49
    _, _, sky, _ = _palette_colors(params.palette)
    return np.trunc(sky * 255.0) / 255.0


def fog_color() -> np.ndarray:
    return np.array([160, 160, 160], np.float32) / 255.0
