"""Front-to-back alpha compositing + fog — the reference's draw_image core.

renderer/mod.rs:385-414: result += color·accum_negα·α; accum_negα *= (1−α);
remainder goes to the sky color, or the fog color when fog is configured.
Fog (renderer/mod.rs:367-376): coeff = 1 − exp(−path_length/fog_dist), mixed
toward rgb(160,160,160), quantized to the u8 grid like the reference's
per-channel ``as u8`` casts.

Hits arrive as fixed-K slot buffers sorted ascending by march position;
invalid slots carry alpha 0, so the fold is a dense masked loop over K.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .coloring import ColoringParams, color_hits, fog_color, quantize_u8_grid, sky_color


def apply_fog(
    color: jnp.ndarray, path_length: jnp.ndarray, fog_dist: float
) -> jnp.ndarray:
    coeff = 1.0 - jnp.exp(-path_length / fog_dist)
    fogc = jnp.asarray(fog_color())
    return quantize_u8_grid(color * (1.0 - coeff[..., None]) + fogc * coeff[..., None])


def composite(
    coloring: ColoringParams,
    fog_distance: Optional[float],
    valid: jnp.ndarray,  # [..., K] bool
    alpha: jnp.ndarray,  # [..., K]
    distance: jnp.ndarray,
    elevation: jnp.ndarray,
    path_length: jnp.ndarray,
    normal: jnp.ndarray,  # [..., K, 3]
    kind: jnp.ndarray,  # [..., K]
    rgb: jnp.ndarray,  # [..., K, 3]
    light_dir=None,
) -> jnp.ndarray:
    """Returns the composited image [..., 3] as uint8."""
    colors = color_hits(coloring, distance, elevation, normal, kind, rgb,
                        light_dir=light_dir)
    if fog_distance is not None:
        colors = apply_fog(colors, path_length, fog_distance)
        def_color = jnp.asarray(fog_color())
    else:
        def_color = jnp.asarray(sky_color(coloring))

    a = jnp.where(valid, alpha, 0.0)
    k_slots = a.shape[-1]
    # The reference's fold re-quantizes the running sum to the u8 grid after
    # EVERY trace point: add() returns Rgb<u8> each step (renderer/mod.rs:
    # 378-383,406,410 via vec3_to_rgb's `as u8` truncate-saturate,
    # utils/mod.rs:24-29). Fold in u8-count space (integer-valued floats are
    # exact) so multi-hit translucent pixels truncate at the same points.
    # colors/def_color are already on the u8 grid (coloring quantizes all
    # exits); round() recovers the exact integer counts.
    colors255 = jnp.round(colors * 255.0)
    def255 = jnp.round(def_color * 255.0)
    result = jnp.zeros(colors.shape[:-2] + (3,), jnp.float32)
    accum = jnp.ones(a.shape[:-1], jnp.float32)
    for i in range(k_slots):
        step = colors255[..., i, :] * (accum * a[..., i])[..., None]
        result = jnp.trunc(jnp.clip(result + step, 0.0, 255.0))
        accum = accum * (1.0 - a[..., i])
    result = jnp.trunc(jnp.clip(result + def255 * accum[..., None], 0.0, 255.0))
    return result.astype(jnp.uint8)
