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
    result = jnp.zeros(colors.shape[:-2] + (3,), jnp.float32)
    accum = jnp.ones(a.shape[:-1], jnp.float32)
    for i in range(k_slots):
        result = result + colors[..., i, :] * (accum * a[..., i])[..., None]
        accum = accum * (1.0 - a[..., i])
    result = result + def_color * accum[..., None]
    return jnp.clip(jnp.trunc(result * 255.0), 0.0, 255.0).astype(jnp.uint8)


def mask_post_opaque(valid: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Drop hits after the first opaque one (metadata parity with the
    reference's early exit, utils.rs:237-284)."""
    opaque = valid & (alpha >= 1.0)
    k = valid.shape[-1]
    prior_opaque = jnp.cumsum(opaque.astype(jnp.int32), axis=-1) - opaque.astype(
        jnp.int32
    )
    return valid & (prior_opaque == 0)
