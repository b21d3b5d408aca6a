"""Rectilinear generator: exact pinhole lens, one ray + geodesic per pixel.

Reference: src/generator/generators/rectilinear.rs — per-pixel direction from
the Euler-rotated camera basis (rectilinear.rs:78-100), each pixel marching
its own ray and geodesic lazily (PathIterator, rectilinear.rs:118-186).
Slowest, exact (README.md:273-279).

TPU shape: all P = H·W rays march in lockstep ([P]-wide RK4 scan); the
crossing search runs as a scan over march-segment chunks that recomputes the
per-pixel geodesic and terrain elevation on the fly (closed-form geodesics
make any (direction, distance) point O(1) — nothing needs to be memoized or
stored per step). Hit fields (terrain elevation, normals) are reconstructed
only at the K hit positions instead of every march step, cutting the gather
volume by ~N/K. Pixels are processed in row-chunks to bound device memory.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..models import camera
from ..models.earth import EarthModel
from ..ops import combine
from ..ops.composite import composite
from ..ops.objects import ObjectSet, merge_hits, object_hits_pixelwise
from ..physics.ray import EarthShape, RefractionTable, march_rays
from ..terrain.sample import sample_elevation, sample_terrain_data
from ..terrain.store import Terrain, TerrainPack
from .base import HitBuffer, RenderResult
from .fast import build_refraction_table, terrain_bbox


def pixelwise_hits(
    pack: TerrainPack,
    table: Optional[RefractionTable],
    objects: Optional[ObjectSet],
    elev_rad: jnp.ndarray,  # [P]
    dir_deg: jnp.ndarray,  # [P]
    alt0,
    *,
    model: EarthModel,
    shape: EarthShape,
    straight: bool,
    step: float,
    n_terr: int,
    max_hits: int,
    lat0: float,
    lon0: float,
    terrain_alpha: float,
    seg_chunk: int = 512,
) -> HitBuffer:
    """Hits for P independent (elevation, azimuth) rays."""
    p_n = elev_rad.shape[0]
    n_seg = n_terr - 1
    import os as _os

    coarse = int(_os.environ.get("ATM_RAYTRACER_MARCH_COARSE", "0")) or max(
        1, int(400.0 // step)
    )
    ray_h, path_len = march_rays(
        alt0, elev_rad, step, n_seg, shape, table, straight, coarse=coarse
    )  # [P, n_terr]
    alive = combine.ray_alive_mask(ray_h)  # [P, n_seg]

    n_chunks = -(-n_seg // seg_chunk)
    pad_to = n_chunks * seg_chunk + 1
    ray_h_p = jnp.pad(ray_h, ((0, 0), (0, pad_to - n_terr)), constant_values=-1e9)
    alive_p = jnp.pad(alive, ((0, 0), (0, pad_to - n_seg)), constant_values=False)
    dir_col = dir_deg[:, None]

    def chunk_body(keys, c):
        k0 = c * seg_chunk
        dists = (jnp.arange(seg_chunk + 1, dtype=jnp.float32) + k0.astype(jnp.float32)) * step
        dl, dn = model.geodesic_delta(lat0, lon0, dir_col, dists[None, :])
        te = sample_elevation(pack, dl, dn, lat0, lon0)  # [P, C+1]
        rh = jax.lax.dynamic_slice(ray_h_p, (0, k0), (p_n, seg_chunk + 1))
        al = jax.lax.dynamic_slice(alive_p, (0, k0), (p_n, seg_chunk))
        d1 = rh[:, :-1] - te[:, :-1]
        d2 = rh[:, 1:] - te[:, 1:]
        seg_idx = (
            jax.lax.broadcasted_iota(jnp.float32, (1, seg_chunk), 1)
            + k0.astype(jnp.float32)
        )
        in_range = seg_idx < n_seg
        crossing = (d1 * d2 < 0.0) & al & in_range
        prop = d1 / (d1 - d2)
        cand = jnp.where(crossing, seg_idx + prop, combine.NO_HIT)
        if max_hits == 1:
            keys = jnp.minimum(keys, jnp.min(cand, axis=-1, keepdims=True))
        else:
            neg_top, _ = jax.lax.top_k(-cand, max_hits)
            keys = combine._merge_topk(keys, -neg_top, max_hits)
        return keys, None

    keys0 = jnp.full((p_n, max_hits), combine.NO_HIT)
    keys, _ = jax.lax.scan(chunk_body, keys0, jnp.arange(n_chunks))
    valid = jnp.isfinite(keys)
    safe = jnp.where(valid, keys, 0.0)

    # hit-field reconstruction at the K crossings only
    k = jnp.floor(safe)
    prop = (safe - k)[..., None] if False else (safe - k)
    d_lo = k * step
    d_hi = (k + 1.0) * step
    dl1, dn1 = model.geodesic_delta(lat0, lon0, dir_col, d_lo)
    dl2, dn2 = model.geodesic_delta(lat0, lon0, dir_col, d_hi)
    te1, no1 = sample_terrain_data(pack, model, dl1, dn1, lat0, lon0)
    te2, no2 = sample_terrain_data(pack, model, dl2, dn2, lat0, lon0)
    lerp = lambda a, b: a * (1.0 - prop) + b * prop
    lerp_v = lambda a, b: a * (1.0 - prop[..., None]) + b * prop[..., None]
    hits = HitBuffer(
        valid=valid,
        key=keys,
        dlat=lerp(dl1, dl2),
        dlon=lerp(dn1, dn2),
        distance=safe * jnp.float32(step),
        elevation=lerp(te1, te2),
        path_length=combine.gather_ray_field(path_len, safe),
        normal=lerp_v(no1, no2),
        kind=jnp.zeros(keys.shape, jnp.int32),
        rgba=jnp.zeros(keys.shape + (4,), jnp.float32)
        .at[..., 3]
        .set(jnp.float32(terrain_alpha)),
    )
    if objects is not None:
        obj_hits = object_hits_pixelwise(
            objects, model, lat0, lon0, step, n_terr,
            ray_h, path_len, dir_deg,
        )
        hits = merge_hits(hits, obj_hits, max_hits + obj_hits.key.shape[-1])
    return hits


def rectilinear_core(
    pack, table, objects, elev_rad, dir_deg, alt0, *,
    model, shape, straight, step, n_terr, max_hits, lat0, lon0,
    coloring, fog_distance, terrain_alpha,
):
    hits = pixelwise_hits(
        pack, table, objects, elev_rad, dir_deg, alt0,
        model=model, shape=shape, straight=straight, step=step, n_terr=n_terr,
        max_hits=max_hits, lat0=lat0, lon0=lon0, terrain_alpha=terrain_alpha,
    )
    image = composite(
        coloring, fog_distance,
        hits.valid, hits.rgba[..., 3], hits.distance, hits.elevation,
        hits.path_length, hits.normal, hits.kind, hits.rgba[..., :3],
    )
    return image, hits


_rectilinear_chunk = functools.partial(
    jax.jit,
    static_argnames=(
        "model", "shape", "straight", "step", "n_terr", "max_hits", "lat0",
        "lon0", "coloring", "fog_distance", "terrain_alpha",
    ),
)(rectilinear_core)


def render_rectilinear(
    params: Params, terrain: Terrain, max_hits: Optional[int] = None,
    chunk_rows: int = 64,
) -> RenderResult:
    """Full Rectilinear render (rectilinear.rs:24-60), row-chunked."""
    out = params.output
    frame = params.view.frame
    pos = params.view.position
    alt0 = pos.abs_altitude(terrain)

    elev_rad, dir_rad = camera.rectilinear_ray_params(
        out.width, out.height, frame.fov, frame.tilt, frame.direction
    )  # [H, W]
    lat_rng, lon_rng = terrain_bbox(params)
    pack = terrain.pack(lat_rng, lon_rng)
    table = build_refraction_table(params, alt0)
    n_terr = int(math.ceil(frame.max_distance / params.simulation_step))
    if max_hits is None:
        max_hits = 1 if params.terrain_alpha >= 1.0 else 4
    objset = ObjectSet.build(params, terrain) if params.objects else None

    h, w = out.height, out.width
    elev_flat = jnp.asarray(elev_rad.reshape(-1), jnp.float32)
    dir_flat = jnp.asarray(np.rad2deg(dir_rad).reshape(-1), jnp.float32)
    p_total = h * w
    chunk = chunk_rows * w
    pad = (-p_total) % chunk
    if pad:
        elev_flat = jnp.concatenate([elev_flat, jnp.zeros((pad,), jnp.float32)])
        dir_flat = jnp.concatenate([dir_flat, jnp.zeros((pad,), jnp.float32)])

    images = []
    hit_parts = []
    for c0 in range(0, p_total + pad, chunk):
        img_c, hits_c = _rectilinear_chunk(
            pack, table, objset,
            jax.lax.dynamic_slice(elev_flat, (c0,), (chunk,)),
            jax.lax.dynamic_slice(dir_flat, (c0,), (chunk,)),
            float(alt0),
            model=params.model,
            shape=params.model.to_shape(),
            straight=params.straight_rays,
            step=float(params.simulation_step),
            n_terr=n_terr,
            max_hits=int(max_hits),
            lat0=float(pos.latitude),
            lon0=float(pos.longitude),
            coloring=params.coloring,
            fog_distance=params.view.fog_distance,
            terrain_alpha=float(params.terrain_alpha),
        )
        images.append(img_c)
        hit_parts.append(hits_c)

    # concatenate on DEVICE; only the final u8 image crosses to host (hit
    # buffers stay device-resident — see generators.fast note)
    image = np.asarray(
        jnp.concatenate(images, axis=0)[:p_total].reshape(h, w, 3)
    )
    hits = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0)[:p_total].reshape(
            (h, w) + xs[0].shape[1:]
        ),
        *hit_parts,
    )
    return RenderResult(
        image=image,
        hits=hits,
        elevation_deg=np.rad2deg(elev_rad),
        azimuth_deg=np.rad2deg(dir_rad),
        observer=(pos.latitude, pos.longitude, alt0),
    )
