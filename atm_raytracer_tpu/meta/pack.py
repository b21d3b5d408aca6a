"""Device-side metadata packing: one fused transfer for viewer staging.

The viewer-facing per-pixel metadata (distance, elevation, lat/lon — see
src/viewer/app.rs:112-176) is staged from device to host. Four separate f32
[H, W, K] fetches cost 16 B/pixel-slot through a bandwidth-limited link; this
pack cuts that to 12 B with documented tolerances and ONE flat transfer:

* ``key`` — f32, exact. ``distance`` is derived on host as
  ``where(isfinite(key), key, 0) * step`` — the identical f32 expression the
  device hit path uses (generators/fast.py), so it round-trips bit-exactly;
  validity is ``isfinite(key)`` (invalid slots carry the +inf sentinel).
* ``elevation`` — u16 range-coded against the frame's device min/max:
  error ≤ range·2^-15 incl. f32 round-off (4.6 cm for 1.5 km of relief;
  27 cm for Everest-scale 9 km — at or below the viewer's 0.1 m display
  step for any frame under ~3 km of relief).
* ``dlat``/``dlon`` — u24 range-coded (three u8 planes by bit-slicing):
  error ≤ range·2^-22 incl. f32 round-off ≈ 6.4e-7° for a 2.7°-wide
  footprint ≈ 7 cm — below the viewer's 0.01″ (~0.3 m) DMS display step.

Everything rides in a single flat uint8 buffer, so the fetch streams at link
speed (no device de-tiling pass, CLAUDE.md) and pays one launch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_U24_MAX = float((1 << 24) - 1)


def _range_code(v, lo, hi, levels):
    scale = (levels - 1.0) / jnp.maximum(hi - lo, 1e-30)
    return jnp.round((v - lo) * scale).astype(jnp.uint32)


@jax.jit
def pack_viewer_fields(key, dlat, dlon, elevation):
    """[H, W, K] fields → (flat u8 buffer, ranges [6] f32).

    Buffer layout (P = H·W·K): key f32 as 4 u8 planes (bitcast), dlat u24
    (3 planes hi→lo), dlon u24, elevation u16 (2 planes) — 12·P bytes.
    """
    valid = jnp.isfinite(key)

    def rng(v):
        big = jnp.float32(3.4e38)
        lo = jnp.min(jnp.where(valid, v, big))
        hi = jnp.max(jnp.where(valid, v, -big))
        ok = jnp.any(valid)
        return jnp.where(ok, lo, 0.0), jnp.where(ok, hi, 0.0)

    la_lo, la_hi = rng(dlat)
    lo_lo, lo_hi = rng(dlon)
    el_lo, el_hi = rng(elevation)

    key_u8 = jax.lax.bitcast_convert_type(
        key.reshape(-1), jnp.uint8
    ).T.reshape(4, -1)  # [4, P] byte planes (LE order)
    la = _range_code(jnp.where(valid, dlat, la_lo), la_lo, la_hi, _U24_MAX + 1)
    lo = _range_code(jnp.where(valid, dlon, lo_lo), lo_lo, lo_hi, _U24_MAX + 1)
    el = _range_code(
        jnp.where(valid, elevation, el_lo), el_lo, el_hi, 65536.0
    )

    def u24_planes(x):
        x = x.reshape(-1)
        return jnp.stack(
            [(x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF]
        ).astype(jnp.uint8)

    def u16_planes(x):
        x = x.reshape(-1)
        return jnp.stack([(x >> 8) & 0xFF, x & 0xFF]).astype(jnp.uint8)

    buf = jnp.concatenate(
        [key_u8, u24_planes(la), u24_planes(lo), u16_planes(el)], axis=0
    ).reshape(-1)
    ranges = jnp.stack([la_lo, la_hi, lo_lo, lo_hi, el_lo, el_hi])
    return buf, ranges


def unpack_viewer_fields(
    buf: np.ndarray, ranges: np.ndarray, shape: Tuple[int, int, int],
    step: float,
):
    """Host inverse of :func:`pack_viewer_fields`.

    Returns (valid, key, distance, dlat, dlon, elevation) as [H, W, K]
    numpy arrays; ``distance`` reproduces the device expression bit-exactly.
    """
    p = int(np.prod(shape))
    planes = np.asarray(buf, np.uint8).reshape(12, p)
    key = planes[:4].T.copy().view(np.float32).reshape(shape)
    valid = np.isfinite(key)

    def u24(pl):
        return (
            pl[0].astype(np.uint32) << 16
        ) | (pl[1].astype(np.uint32) << 8) | pl[2]

    def decode(q, lo, hi, levels):
        return (lo + q.astype(np.float64) * (hi - lo) / (levels - 1.0)).astype(
            np.float32
        ).reshape(shape)

    la_lo, la_hi, lo_lo, lo_hi, el_lo, el_hi = np.asarray(ranges, np.float64)
    dlat = decode(u24(planes[4:7]), la_lo, la_hi, _U24_MAX + 1.0)
    dlon = decode(u24(planes[7:10]), lo_lo, lo_hi, _U24_MAX + 1.0)
    el = (planes[10].astype(np.uint32) << 8) | planes[11]
    elevation = decode(el, el_lo, el_hi, 65536.0)
    safe = np.where(valid, key, np.float32(0.0))
    distance = (safe * np.float32(step)).astype(np.float32)
    return valid, key, distance, dlat, dlon, elevation


def fetch_viewer_fields(hits, step: float):
    """Device→host staging of the viewer metadata via the fused pack.

    ``hits``: a HitBuffer with device-resident arrays. One flat u8 transfer
    (12 B / pixel-slot vs 16 B for four separate f32 fetches).
    """
    from ..generators.base import fetch_flat

    buf, ranges = pack_viewer_fields(
        jnp.asarray(hits.key), jnp.asarray(hits.dlat),
        jnp.asarray(hits.dlon), jnp.asarray(hits.elevation),
    )
    return unpack_viewer_fields(
        fetch_flat(buf), np.asarray(ranges), tuple(hits.key.shape), step
    )
