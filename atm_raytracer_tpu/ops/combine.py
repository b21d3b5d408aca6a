"""Crossing-detection combine: path tensor × terrain tensor → hit keys.

THE hot loop of the reference, re-shaped for TPU. The reference marches each
pixel's ray through ``get_single_pixel`` with early exit
(src/generator/generators/utils.rs:201-289): per segment k, a terrain
crossing exists iff diff1·diff2 < 0 with diff = ray_elev − terrain_elev at
the segment ends, hit position lerped by prop = diff1/(diff1−diff2)
(utils.rs:220-240).

Here the Fast generator's separability (fast.rs:27-57) becomes a rank-1 dense
program: ray altitudes [H, N+1] (one row per elevation angle) and terrain
elevations [W, N] (one row per azimuth column) combine into per-pixel
crossing *keys*: key = k + prop ∈ [0, N), +inf where no crossing. Early exit
becomes a min-reduction (first crossing) or a running top-K merge
(translucent terrain, terrain_alpha < 1 — README.md:124-127).

Memory: the [H, W, C] diff cube is never materialized globally — segments are
processed in chunks of C inside a ``lax.scan`` so XLA fuses
broadcast−compare−reduce per chunk. A fused Pallas kernel (combine_pallas)
supersedes this path for large frames.

The reference's path-death rule (gen_path_cache stops one element after
h < −1000, utils.rs:159-171) is applied via a per-ray "dead" prefix mask:
segment k of ray h participates iff no j < k had ray_h[h, j] < −1000.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

NO_HIT = np.float32(np.inf)
DEATH_ALTITUDE = -1000.0  # utils.rs:167


def ray_alive_mask(ray_h: jnp.ndarray) -> jnp.ndarray:
    """alive[h, k] = segment k of ray h is marched (no earlier death).

    ray_h: [H, N+1]; returns [H, N] bool for segments k = 0..N-1.
    """
    dead = ray_h < DEATH_ALTITUDE  # [H, N+1]
    # segment k participates iff no j < k is dead ⇒ prefix-or over j<k
    prefix = jnp.cumsum(dead[:, :-1].astype(jnp.int32), axis=1)
    no_prior = jnp.concatenate(
        [jnp.zeros((ray_h.shape[0], 1), jnp.int32), prefix[:, :-1]], axis=1
    )
    return no_prior == 0


def _merge_topk(keys_a: jnp.ndarray, keys_b: jnp.ndarray, k: int) -> jnp.ndarray:
    """Merge two ascending-is-better key sets into the K smallest."""
    merged = jnp.concatenate([keys_a, keys_b], axis=-1)
    # top_k selects largest; negate for smallest
    neg_top, _ = jax.lax.top_k(-merged, k)
    return -neg_top


@functools.partial(jax.jit, static_argnames=("n_seg", "max_hits", "chunk"))
def terrain_crossing_keys(
    ray_h: jnp.ndarray,
    terr_elev: jnp.ndarray,
    n_seg: int,
    max_hits: int = 1,
    chunk: int = 256,
) -> jnp.ndarray:
    """First ``max_hits`` terrain-crossing keys per (ray, column) pixel.

    Args:
      ray_h: [H, N+1] ray altitudes at x = k*step.
      terr_elev: [W, N_t] terrain elevations at the same x grid (N_t ≥ n_seg+1).
      n_seg: number of segments to test (reference: N_t − 1).
      max_hits: K slots (1 for opaque terrain — the common fast path).

    Returns keys [H, W, max_hits] f32 ascending, key = k + prop, inf = no hit.
    """
    h_n = ray_h.shape[0]
    w_n = terr_elev.shape[0]
    alive = ray_alive_mask(ray_h)  # [H, N]

    n_chunks = -(-n_seg // chunk)
    pad = n_chunks * chunk + 1 - ray_h.shape[1]
    if pad > 0:
        ray_h = jnp.pad(ray_h, ((0, 0), (0, pad)), constant_values=-1e9)
        alive = jnp.pad(alive, ((0, 0), (0, pad)), constant_values=False)
    tpad = n_chunks * chunk + 1 - terr_elev.shape[1]
    if tpad > 0:
        terr_elev = jnp.pad(terr_elev, ((0, 0), (0, tpad)), constant_values=0.0)

    seg_valid_tail = (
        jax.lax.broadcasted_iota(jnp.int32, (n_chunks, chunk), 0) * chunk
        + jax.lax.broadcasted_iota(jnp.int32, (n_chunks, chunk), 1)
    ) < n_seg  # [n_chunks, chunk]

    def chunk_body(carry, c):
        keys = carry  # [H, W, K]
        k0 = c * chunk
        # segment ends: k0..k0+chunk and k0+1..k0+chunk+1
        r1 = jax.lax.dynamic_slice(ray_h, (0, k0), (h_n, chunk))  # [H, C]
        r2 = jax.lax.dynamic_slice(ray_h, (0, k0 + 1), (h_n, chunk))
        t1 = jax.lax.dynamic_slice(terr_elev, (0, k0), (w_n, chunk))  # [W, C]
        t2 = jax.lax.dynamic_slice(terr_elev, (0, k0 + 1), (w_n, chunk))
        al = jax.lax.dynamic_slice(alive, (0, k0), (h_n, chunk))  # [H, C]
        valid_tail = seg_valid_tail[c]  # [C]

        d1 = r1[:, None, :] - t1[None, :, :]  # [H, W, C]
        d2 = r2[:, None, :] - t2[None, :, :]
        crossing = (d1 * d2 < 0.0) & al[:, None, :] & valid_tail[None, None, :]
        prop = d1 / (d1 - d2)
        seg_idx = (
            jax.lax.broadcasted_iota(jnp.float32, (1, 1, chunk), 2) + jnp.float32(k0)
        )
        cand = jnp.where(crossing, seg_idx + prop, NO_HIT)  # [H, W, C]
        if max_hits == 1:
            new = jnp.minimum(keys[..., 0], jnp.min(cand, axis=-1))
            keys = new[..., None]
        else:
            neg_top, _ = jax.lax.top_k(-cand, max_hits)  # K smallest of chunk
            keys = _merge_topk(keys, -neg_top, max_hits)
        return keys, None

    keys0 = jnp.full((h_n, w_n, max_hits), NO_HIT)
    keys, _ = jax.lax.scan(chunk_body, keys0, jnp.arange(n_chunks))
    return keys


def gather_ray_field(field: jnp.ndarray, h_idx_keys: jnp.ndarray) -> jnp.ndarray:
    """Lerp a per-ray field [H, N+1] at keys [H, W, K] (k + prop).

    Flattened single-take addressing (global index h·(N+1)+k) — one gather
    for all rows beats a vmapped per-row gather on TPU.
    """
    k = jnp.floor(h_idx_keys)
    prop = h_idx_keys - k
    n = field.shape[1]
    ki = jnp.clip(k, 0, n - 2).astype(jnp.int32)
    h = jax.lax.broadcasted_iota(jnp.int32, h_idx_keys.shape, 0)
    base = h * (n - 1) + ki
    # adjacent-pair layout: both lerp endpoints in one 8-byte-row gather
    pairs = jnp.stack([field[:, :-1], field[:, 1:]], axis=-1).reshape(-1, 2)
    row = jnp.take(pairs, base, axis=0)
    return row[..., 0] * (1.0 - prop) + row[..., 1] * prop


def gather_column_field(field: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
    """Lerp a per-column field [W, N_t(,D)] at keys [H, W, K].

    Flattened single-take addressing (global index w·N_t+k); D-channel
    fields gather contiguous D-wide rows, amortizing the random access.
    """
    k = jnp.floor(keys)
    prop = keys - k
    n = field.shape[1]
    ki = jnp.clip(k, 0, n - 2).astype(jnp.int32)
    w = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    base = w * (n - 1) + ki
    # adjacent-pair layout: both lerp endpoints in one contiguous-row gather
    if field.ndim == 3:
        d = field.shape[2]
        pairs = jnp.concatenate(
            [field[:, :-1, :], field[:, 1:, :]], axis=-1
        ).reshape(-1, 2 * d)
        row = jnp.take(pairs, base, axis=0)  # [..., 2D]
        prop = prop[..., None]
        return row[..., :d] * (1.0 - prop) + row[..., d:] * prop
    pairs = jnp.stack([field[:, :-1], field[:, 1:]], axis=-1).reshape(-1, 2)
    row = jnp.take(pairs, base, axis=0)
    return row[..., 0] * (1.0 - prop) + row[..., 1] * prop
