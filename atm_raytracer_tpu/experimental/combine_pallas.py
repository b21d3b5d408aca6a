"""Fused Pallas TPU kernel for first-crossing detection.

The XLA path (ops.combine) materializes [H, W, chunk] difference cubes in
HBM (~34 GB of traffic at 1080p/4000 steps — measured 2.7 s/frame). This
kernel tiles the output [H, W] key map into (TH × TW) VMEM blocks, streams
the march axis as an outer-difference per step entirely in registers/VMEM,
and writes only the [H, W] keys: ~0.8 GB of HBM traffic total.

Ray death (the reference's h < −1000 path truncation, utils.rs:167) is an
explicit per-ray segment bound streamed into the kernel: segment k is only
eligible while k < death_seg[h] (= first dead sample + 1, matching
ops.combine.ray_alive_mask — the segment STARTING at the first dead sample
is still tested). A sample-clobber encoding cannot express this: adjacent
segments share samples, so any constant clobber value either kills the
death-transition segment or fabricates a crossing against terrain on the
other side of the constant (e.g. −1e9 "crosses" bathymetric terrain at
−1500 m that the ray never reached).

Early exit economics (SURVEY §7): a tile whose pixels all found a hit stops
marching — the while-loop predicate checks the running max of the best keys,
so low-elevation tiles (near terrain) finish in a few hundred steps while
sky tiles run the full march.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.combine import DEATH_ALTITUDE, NO_HIT

TILE_H = 64
TILE_W = 256
BLOCK = 128  # march samples per VMEM load; lane-dim slices must be 128-aligned


def _first_crossing_kernel(n_blocks: int, n_seg: int, ray_ref, terr_ref,
                           death_ref, out_ref):
    """ray_ref [TH, 1+S], terr_ref [TW, 1+S]: lane 0 duplicates sample 0, so
    lane s holds march sample s−1 and every BLOCK-wide load is 128-aligned.
    Segment k is tested when its far end (sample k+1, lane k+2) streams in.
    death_ref [TH, 128] replicates each ray's first masked segment index:
    candidates need kf < death (ops.combine.ray_alive_mask semantics).
    """
    th = ray_ref.shape[0]
    tw = terr_ref.shape[0]

    acc0 = jnp.full((th, tw), NO_HIT, jnp.float32)
    d0 = ray_ref[:, 0][:, None] - terr_ref[:, 0][None, :]  # duplicate sample 0
    death = death_ref[:, 0][:, None]  # [TH, 1]

    def cond(state):
        i, acc, _ = state
        # stop when every pixel in the tile has a hit, or the march ends
        return jnp.logical_and(i < n_blocks, jnp.max(acc) == NO_HIT)

    def body(state):
        i, acc, d_prev = state
        k0 = pl.multiple_of(i * BLOCK, BLOCK)
        rblk = ray_ref[:, pl.ds(k0, BLOCK)]  # [TH, B]
        tblk = terr_ref[:, pl.ds(k0, BLOCK)]  # [TW, B]
        k0f = k0.astype(jnp.float32)
        for u in range(BLOCK):
            d_new = rblk[:, u][:, None] - tblk[:, u][None, :]
            crossing = (d_prev * d_new) < 0.0
            kf = k0f + (u - 2)  # lane k0+u = sample k0+u-1, far end of seg k0+u-2
            prop = d_prev / (d_prev - d_new)
            in_range = jnp.logical_and(kf >= 0.0, kf < n_seg)
            alive = kf < death  # [TH, 1] broadcast over columns
            cand = jnp.where(
                jnp.logical_and(jnp.logical_and(crossing, in_range), alive),
                kf + prop, NO_HIT,
            )
            acc = jnp.minimum(acc, cand)
            d_prev = d_new
        return i + 1, acc, d_prev

    # the first block re-tests the duplicated sample 0 (d·d ≥ 0, never a
    # crossing) and the tail overruns n_seg with -1e9/0 padding (no crossings)
    _, acc, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0, d0))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n_seg", "interpret"))
def first_crossing_pallas(
    ray_h: jnp.ndarray,  # [H, N+1] raw march altitudes
    terr_elev: jnp.ndarray,  # [W, N+1]
    n_seg: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """First terrain-crossing key per (ray, column): [H, W, 1] f32."""
    h_n, n_p1 = ray_h.shape
    w_n = terr_elev.shape[0]

    # per-ray death bound: first masked segment = first dead sample + 1
    # (segment j0 starting at the first sub-threshold sample is still
    # tested — utils.rs:159-171 / ops.combine.ray_alive_mask)
    dead = ray_h < DEATH_ALTITUDE
    j0 = jnp.argmax(dead, axis=-1).astype(jnp.float32)
    death_seg = jnp.where(dead.any(-1), j0 + 1.0, jnp.float32(n_seg))

    # shifted layout: lane 0 duplicates sample 0 so BLOCK loads stay aligned
    ray_s = jnp.concatenate([ray_h[:, :1], ray_h], axis=1)
    terr_s = jnp.concatenate([terr_elev[:, :1], terr_elev], axis=1)
    lanes_needed = n_seg + 2  # last segment's far end sits at lane n_seg+1
    n_blocks = -(-lanes_needed // BLOCK)
    pad_n = n_blocks * BLOCK - ray_s.shape[1]
    pad_h = (-h_n) % TILE_H
    pad_w = (-w_n) % TILE_W
    ray_p = jnp.pad(ray_s, ((0, pad_h), (0, max(pad_n, 0))), constant_values=-1e9)
    terr_p = jnp.pad(terr_s, ((0, pad_w), (0, max(pad_n, 0))), constant_values=0.0)
    if pad_n < 0:  # more samples than segments need — crop
        ray_p = ray_p[:, : n_blocks * BLOCK]
        terr_p = terr_p[:, : n_blocks * BLOCK]
    hp, np_ = ray_p.shape
    wp = terr_p.shape[0]
    # replicate to a 128-lane block so the load stays VMEM-tileable; padded
    # rows get bound 0 (their whole output is cropped)
    death_p = jnp.pad(death_seg, (0, pad_h))[:, None] * jnp.ones(
        (1, 128), jnp.float32
    )

    out = pl.pallas_call(
        functools.partial(_first_crossing_kernel, n_blocks, n_seg),
        grid=(hp // TILE_H, wp // TILE_W),
        in_specs=[
            pl.BlockSpec((TILE_H, np_), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_W, np_), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(ray_p, terr_p, death_p)
    return out[:h_n, :w_n, None]


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"
