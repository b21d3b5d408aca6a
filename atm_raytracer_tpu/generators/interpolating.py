"""InterpolatingRectilinear generator: snapped angular grid + 16-case interp.

Reference: src/generator/generators/interpolating_rectilinear.rs — a
rectilinear camera whose pixels are snapped to an (elevation, direction) grid
with step = 1.5 × the minimum per-pixel angular delta (gen_fov_data,
:453-522); grid pixels are memoized behind RwLock HashMaps (:26-108) and each
output pixel bilinearly interpolates its 4 grid corners' trace points with a
16-case presence match (:183-418).

TPU re-shape (SURVEY §2b mechanism 3): the data-dependent memoization becomes
dedup-then-dense — the needed grid indices form a contiguous range, so the
whole grid is computed densely with the same separable machinery as the Fast
generator (one march per grid row, one terrain scan per grid column), then
the interpolation runs as masked vectorized arithmetic over output pixels.

Documented tolerance decisions vs the reference:
* trace-point grouping (collect_trace_points, :213-243) assigns an entry to
  the group of its first matching earlier entry instead of scanning groups in
  creation order — identical except for degenerate scenes with ≥3 mutually
  step-close groups;
* per-pixel output slots are capped at 2×K_grid (the reference's Vec is
  unbounded).
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
from ..ops.composite import composite
from ..ops.objects import ObjectSet
from ..terrain.store import Terrain
from .base import HitBuffer, RenderResult
from .fast import build_refraction_table, separable_hits, terrain_bbox

SCALE = 1.5  # interpolating_rectilinear.rs:454
SEQUENCE = ((0, 0), (0, 1), (1, 0), (1, 1))  # :183


def gen_fov_data(width, height, fov, tilt, direction):
    """(ray_elev [H,W], ray_dir [H,W] radians, min_elev_step, min_dir_step).

    Transcribes gen_fov_data (:453-522): column-wise minimum elevation deltas
    and row-wise direction deltas, clamped below by fov_rad/width/3, times 1.5.
    """
    elev, dirr = camera.rectilinear_ray_params(width, height, fov, tilt, direction)
    min_diff = math.radians(fov) / width / 3.0

    dl_e = np.abs(np.diff(elev, axis=0))
    dl_e = np.maximum(dl_e, min_diff)
    min_elev_step = float(dl_e.min()) * SCALE if height > 1 else min_diff * SCALE

    dl_d = np.abs(np.diff(dirr, axis=1))
    dl_d = np.where(dl_d > 2 * np.pi, dl_d - 2 * np.pi, dl_d)
    dl_d = np.maximum(dl_d, min_diff)
    min_dir_step = float(dl_d.min()) * SCALE if width > 1 else min_diff * SCALE

    return elev, dirr, min_elev_step, min_dir_step


# ---------------------------------------------------------------------------
# TracePoint bundles (dict-of-arrays) + reference lerp semantics
# ---------------------------------------------------------------------------

_SCALARS = ("dlat", "dlon", "distance", "elevation", "path_length")


def _tp_lerp(a: dict, b: dict, coeff: jnp.ndarray) -> dict:
    """TracePoint::interpolate (generators/mod.rs:32-44) incl. the class-aware
    PixelColor::interpolate (mod.rs:68-78)."""
    c = coeff
    out = {f: a[f] * (1.0 - c) + b[f] * c for f in _SCALARS}
    out["normal"] = a["normal"] * (1.0 - c[..., None]) + b["normal"] * c[..., None]
    both_rgba = (a["kind"] == 1) & (b["kind"] == 1)
    both_terr = (a["kind"] == 0) & (b["kind"] == 0)
    out["kind"] = jnp.where(both_rgba, 1, 0).astype(jnp.int32)
    rgb = a["rgba"][..., :3] * (1.0 - c[..., None]) + b["rgba"][..., :3] * c[..., None]
    alpha_lerp = a["rgba"][..., 3] * (1.0 - c) + b["rgba"][..., 3] * c
    alpha = jnp.where(
        both_rgba | both_terr,
        alpha_lerp,
        jnp.where(a["kind"] == 0, a["rgba"][..., 3], b["rgba"][..., 3]),
    )
    out["rgba"] = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    return out


def _tp_where(mask, a, b):
    out = {}
    for f in _SCALARS:
        out[f] = jnp.where(mask, a[f], b[f])
    out["normal"] = jnp.where(mask[..., None], a["normal"], b["normal"])
    out["kind"] = jnp.where(mask, a["kind"], b["kind"])
    out["rgba"] = jnp.where(mask[..., None], a["rgba"], b["rgba"])
    return out


def _tp_zeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def _interp_group(present, corners, rem_elev, rem_dir):
    """The 16-case presence match (interpolating_rectilinear.rs:267-393).

    present: [..., 4] bool (SEQUENCE order); corners: list of 4 TracePoint
    bundles; returns (valid [...], tp bundle).
    """
    e00, e01, e10, e11 = corners
    p00, p01, p10, p11 = (present[..., i] for i in range(4))
    re, rd = rem_elev, rem_dir
    zero = _tp_zeros_like(e00)

    def two_adjacent(a, b, r_elev, r_dir):
        # :339-350 — valid iff r_elev < 0.5; lerp by r_dir
        return (r_elev < 0.5), _tp_lerp(a, b, r_dir)

    def two_diagonal(a, b, r_elev, r_dir):
        # :352-364
        ok = ~(((r_elev >= 0.5) & (r_dir < 0.5)) | ((r_elev < 0.5) & (r_dir >= 0.5)))
        denom = r_elev * r_dir + (1.0 - r_elev) * (1.0 - r_dir)
        coeff = r_elev * r_dir / jnp.maximum(denom, 1e-30)
        return ok, _tp_lerp(a, b, coeff)

    def three(a, b, c, r_elev, r_dir):
        # :366-380
        ok = ~((r_elev >= 0.5) & (r_dir >= 0.5))
        s = 1.0 - r_elev + r_elev * (1.0 - r_dir)
        interp = _tp_lerp(a, b, r_dir)
        return ok, _tp_lerp(interp, c, r_elev * (1.0 - r_dir) / jnp.maximum(s, 1e-30))

    def four(a, b, c, d):
        i1 = _tp_lerp(a, b, rd)
        i2 = _tp_lerp(c, d, rd)
        return jnp.ones_like(rd, bool), _tp_lerp(i1, i2, re)

    # enumerate the 16 presence combinations (index = p00 + 2p01 + 4p10 + 8p11)
    cases = []
    f = jnp.zeros_like(re, bool)
    cases.append((f, zero))  # 0b0000
    cases.append(((re < 0.5) & (rd < 0.5), e00))  # only e00 (:275-281)
    cases.append(((re < 0.5) & (rd >= 0.5), e01))  # only e01
    cases.append(two_adjacent(e00, e01, re, rd))  # e00+e01 (:303)
    cases.append(((re >= 0.5) & (rd < 0.5), e10))  # only e10
    cases.append(two_adjacent(e00, e10, rd, re))  # e00+e10 (:306)
    cases.append(two_diagonal(e01, e10, re, 1.0 - rd))  # e01+e10 (:312)
    cases.append(three(e00, e01, e10, re, rd))  # e00+e01+e10 (:321)
    cases.append(((re >= 0.5) & (rd >= 0.5), e11))  # only e11
    cases.append(two_diagonal(e00, e11, re, rd))  # e00+e11 (:309)
    cases.append(two_adjacent(e01, e11, 1.0 - rd, re))  # e01+e11 (:315)
    cases.append(three(e01, e00, e11, re, 1.0 - rd))  # e00+e01+e11 (:324)
    cases.append(two_adjacent(e10, e11, 1.0 - re, rd))  # e10+e11 (:318)
    cases.append(three(e00, e11, e10, 1.0 - re, rd))  # e00+e10+e11 (:327)
    cases.append(three(e11, e10, e01, 1.0 - re, 1.0 - rd))  # e01+e10+e11 (:330)
    cases.append(four(e00, e01, e10, e11))  # all (:333)

    idx = (
        p00.astype(jnp.int32)
        + 2 * p01.astype(jnp.int32)
        + 4 * p10.astype(jnp.int32)
        + 8 * p11.astype(jnp.int32)
    )
    valid = jnp.zeros_like(re, bool)
    tp = zero
    for code, (ok, cand) in enumerate(cases):
        m = idx == code
        valid = jnp.where(m, ok, valid)
        tp = _tp_where(m, cand, tp)
    return valid, tp


def _interpolate_pixels(grid: HitBuffer, gi, gj, rem_e, rem_d, step_size,
                        k_out: int) -> HitBuffer:
    """Per-output-pixel corner gather + grouping + interpolation.

    grid: HitBuffer [H', W', K]; gi/gj: [H, W] corner indices into the grid;
    rem_e/rem_d: [H, W] fractional positions.
    """
    hp, wp, kg = grid.valid.shape
    e_n = 4 * kg  # entries per pixel, corner-major (SEQUENCE), slot ascending

    def flat(x):
        return x.reshape((hp * wp,) + x.shape[2:])

    def gather_corner(x, ci, cj):
        idx = jnp.clip(ci, 0, hp - 1) * wp + jnp.clip(cj, 0, wp - 1)
        return jnp.take(flat(x), idx, axis=0)

    fields = {
        "valid": grid.valid,
        "dlat": grid.dlat,
        "dlon": grid.dlon,
        "distance": grid.distance,
        "elevation": grid.elevation,
        "path_length": grid.path_length,
        "normal": grid.normal,
        "kind": grid.kind,
        "rgba": grid.rgba,
    }
    # entries [H, W, E, ...]
    ent = {}
    for name, arr in fields.items():
        parts = []
        for (di, dj) in SEQUENCE:
            parts.append(gather_corner(arr, gi + di, gj + dj))
        ent[name] = jnp.concatenate(parts, axis=2)
    in_grid = (
        (gi >= 0) & (gi + 1 < hp) & (gj >= 0) & (gj + 1 < wp)
    )
    ent_valid = ent.pop("valid") & in_grid[..., None]

    # -- grouping (collect_trace_points :213-243) ---------------------------
    root = jnp.full(ent_valid.shape, -1, jnp.int32)
    for e in range(e_n):
        v_e = ent_valid[..., e]
        if e == 0:
            root = root.at[..., 0].set(jnp.where(v_e, 0, -1))
            continue
        best = jnp.full(v_e.shape, e, jnp.int32)  # default: new group
        for ep in range(e - 1, -1, -1):  # scan backward so first match wins
            m = (
                v_e
                & ent_valid[..., ep]
                & (jnp.abs(ent["distance"][..., e] - ent["distance"][..., ep])
                   < step_size)
                & (ent["kind"][..., e] == ent["kind"][..., ep])
            )
            best = jnp.where(m, root[..., ep], best)
        root = root.at[..., e].set(jnp.where(v_e, best, -1))

    # -- per group: last entry per corner + 16-case interpolation -----------
    out_slots = []
    corner_of = np.repeat(np.arange(4), kg)  # entry → corner
    for g in range(e_n):
        member = (root == g) & ent_valid  # [H, W, E]
        present = []
        corner_vals = []
        for c in range(4):
            idxs = [e for e in range(e_n) if corner_of[e] == c]
            pres_c = jnp.zeros(member.shape[:2], bool)
            val_c = {k: jnp.zeros_like(ent[k][..., 0]) if ent[k].ndim == 3
                     else jnp.zeros_like(ent[k][..., 0, :])
                     for k in ent}
            for e in idxs:  # later entries overwrite (match_sequence :245-265)
                m = member[..., e]
                pres_c = pres_c | m
                for kf in ent:
                    if ent[kf].ndim == 3:
                        val_c[kf] = jnp.where(m, ent[kf][..., e], val_c[kf])
                    else:
                        val_c[kf] = jnp.where(
                            m[..., None], ent[kf][..., e, :], val_c[kf]
                        )
            present.append(pres_c)
            corner_vals.append(val_c)
        present = jnp.stack(present, axis=-1)  # [H, W, 4]
        group_exists = present.any(-1)
        ok, tp = _interp_group(present, corner_vals, rem_e, rem_d)
        out_slots.append((group_exists & ok, tp))

    # -- pack groups (creation order) into k_out slots ----------------------
    valid_all = jnp.stack([s[0] for s in out_slots], axis=-1)  # [H, W, E]
    tp_all = {
        kf: jnp.stack([s[1][kf] for s in out_slots], axis=2) for kf in out_slots[0][1]
    }
    # stable order: invalid slots pushed to the end, creation order kept
    order = jnp.argsort(jnp.where(valid_all, 0, 1), axis=-1, stable=True)
    order = order[..., :k_out]
    valid_out = jnp.take_along_axis(valid_all, order, axis=-1)

    def pick(x):
        if x.ndim == 3:
            return jnp.take_along_axis(x, order, axis=-1)
        return jnp.take_along_axis(x, order[..., None], axis=2)

    rank = jnp.cumsum(valid_out.astype(jnp.float32), axis=-1)
    return HitBuffer(
        valid=valid_out,
        key=jnp.where(valid_out, rank, jnp.inf),
        dlat=pick(tp_all["dlat"]),
        dlon=pick(tp_all["dlon"]),
        distance=pick(tp_all["distance"]),
        elevation=pick(tp_all["elevation"]),
        path_length=pick(tp_all["path_length"]),
        normal=pick(tp_all["normal"]),
        kind=pick(tp_all["kind"]),
        rgba=pick(tp_all["rgba"]),
    )


def interpolating_core(
    pack, table, objects, grid_elev_deg, grid_az_deg, gi, gj, rem_e, rem_d,
    alt0, *,
    model, shape, straight, step, n_terr, max_hits, lat0, lon0,
    coloring, fog_distance, terrain_alpha,
):
    grid = separable_hits(
        pack, table, objects, grid_elev_deg, grid_az_deg, alt0,
        model=model, shape=shape, straight=straight, step=step, n_terr=n_terr,
        max_hits=max_hits, lat0=lat0, lon0=lon0, terrain_alpha=terrain_alpha,
    )
    hits = _interpolate_pixels(grid, gi, gj, rem_e, rem_d, step, 2 * grid.k_slots)
    image = composite(
        coloring, fog_distance,
        hits.valid, hits.rgba[..., 3], hits.distance, hits.elevation,
        hits.path_length, hits.normal, hits.kind, hits.rgba[..., :3],
    )
    return image, hits


_interp_device = functools.partial(
    jax.jit,
    static_argnames=(
        "model", "shape", "straight", "step", "n_terr", "max_hits", "lat0",
        "lon0", "coloring", "fog_distance", "terrain_alpha",
    ),
)(interpolating_core)


def render_interpolating(
    params: Params, terrain: Terrain, max_hits: Optional[int] = None
) -> RenderResult:
    """Full InterpolatingRectilinear render (:110-161)."""
    out = params.output
    frame = params.view.frame
    pos = params.view.position
    alt0 = pos.abs_altitude(terrain)

    elev, dirr, min_es, min_ds = gen_fov_data(
        out.width, out.height, frame.fov, frame.tilt, frame.direction
    )
    ei_f = elev / min_es
    dj_f = dirr / min_ds
    gi_abs = np.floor(ei_f).astype(np.int64)
    gj_abs = np.floor(dj_f).astype(np.int64)
    rem_e = (ei_f - gi_abs).astype(np.float32)
    rem_d = (dj_f - gj_abs).astype(np.float32)
    i_min, i_max = int(gi_abs.min()), int(gi_abs.max()) + 1
    j_min, j_max = int(gj_abs.min()), int(gj_abs.max()) + 1
    grid_elev_deg = np.rad2deg(np.arange(i_min, i_max + 1) * min_es)
    grid_az_deg = np.rad2deg(np.arange(j_min, j_max + 1) * min_ds)

    lat_rng, lon_rng = terrain_bbox(params)
    pack = terrain.pack(lat_rng, lon_rng)
    table = build_refraction_table(params, alt0)
    n_terr = int(math.ceil(frame.max_distance / params.simulation_step))
    if max_hits is None:
        max_hits = 2 if params.terrain_alpha >= 1.0 else 4
    objset = ObjectSet.build(params, terrain) if params.objects else None

    image, hits = _interp_device(
        pack, table, objset,
        jnp.asarray(grid_elev_deg, jnp.float32),
        jnp.asarray(grid_az_deg, jnp.float32),
        jnp.asarray(gi_abs - i_min, jnp.int32),
        jnp.asarray(gj_abs - j_min, jnp.int32),
        jnp.asarray(rem_e),
        jnp.asarray(rem_d),
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

    # ResultPixel angles: bilinear of the 4 corner grid angles (:408-415)
    corner_e = (gi_abs[..., None] + np.array([0, 0, 1, 1])) * min_es
    corner_d = (gj_abs[..., None] + np.array([0, 1, 0, 1])) * min_ds
    wts = np.stack(
        [
            (1 - rem_e) * (1 - rem_d),
            (1 - rem_e) * rem_d,
            rem_e * (1 - rem_d),
            rem_e * rem_d,
        ],
        axis=-1,
    )
    elev_out = np.rad2deg((corner_e * wts).sum(-1))
    az_out = np.rad2deg((corner_d * wts).sum(-1))
    az_out = camera.wrap_azimuth_deg(az_out)

    return RenderResult(
        # flat fetch: [H, W, 3] u8 de-tiles on device otherwise
        image=np.asarray(image.reshape(-1)).reshape(image.shape),
        hits=hits,  # device-resident; see generators.fast note
        elevation_deg=elev_out,
        azimuth_deg=az_out,
        observer=(pos.latitude, pos.longitude, alt0),
    )
