"""Scene objects: frustum + billboard intersection, culling, hit merging.

Re-implements the reference's ``Object`` trait (src/object/mod.rs:217-226)
and its two impls — analytic segment-vs-cone-frustum (src/object/frustum.rs)
and textured billboard (src/object/billboard.rs) — as dense vmapped segment
tests over culled candidate windows.

Reference control flow being replaced: per terrain point, ``objects_close``
collects indices of objects whose cartesian distance² < 2·(r+step)²
(frustum.rs:103-114, billboard.rs:68-78, gathered in utils.rs:71-89); per
march segment, each close object's ``check_collision`` runs on the segment
endpoints (utils.rs:241-279). Here each object gets a static
(column-window × step-window) around its culling region, every (ray ×
window-segment) test runs in lockstep, and per-pixel results reduce to the K
earliest hits.

Geometry runs in each object's local ENU frame (models.earth.enu_rel):
mm-accurate in f32 within culling radii, and the frame's up vector IS the
reference's ``v = world_directions(...).2`` (frustum.rs:31-34). Normals are
rotated back to global cartesian with the object's host-precomputed basis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.earth import EarthModel
from .combine import NO_HIT
from ..generators.base import HitBuffer


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ObjectSet:
    """Host-built, device-resident object arrays (one entry per object)."""

    kind: jnp.ndarray  # [n] int32: 0 frustum, 1 billboard
    dlat: jnp.ndarray  # [n] f32 relative to observer
    dlon: jnp.ndarray
    elev: jnp.ndarray  # [n] absolute altitude of the object base
    r1: jnp.ndarray
    r2: jnp.ndarray
    height: jnp.ndarray
    width: jnp.ndarray
    rgba: jnp.ndarray  # [n, 4]
    basis: jnp.ndarray  # [n, 3, 3] rows = (east, north, up) global cartesian
    tex_id: jnp.ndarray  # [n] int32, -1 = untextured
    textures: jnp.ndarray  # [T, TH, TW, 4] f32 atlas (T ≥ 1)
    tex_hw: jnp.ndarray  # [T, 2] f32 true (h, w) of each texture
    cull_r2: jnp.ndarray  # [n] culling radius², includes sim step
    # static python metadata
    n_objects: int
    seg_window: int  # march-steps window (covers the culling chord)
    kinds_static: tuple  # per-object kind (0 frustum / 1 billboard), static

    def tree_flatten(self):
        children = (
            self.kind, self.dlat, self.dlon, self.elev, self.r1, self.r2,
            self.height, self.width, self.rgba, self.basis, self.tex_id,
            self.textures, self.tex_hw, self.cull_r2,
        )
        return children, (self.n_objects, self.seg_window, self.kinds_static)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_objects=aux[0], seg_window=aux[1],
                   kinds_static=aux[2])

    @staticmethod
    def build(params, terrain) -> Optional["ObjectSet"]:
        objs = params.objects
        if not objs:
            return None
        lat0 = params.view.position.latitude
        lon0 = params.view.position.longitude
        step = params.simulation_step
        n = len(objs)
        kind = np.zeros(n, np.int32)
        dlat = np.zeros(n, np.float32)
        dlon = np.zeros(n, np.float32)
        elev = np.zeros(n, np.float32)
        r1 = np.zeros(n, np.float32)
        r2 = np.zeros(n, np.float32)
        height = np.zeros(n, np.float32)
        width = np.zeros(n, np.float32)
        rgba = np.zeros((n, 4), np.float32)
        basis = np.zeros((n, 3, 3), np.float32)
        tex_id = np.full(n, -1, np.int32)
        cull_r2 = np.zeros(n, np.float32)
        textures: List[np.ndarray] = []
        for i, o in enumerate(objs):
            kind[i] = 0 if o.kind == "Frustum" else 1
            dlat[i] = o.lat - lat0
            dlon[i] = o.lon - lon0
            elev[i] = o.elev
            r1[i], r2[i] = o.r1, o.r2
            height[i] = o.height
            width[i] = o.width
            rgba[i] = (o.color.r, o.color.g, o.color.b, o.color.a)
            north, east, up = params.model.world_directions(o.lat, o.lon)
            basis[i] = np.stack([east, north, up])
            if o.kind == "Frustum":
                r = max(o.r1, o.r2)
                cull_r2[i] = 2.0 * (r + step) ** 2  # frustum.rs:113
            else:
                cull_r2[i] = 2.0 * (o.width + step) ** 2  # billboard.rs:77
            if o.texture is not None:
                tex_id[i] = len(textures)
                textures.append(o.texture.astype(np.float32))
        if textures:
            th = max(t.shape[0] for t in textures)
            tw = max(t.shape[1] for t in textures)
            atlas = np.zeros((len(textures), th, tw, 4), np.float32)
            tex_hw = np.zeros((len(textures), 2), np.float32)
            for t_i, t in enumerate(textures):
                atlas[t_i, : t.shape[0], : t.shape[1]] = t
                tex_hw[t_i] = (t.shape[0], t.shape[1])
        else:
            atlas = np.zeros((1, 2, 2, 4), np.float32)
            tex_hw = np.ones((1, 2), np.float32) * 2
        # window of march segments covering the culling chord: the close
        # region along a ray is at most 2·cull_radius long
        max_chord = 2.0 * math.sqrt(float(cull_r2.max()))
        seg_window = int(min(64, max(4, math.ceil(max_chord / step) + 3)))
        return ObjectSet(
            kind=jnp.asarray(kind), dlat=jnp.asarray(dlat), dlon=jnp.asarray(dlon),
            elev=jnp.asarray(elev), r1=jnp.asarray(r1), r2=jnp.asarray(r2),
            height=jnp.asarray(height), width=jnp.asarray(width),
            rgba=jnp.asarray(rgba), basis=jnp.asarray(basis),
            tex_id=jnp.asarray(tex_id), textures=jnp.asarray(atlas),
            tex_hw=jnp.asarray(tex_hw), cull_r2=jnp.asarray(cull_r2),
            n_objects=n, seg_window=seg_window,
            kinds_static=tuple(int(k) for k in kind),
        )


def _sample_texture(textures, tex_hw, tex_id, u, v):
    """Bilinear RGBA texture sample (object/mod.rs:89-118).

    u ∈ [0,1] across width, v ∈ [0,1] bottom→top; image rows are top-first.
    """
    t = jnp.maximum(tex_id, 0)
    th = tex_hw[t, 0]
    tw = tex_hw[t, 1]
    x = u * tw - 0.5
    x1 = jnp.clip(jnp.floor(x), 0.0, tw - 2.0)
    y = (1.0 - v) * th - 0.5
    y1 = jnp.clip(jnp.floor(y), 0.0, th - 2.0)
    px = (x - x1)[..., None]
    py = (y - y1)[..., None]
    ix = x1.astype(jnp.int32)
    iy = y1.astype(jnp.int32)
    tt, hh, ww, _ = textures.shape
    flat = textures.reshape(-1, 4)
    base = t * (hh * ww) + iy * ww + ix
    p00 = jnp.take(flat, base, axis=0)
    p01 = jnp.take(flat, base + ww, axis=0)
    p10 = jnp.take(flat, base + 1, axis=0)
    p11 = jnp.take(flat, base + ww + 1, axis=0)
    return (
        p00 * (1 - px) * (1 - py)
        + p01 * (1 - px) * py
        + p10 * px * (1 - py)
        + p11 * px * py
    )


def _frustum_hits(p1, p2, r1, r2, height):
    """Segment-vs-frustum (frustum.rs:17-101) in the object frame (v = ẑ).

    p1, p2: [..., 3]. Returns (props [..., 4], normals [..., 4, 3],
    valid [..., 4]): two side roots + bottom/top caps.
    """
    w = p2 - p1
    wsq = (w * w).sum(-1)
    p1sq = (p1 * p1).sum(-1)
    p1v = p1[..., 2]
    p1w = (p1 * w).sum(-1)
    wv = w[..., 2]
    aa = (r2 - r1) / height
    aa1 = 1.0 + aa * aa
    a = wsq - wv * wv * aa1
    b = 2.0 * (p1w - wv * (p1v * aa1 + aa * r1))
    c = p1sq - p1v * p1v * aa1 - r1 * r1 - 2.0 * aa * r1 * p1v
    delta = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    safe_a = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    x1 = (-b - sq) / (2.0 * safe_a)
    x2 = (-b + sq) / (2.0 * safe_a)
    lo = jnp.where(a < 0.0, x2, x1)  # frustum.rs:56
    hi = jnp.where(a < 0.0, x1, x2)

    def side(x):
        inter = p1 + w * x[..., None]
        h = inter[..., 2]
        ok = (delta >= 0.0) & (x >= 0.0) & (x < 1.0) & (h >= 0.0) & (h < height)
        outward = inter - h[..., None] * jnp.array([0.0, 0.0, 1.0])
        olen = jnp.sqrt((outward * outward).sum(-1))
        outward = outward / jnp.maximum(olen, 1e-30)[..., None]
        ang = jnp.arctan2(r1 - r2, height)
        normal = outward * jnp.cos(ang) + jnp.array([0.0, 0.0, 1.0]) * jnp.sin(ang)
        return x, normal, ok

    def cap(h_cap, r_cap, n_sign):
        safe_wv = jnp.where(jnp.abs(wv) < 1e-12, 1e-12, wv)
        x = (h_cap - p1v) / safe_wv
        out = p1 + w * x[..., None] - h_cap * jnp.array([0.0, 0.0, 1.0])
        d = (out * out).sum(-1)
        ok = (d < r_cap * r_cap) & (x >= 0.0) & (x < 1.0)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]) * n_sign, out.shape)
        return x, normal, ok

    xs1, n1, ok1 = side(lo)
    xs2, n2, ok2 = side(hi)
    xc1, nc1, okc1 = cap(0.0, r1, -1.0)
    xc2, nc2, okc2 = cap(height, r2, 1.0)
    props = jnp.stack([xs1, xs2, xc1, xc2], axis=-1)
    normals = jnp.stack([n1, n2, nc1, nc2], axis=-2)
    valid = jnp.stack([ok1, ok2, okc1, okc2], axis=-1)
    return props, normals, valid


def _billboard_hit(p1, p2, width, height):
    """Segment-vs-billboard (billboard.rs:17-66): upright rectangle always
    facing the ray. Returns (prop, normal [...,3], u, v, valid)."""
    ray = p2 - p1
    up = jnp.array([0.0, 0.0, 1.0])
    right = jnp.cross(ray, jnp.broadcast_to(up, ray.shape))
    rlen = jnp.sqrt((right * right).sum(-1))
    right = right / jnp.maximum(rlen, 1e-30)[..., None]
    front = jnp.cross(right, jnp.broadcast_to(up, right.shape))
    denom = (ray * front).sum(-1)
    safe = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    prop = -(p1 * front).sum(-1) / safe
    inter = p1 + ray * prop[..., None]
    y = inter[..., 2]
    x = (inter * right).sum(-1)
    ok = (
        (prop >= 0.0) & (prop < 1.0)
        & (y >= 0.0) & (y < height)
        & (x >= -width / 2.0) & (x < width / 2.0)
    )
    u = (x + width / 2.0) / width
    v = y / height
    return prop, front, u, v, ok


def object_hits_fast(
    objects: ObjectSet,
    model: EarthModel,
    lat0: float,
    lon0: float,
    step: float,
    ray_h: jnp.ndarray,  # [H, N]
    path_len: jnp.ndarray,  # [H, N]
    dlat: jnp.ndarray,  # [W, N] terrain-cache geodesic (observer-relative)
    dlon: jnp.ndarray,  # [W, N]
    k_per_object: int = 2,
) -> HitBuffer:
    """Hits of all objects against the separable (row-ray × column) grid.

    For each object: find per column the first march step inside its culling
    radius (utils.rs:74-80 semantics), test a static window of
    ``objects.seg_window`` segments from there for every row-ray, and keep the
    ``k_per_object`` earliest hits per pixel; objects merge sequentially.
    """
    h_n, n_path = ray_h.shape
    w_n, n_t = dlat.shape
    kw = objects.seg_window
    shape_radius = None
    shp = model.to_shape()

    parts = []
    for oi in range(objects.n_objects):
        o_dlat = objects.dlat[oi]
        o_dlon = objects.dlon[oi]
        o_elev = objects.elev[oi]
        # culling: horizontal distance² at the object's altitude
        # (frustum.rs:103-114): enu of terrain points w/ elev = object elev
        rel = model.enu_rel(
            dlat, dlon, jnp.broadcast_to(o_elev, dlat.shape),
            o_dlat, o_dlon, o_elev, lat0,
        )  # [W, N, 3]
        d2 = (rel * rel).sum(-1)
        close = d2 < objects.cull_r2[oi]  # [W, N]
        any_close = close.any(axis=1)
        first_k = jnp.where(any_close, jnp.argmax(close, axis=1), n_t)
        # window starts one step early (segment (k-1, k) also sees the object
        # via its far end — utils.rs:241-250 checks old OR new point)
        k_lo = jnp.clip(first_k - 1, 0, max(n_t - kw - 1, 0))  # [W]

        # gather window geodesic points per column: [W, kw+1]
        offs = jnp.arange(kw + 1)
        k_idx = jnp.minimum(k_lo[:, None] + offs[None, :], n_t - 1)
        g_dlat = jnp.take_along_axis(dlat, k_idx, axis=1)
        g_dlon = jnp.take_along_axis(dlon, k_idx, axis=1)
        g_close = jnp.take_along_axis(close, k_idx, axis=1)
        # horizontal components of enu_rel don't depend on the ray height
        # beyond the tiny radial factor; compute full rel per (h, w, j):
        # [H, W, kw+1, 3] is too big in one piece for huge frames, but the
        # windows keep it ~H·W·kw — chunk over W if needed.
        # ray altitude at the window steps: ONE take of ray_h's columns at
        # the [W·(kw+1)] window indices — never broadcast the [H, W, N] cube
        # (a broadcast+take_along there cost ~10× the whole object pass)
        rh = jnp.take(
            ray_h, jnp.minimum(k_idx.reshape(-1), n_path - 1), axis=1
        ).reshape(h_n, w_n, kw + 1)
        p = model.enu_rel(
            jnp.broadcast_to(g_dlat[None], rh.shape),
            jnp.broadcast_to(g_dlon[None], rh.shape),
            rh,
            o_dlat, o_dlon, o_elev, lat0,
        )  # [H, W, kw+1, 3]
        # materialize: without the barrier XLA remats this trig-heavy chain
        # into every consumer of the intersection math (~8× recompute, was
        # 13.9 s of a 14.5 s objects frame in one fused loop)
        p = jax.lax.optimization_barrier(p)
        p1 = p[..., :-1, :]
        p2 = p[..., 1:, :]
        # segment eligible if either end close (utils.rs:241-250)
        seg_close = g_close[..., :-1] | g_close[..., 1:]  # [W, kw]
        seg_k = (k_idx[:, :-1]).astype(jnp.float32)  # [W, kw] global seg idx

        is_frustum = objects.kinds_static[oi] == 0
        if is_frustum:
            props, normals_loc, valid = _frustum_hits(
                p1, p2, objects.r1[oi], objects.r2[oi], objects.height[oi]
            )  # [..., kw, 4], [..., kw, 4, 3]
            rgba = jnp.broadcast_to(objects.rgba[oi], props.shape + (4,))
        else:
            prop, front, u, v, ok = _billboard_hit(
                p1, p2, objects.width[oi], objects.height[oi]
            )
            texed = _sample_texture(
                objects.textures, objects.tex_hw, objects.tex_id[oi], u, v
            )
            has_tex = objects.tex_id[oi] >= 0
            rgba1 = jnp.where(has_tex, texed, jnp.broadcast_to(objects.rgba[oi], texed.shape))
            props = prop[..., None]
            normals_loc = front[..., None, :]
            valid = ok[..., None]
            rgba = rgba1[..., None, :]

        valid = valid & seg_close[None, :, :, None]
        # skip fully transparent texels (utils.rs:258-259)
        valid = valid & (rgba[..., 3] > 0.0)
        keys = jnp.where(
            valid, seg_k[None, :, :, None] + jnp.clip(props, 0.0, 0.999999), NO_HIT
        )  # [H, W, kw, n_sub]
        keys_flat = keys.reshape(h_n, w_n, -1)
        neg_top, top_idx = jax.lax.top_k(-keys_flat, k_per_object)
        sel_keys = -neg_top  # [H, W, Kp] ascending
        flat_n = keys_flat.shape[-1]
        normals_flat = normals_loc.reshape(h_n, w_n, flat_n, 3)
        rgba_flat = rgba.reshape(h_n, w_n, flat_n, 4)
        sel_norm_loc = jnp.take_along_axis(
            normals_flat, top_idx[..., None], axis=2
        )
        sel_rgba = jnp.take_along_axis(rgba_flat, top_idx[..., None], axis=2)
        sel_valid = jnp.isfinite(sel_keys)
        # rotate normals to global cartesian
        sel_norm = jnp.einsum("hwkc,cd->hwkd", sel_norm_loc, objects.basis[oi])

        # TracePoint fields at the hit (utils.rs:261-273): lat/lon/dist/
        # path_length lerped along the march; elevation = RAY elevation.
        safe = jnp.where(sel_valid, sel_keys, 0.0)
        from .combine import gather_column_field, gather_ray_field

        hb = HitBuffer(
            valid=sel_valid,
            key=sel_keys,
            dlat=gather_column_field(dlat, safe),
            dlon=gather_column_field(dlon, safe),
            distance=safe * jnp.float32(step),
            elevation=gather_ray_field(ray_h, safe),
            path_length=gather_ray_field(path_len, safe),
            normal=sel_norm,
            kind=jnp.ones(sel_keys.shape, jnp.int32),
            rgba=sel_rgba,
        )
        parts.append(hb)
    # concatenate only — the caller's single merge_hits selects the global
    # earliest slots (per-object incremental merges cost ~10 gather passes
    # per object on TPU)
    return concat_hits(parts)


def object_hits_pixelwise(
    objects: ObjectSet,
    model: EarthModel,
    lat0: float,
    lon0: float,
    step: float,
    n_terr: int,
    ray_h: jnp.ndarray,  # [P, n_terr] per-pixel ray altitudes
    path_len: jnp.ndarray,  # [P, n_terr]
    dir_deg: jnp.ndarray,  # [P] per-pixel azimuth (degrees)
    k_per_object: int = 2,
) -> HitBuffer:
    """Object hits for P independent rays (Rectilinear generator).

    Same semantics as object_hits_fast, but each pixel owns its geodesic:
    the culling window start is found by a coarse closed-form distance scan
    (the object's along-track window is tiny, so the scan runs at 4× the
    march step), then ``seg_window`` segments are tested exactly.
    """
    p_n, n_path = ray_h.shape
    stride = 4
    # the coarse scan (with its stride·step margin) can flag up to `margin`
    # before the true close region, so the exact window spans the margin on
    # both sides plus the close-region chord
    kw = objects.seg_window + 2 * stride + 2
    dir_col = dir_deg[:, None]

    parts = []
    for oi in range(objects.n_objects):
        o_dlat = objects.dlat[oi]
        o_dlon = objects.dlon[oi]
        o_elev = objects.elev[oi]
        n_coarse = -(-n_terr // stride)
        dists_c = (jnp.arange(n_coarse, dtype=jnp.float32) * stride) * step
        dl_c, dn_c = model.geodesic_delta(lat0, lon0, dir_col, dists_c[None, :])
        rel_c = model.enu_rel(
            dl_c, dn_c, jnp.broadcast_to(o_elev, dl_c.shape),
            o_dlat, o_dlon, o_elev, lat0,
        )
        # widen the coarse test so a stride can't step over the close region
        margin = jnp.float32(stride * step)
        d2_c = rel_c[..., 0] ** 2 + rel_c[..., 1] ** 2 + rel_c[..., 2] ** 2
        close_c = d2_c < (jnp.sqrt(objects.cull_r2[oi]) + margin) ** 2
        any_close = close_c.any(axis=1)
        first_c = jnp.where(any_close, jnp.argmax(close_c, axis=1), n_coarse)
        k_lo = jnp.clip(first_c * stride - stride - 1, 0, max(n_terr - kw - 2, 0))

        offs = jnp.arange(kw + 1)
        k_idx = jnp.minimum(k_lo[:, None] + offs[None, :], n_terr - 1)  # [P, kw+1]
        dists_w = k_idx.astype(jnp.float32) * step
        dl_w, dn_w = model.geodesic_delta(lat0, lon0, dir_col, dists_w)
        rh = jnp.take_along_axis(ray_h, k_idx, axis=1)  # [P, kw+1]
        p = model.enu_rel(dl_w, dn_w, rh, o_dlat, o_dlon, o_elev, lat0)
        p1, p2 = p[..., :-1, :], p[..., 1:, :]
        # exact culling at the window points (terrain-point test at obj elev)
        rel_w = model.enu_rel(
            dl_w, dn_w, jnp.broadcast_to(o_elev, dl_w.shape),
            o_dlat, o_dlon, o_elev, lat0,
        )
        d2_w = (rel_w * rel_w).sum(-1)
        g_close = d2_w < objects.cull_r2[oi]
        seg_close = g_close[..., :-1] | g_close[..., 1:]
        seg_k = k_idx[:, :-1].astype(jnp.float32)

        if objects.kinds_static[oi] == 0:
            props, normals_loc, valid = _frustum_hits(
                p1, p2, objects.r1[oi], objects.r2[oi], objects.height[oi]
            )  # [P, kw, 4]
            rgba = jnp.broadcast_to(objects.rgba[oi], props.shape + (4,))
        else:
            prop, front, u, v, ok = _billboard_hit(
                p1, p2, objects.width[oi], objects.height[oi]
            )
            texed = _sample_texture(
                objects.textures, objects.tex_hw, objects.tex_id[oi], u, v
            )
            has_tex = objects.tex_id[oi] >= 0
            rgba1 = jnp.where(
                has_tex, texed, jnp.broadcast_to(objects.rgba[oi], texed.shape)
            )
            props = prop[..., None]
            normals_loc = front[..., None, :]
            valid = ok[..., None]
            rgba = rgba1[..., None, :]

        valid = valid & seg_close[..., None] & (rgba[..., 3] > 0.0)
        keys = jnp.where(
            valid, seg_k[..., None] + jnp.clip(props, 0.0, 0.999999), NO_HIT
        ).reshape(p_n, -1)
        neg_top, top_idx = jax.lax.top_k(-keys, k_per_object)
        sel_keys = -neg_top
        flat_n = keys.shape[-1]
        sel_norm_loc = jnp.take_along_axis(
            normals_loc.reshape(p_n, flat_n, 3), top_idx[..., None], axis=1
        )
        sel_rgba = jnp.take_along_axis(
            rgba.reshape(p_n, flat_n, 4), top_idx[..., None], axis=1
        )
        sel_valid = jnp.isfinite(sel_keys)
        sel_norm = jnp.einsum("pkc,cd->pkd", sel_norm_loc, objects.basis[oi])

        from .combine import gather_ray_field

        safe = jnp.where(sel_valid, sel_keys, 0.0)
        kk = jnp.floor(safe)
        pp = safe - kk
        dl1, dn1 = model.geodesic_delta(lat0, lon0, dir_col, kk * step)
        dl2, dn2 = model.geodesic_delta(lat0, lon0, dir_col, (kk + 1.0) * step)
        hb = HitBuffer(
            valid=sel_valid,
            key=sel_keys,
            dlat=dl1 * (1 - pp) + dl2 * pp,
            dlon=dn1 * (1 - pp) + dn2 * pp,
            distance=safe * jnp.float32(step),
            elevation=gather_ray_field(ray_h, safe),
            path_length=gather_ray_field(path_len, safe),
            normal=sel_norm,
            kind=jnp.ones(sel_keys.shape, jnp.int32),
            rgba=sel_rgba,
        )
        parts.append(hb)
    return concat_hits(parts)  # caller's merge_hits orders the union


def concat_hits(parts) -> HitBuffer:
    """Concatenate hit buffers along the slot axis (NO ordering)."""
    import jax

    return jax.tree.map(
        lambda *xs: jnp.concatenate(
            xs, axis=-2 if xs[0].ndim == parts[0].valid.ndim + 1 else -1
        ),
        *parts,
    )


def merge_hits(a: HitBuffer, b: HitBuffer, k_out: int) -> HitBuffer:
    """Merge two hit buffers (shape [..., K(,D)]), keep k_out earliest by key.

    Sort-free: argsort + per-field take_along_axis lower to per-lane gathers
    on TPU — chained per scene object they once cost ~14 s of a 0.5 s frame.
    Instead the k_out keys come from successive masked mins
    (combine.k_smallest; inputs need NOT be pre-sorted) and every payload
    field re-pairs by equality one-hot multiply-sum — pure VPU arithmetic.
    Duplicate +inf keys carry zero payload and are guarded by the match
    count; duplicate finite keys (two surfaces at the exact same float key)
    average, where the old argsort picked one arbitrarily.
    """
    from .combine import k_smallest

    def cat(x, y, vec=False):
        return jnp.concatenate([x, y], axis=-2 if vec else -1)

    keys_all = jnp.where(cat(a.valid, b.valid), cat(a.key, b.key), NO_HIT)
    skeys = k_smallest(keys_all, k_out)  # [..., k_out]
    oh = (keys_all[..., None, :] == skeys[..., :, None]).astype(jnp.float32)
    matches = jnp.maximum(oh.sum(-1), 1.0)  # [..., k_out]

    def pick(xa, xb):
        return jnp.sum(cat(xa, xb)[..., None, :] * oh, axis=-1) / matches

    def pick_vec(xa, xb):
        allv = cat(xa, xb, vec=True)  # [..., K_all, D]
        return (
            jnp.einsum("...ks,...sd->...kd", oh, allv)
            / matches[..., None]
        )

    return HitBuffer(
        valid=jnp.isfinite(skeys),
        key=skeys,
        dlat=pick(a.dlat, b.dlat),
        dlon=pick(a.dlon, b.dlon),
        distance=pick(a.distance, b.distance),
        elevation=pick(a.elevation, b.elevation),
        path_length=pick(a.path_length, b.path_length),
        normal=pick_vec(a.normal, b.normal),
        kind=jnp.rint(
            pick(a.kind.astype(jnp.float32), b.kind.astype(jnp.float32))
        ).astype(jnp.int32),
        rgba=pick_vec(a.rgba, b.rgba),
    )
