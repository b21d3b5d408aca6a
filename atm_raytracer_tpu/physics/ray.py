"""Batched fixed-step ray marching of the atmospheric-refraction ODE.

Re-implements the propagation half of the ``atm-refraction`` crate:
``Environment::cast_ray_stepper(alt, elev_rad, straight)`` with
``set_step_size(step)`` yielding ``RayState{x, h, dh}`` (reference call sites
src/generator/generators/utils.rs:142-171, src/ray_path.rs:71-95), for
``EarthShape::{Flat, Spherical{radius}}``.

Instead of a per-ray iterator, all rays march in lockstep: a ``lax.scan`` over
N fixed steps carrying state vectors of shape [B] (one lane per ray). The
x-coordinate advances by exactly ``step`` per iteration, so it never needs to
be materialized — ``x_k = k * step``.

Coordinates and ODE (derived from Fermat's principle for a stratified
atmosphere; see tests/test_ray.py for the analytic oracles):

* Flat shape: x = horizontal distance, h = altitude.
      h'' = l(h) (1 + h'^2),          l(h) = d(ln n)/dh
  straight rays: h'' = 0 (exact straight line).
* Spherical shape of radius R: x = arc length along the r=R surface
  (this matches the reference's path-length correction ``calc_dist``
  src/generator/generators/utils.rs:42-53, which scales dx by (h+R)/R),
  h = altitude above the surface. With u = 1 + h/R:
      h'' = l(h) (u^2 + h'^2) + (u^2 + 2 h'^2) / (u R)
  straight rays drop the l(h) term (a straight chord expressed in curved
  coordinates — validated against the closed-form line-vs-circle geometry).

Initial conditions for elevation angle e (radians, from the local horizontal):
  flat:      h' = tan(e)
  spherical: h' = (1 + h0/R) tan(e)   (dh per unit *surface* arc)

Integrator: classic RK4 with fixed step dx = simulation_step, matching the
reference's accuracy knob (README.md:219-222). l(h) comes from a uniform-grid
lookup table (f32) built on host from the f64 atmosphere — small enough for
VMEM (~10k entries for a 10 km altitude span at 1 m spacing).

Path length: accumulated exactly like the reference's ``calc_dist``
(utils.rs:42-53): flat sqrt(dx²+dh²); spherical scales dx by (h_avg+R)/R.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .atmosphere import Atmosphere


@dataclasses.dataclass(frozen=True)
class EarthShape:
    """Physics shape: flat or sphere (``EarthShape`` in the reference crate,
    produced by ``EarthModel::to_shape`` src/utils/earth_model/mod.rs:95-112)."""

    radius: Optional[float]  # None = Flat

    @property
    def is_flat(self) -> bool:
        return self.radius is None


FLAT = EarthShape(None)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RefractionTable:
    """Uniform-grid table of l(h) = d(ln n)/dh, device-resident (f32).

    ``h0 + i*dh`` for i in [0, n). Queries clamp to the table range (the
    atmosphere model extends smoothly; rays below h0 or above the top use the
    boundary value — choose the range generously via ``build``).
    """

    h0: jnp.ndarray  # scalar f32
    inv_dh: jnp.ndarray  # scalar f32
    values: jnp.ndarray  # [n] f32
    pairs: jnp.ndarray  # [n-1, 2] f32: (values[i], values[i+1]) — one-take lerp

    def tree_flatten(self):
        return (self.h0, self.inv_dh, self.values, self.pairs), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def build(
        atm: Atmosphere,
        wavelength: float,
        h_lo: float = -2000.0,
        h_hi: float = 20000.0,
        dh: float = 1.0,
    ) -> "RefractionTable":
        hs = np.arange(h_lo, h_hi + dh, dh, dtype=np.float64)
        vals = atm.dlnn_dh(hs, wavelength).astype(np.float32)
        pairs = np.stack([vals[:-1], vals[1:]], axis=-1)
        return RefractionTable(
            h0=jnp.float32(h_lo),
            inv_dh=jnp.float32(1.0 / dh),
            values=jnp.asarray(vals),
            pairs=jnp.asarray(pairs),
        )

    def lookup(self, h: jnp.ndarray) -> jnp.ndarray:
        """Linear interpolation of l(h); clamps outside the grid.

        Both cell ends come from ONE gather of the adjacent-pair table —
        gather launches, not bytes, bound the march's inner loop.
        """
        t = (h - self.h0) * self.inv_dh
        n = self.values.shape[0]
        t = jnp.clip(t, 0.0, float(n - 1))
        # clamp the base index to n-2 (not via the float clip: for large n
        # the f32 "n - 1 - eps" rounds back up to n - 1, and the i+1 tap
        # would gather out of bounds — NaN under jnp.take's fill mode)
        i = jnp.minimum(jnp.floor(t).astype(jnp.int32), n - 2)
        f = t - i.astype(t.dtype)
        row = jnp.take(self.pairs, i, axis=0)  # [..., 2]
        return row[..., 0] * (1.0 - f) + row[..., 1] * f


def _acceleration(
    h: jnp.ndarray,
    v: jnp.ndarray,
    table: Optional[RefractionTable],
    radius: Optional[float],
    straight: bool,
    l_pre: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """h'' per the module-docstring ODE. table=None or straight ⇒ no bending.

    l_pre: optional precomputed l(h) (batched-lookup fast path in the march).
    """
    if radius is None:
        if straight or table is None:
            return jnp.zeros_like(h)
        l = table.lookup(h) if l_pre is None else l_pre
        return l * (1.0 + v * v)
    inv_r = 1.0 / radius
    u = 1.0 + h * inv_r
    geom = (u * u + 2.0 * v * v) / u * inv_r
    if straight or table is None:
        return geom
    l = table.lookup(h) if l_pre is None else l_pre
    return l * (u * u + v * v) + geom


def initial_slope(
    alt: jnp.ndarray, elev_rad: jnp.ndarray, shape: EarthShape
) -> jnp.ndarray:
    """dh/dx at x=0 for a ray launched at ``elev_rad`` above local horizontal."""
    t = jnp.tan(elev_rad)
    if shape.is_flat:
        return t
    return (1.0 + alt / shape.radius) * t


def march_rays(
    alt: jnp.ndarray,
    elev_rad: jnp.ndarray,
    step: float,
    n_steps: int,
    shape: EarthShape,
    table: Optional[RefractionTable],
    straight: bool,
    with_path_length: bool = True,
    coarse: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March a batch of rays N fixed steps; returns (h, path_length).

    Args:
      alt: scalar or [B] starting altitude(s), meters.
      elev_rad: [B] launch elevation angles (radians above local horizontal).
      step: x-advance per iteration, meters (``simulation_step``).
      n_steps: number of steps N; outputs have N+1 samples (k=0 included).
      shape: flat or spherical Earth.
      table: refraction table (ignored when ``straight``).
      straight: bypass refraction (``--straight``, README.md:216-218).
      coarse: sequential-depth reduction factor. 1 = classic fixed-step RK4
        (the reference's stepper semantics). C > 1 integrates RK4 at C·step
        and fills the fine grid by cubic Hermite dense output — the scan
        carries (h, h') so the interpolant matches value AND slope at every
        node; the ODE solution is polynomial-smooth between atmosphere-layer
        kinks, so the fine-grid error is far below the integrator's own
        tolerance (validated in tests/test_ray.py::test_coarse_march_parity).
        Cuts the sequential chain N → N/C, the TPU latency bottleneck.

    Returns:
      h:        [B, N+1] ray altitude at x = k*step.
      path_len: [B, N+1] cumulative path length (reference utils.rs:42-53
                semantics), or zeros if with_path_length=False.

    Mirrors gen_path_cache (src/generator/generators/utils.rs:136-174) minus
    the early-exit (dense lockstep marching; callers mask instead).
    """
    elev_rad = jnp.asarray(elev_rad, jnp.float32)
    alt = jnp.broadcast_to(jnp.asarray(alt, jnp.float32), elev_rad.shape)
    v0 = initial_slope(alt, elev_rad, shape)
    radius = shape.radius
    coarse = max(1, min(int(coarse), n_steps))
    n_coarse = -(-n_steps // coarse)
    dx = jnp.float32(step * coarse)

    bend = table is not None and not straight

    def body(carry, _):
        h, v = carry
        if bend:
            # ONE batched l(h) gather per step: stage altitudes are predicted
            # from the carried slope (h + 0.5·dx·v, h + dx·v). The true stage
            # arguments differ by O(dx²·h'') ≈ centimeters, and l(h) enters
            # multiplied by small curvature terms, so the induced error is
            # far below the integrator tolerance — while gather *launches*,
            # not bytes, bound the scan's per-step cost on TPU.
            ls = table.lookup(
                jnp.stack([h, h + (0.5 * dx) * v, h + dx * v], axis=0)
            )
            l1, l2, l4 = ls[0], ls[1], ls[2]
        else:
            l1 = l2 = l4 = None
        k1v = _acceleration(h, v, table, radius, straight, l_pre=l1)
        k1h = v
        k2h = v + 0.5 * dx * k1v
        k2v = _acceleration(h + 0.5 * dx * k1h, k2h, table, radius, straight, l_pre=l2)
        k3h = v + 0.5 * dx * k2v
        k3v = _acceleration(h + 0.5 * dx * k2h, k3h, table, radius, straight, l_pre=l2)
        k4h = v + dx * k3v
        k4v = _acceleration(h + dx * k3h, k4h, table, radius, straight, l_pre=l4)
        h_new = h + dx / 6.0 * (k1h + 2.0 * k2h + 2.0 * k3h + k4h)
        v_new = v + dx / 6.0 * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
        return (h_new, v_new), (h_new, v_new)

    # unroll on TPU: the per-iteration state is a few [B] vectors, so loop
    # overhead dominates an un-unrolled scan (~70 µs/step measured). On CPU
    # (tests) the unroll only bloats compile time.
    unroll = min(8, n_coarse) if jax.default_backend() == "tpu" else 1
    (_, _), (hs, vs) = jax.lax.scan(
        body, (alt, v0), None, length=n_coarse, unroll=unroll
    )
    h_nodes = jnp.concatenate([alt[None], hs], axis=0)  # [Nc+1, B]
    v_nodes = jnp.concatenate([v0[None], vs], axis=0)

    if coarse == 1:
        h_fine = h_nodes[: n_steps + 1]  # [N+1, B]
    else:
        # cubic Hermite dense output per coarse segment: t in [0, 1)
        t = jnp.arange(coarse, dtype=jnp.float32)[:, None, None] / jnp.float32(
            coarse
        )  # [C, 1, 1]
        t2 = t * t
        t3 = t2 * t
        h00 = 2.0 * t3 - 3.0 * t2 + 1.0
        h10 = t3 - 2.0 * t2 + t
        h01 = -2.0 * t3 + 3.0 * t2
        h11 = t3 - t2
        hl = h_nodes[:-1][None]  # [1, Nc, B]
        hr = h_nodes[1:][None]
        vl = v_nodes[:-1][None] * dx
        vr = v_nodes[1:][None] * dx
        seg = h00 * hl + h10 * vl + h01 * hr + h11 * vr  # [C, Nc, B]
        h_fine = jnp.concatenate(
            [seg.transpose(1, 0, 2).reshape(-1, seg.shape[2]), h_nodes[-1:]],
            axis=0,
        )[: n_steps + 1]  # [N+1, B]

    h_out = jnp.moveaxis(h_fine, 0, 1)  # [B, N+1]
    if not with_path_length:
        return h_out, jnp.zeros_like(h_out)
    # cumulative path length over the FINE grid — same per-step formula as
    # the reference's calc_dist (utils.rs:42-53), now a vectorized cumsum
    dxf = jnp.float32(step)
    dh = h_out[:, 1:] - h_out[:, :-1]
    if radius is None:
        seg_len = jnp.sqrt(dxf * dxf + dh * dh)
    else:
        dx_eff = dxf * ((h_out[:, 1:] + h_out[:, :-1]) * 0.5 + radius) / radius
        seg_len = jnp.sqrt(dx_eff * dx_eff + dh * dh)
    p_out = jnp.concatenate(
        [jnp.zeros((h_out.shape[0], 1), jnp.float32), jnp.cumsum(seg_len, axis=1)],
        axis=1,
    )
    return h_out, p_out
