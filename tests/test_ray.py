"""Ray-marcher oracles: straight-line geometry, horizon dip, refraction."""

import numpy as np
import pytest
import jax.numpy as jnp

from atm_raytracer_tpu.physics.atmosphere import Atmosphere, us_76
from atm_raytracer_tpu.physics.ray import (
    EarthShape,
    FLAT,
    RefractionTable,
    initial_slope,
    march_rays,
)

R = 6371000.0
SPHERE = EarthShape(R)


@pytest.fixture(scope="module")
def table():
    return RefractionTable.build(Atmosphere(us_76()), 530e-9)


def straight_sphere_exact(h0, elev, x):
    """Closed-form altitude of a straight chord above a sphere.

    Observer at radius r0=R+h0, launch elevation `elev` above local
    horizontal. At surface-arc distance x (angle phi = x/R), the line point
    subtending phi has altitude r(phi) - R with
      r = r0 * cos(elev) / cos(elev + phi)   -- from the straight-line polar
    equation r cos(theta - theta0') = const with theta measured appropriately.
    """
    phi = np.asarray(x) / R
    r0 = R + h0
    return r0 * np.cos(elev) / np.cos(elev + phi) - R


def test_flat_straight_exact():
    elev = np.deg2rad(np.array([-0.5, 0.0, 0.7], dtype=np.float32))
    h, plen = march_rays(100.0, elev, 50.0, 200, FLAT, None, straight=True)
    xs = np.arange(201) * 50.0
    expected = 100.0 + np.tan(elev)[:, None] * xs[None, :]
    np.testing.assert_allclose(h, expected, atol=2e-2)
    # path length of a straight line: x / cos(elev)
    np.testing.assert_allclose(
        plen[:, -1], xs[-1] / np.cos(elev), rtol=1e-5
    )


def test_sphere_straight_vs_closed_form():
    h0 = 1000.0
    elevs = np.deg2rad(np.array([-0.6, -0.1, 0.0, 0.4]))
    h, _ = march_rays(
        h0, elevs.astype(np.float32), 50.0, 2000, SPHERE, None, straight=True
    )
    xs = np.arange(2001) * 50.0
    for i, e in enumerate(elevs):
        expected = straight_sphere_exact(h0, e, xs)
        np.testing.assert_allclose(np.asarray(h[i]), expected, atol=0.5)


def test_horizon_dip_straight():
    # Geometric dip: a straight ray at elevation -acos(R/(R+h)) grazes the
    # surface (min altitude ~ 0).
    h0 = 100.0
    dip = -np.arccos(R / (R + h0))
    h, _ = march_rays(
        h0, np.array([dip], np.float32), 25.0, 3000, SPHERE, None, straight=True
    )
    min_h = float(np.min(np.asarray(h)))
    assert abs(min_h) < 1.0  # grazes within a meter


def test_refraction_curvature_matches_table(table):
    # Horizontal ray in a standard atmosphere: curvature d2h/dx2 ~ l(h) + 1/R
    # (spherical) at the launch point. Fit the quadratic over a short arc.
    h0 = 500.0
    h, _ = march_rays(
        h0, np.array([0.0], np.float32), 10.0, 100, SPHERE, table, straight=False
    )
    xs = np.arange(101) * 10.0
    coeffs = np.polyfit(xs, np.asarray(h[0]), 2)
    expected_half_curv = 0.5 * (
        float(table.lookup(jnp.float32(h0))) + 1.0 / R
    )
    assert coeffs[0] == pytest.approx(expected_half_curv, rel=5e-3)


def test_refraction_extends_horizon(table):
    # Refraction bends rays downward (dn/dh < 0), so the *grazing* ray leaves
    # the observer at a smaller dip than geometric: dip_refr ~ dip*sqrt(1-k).
    # Consequently a ray launched at the full geometric dip dives below the
    # surface, while one at dip*sqrt(1-k) grazes it.
    h0 = 100.0
    dip = np.arccos(R / (R + h0))
    k = -float(table.lookup(jnp.float32(h0))) * R  # ~0.15 standard
    h_geom, _ = march_rays(
        h0, np.array([-dip], np.float32), 25.0, 3000, SPHERE, table, straight=False
    )
    assert float(np.min(np.asarray(h_geom))) < -5.0
    h_graze, _ = march_rays(
        h0,
        np.array([-dip * np.sqrt(1.0 - k)], np.float32),
        25.0,
        3000,
        SPHERE,
        table,
        straight=False,
    )
    assert abs(float(np.min(np.asarray(h_graze)))) < 5.0


def test_flat_refracted_ray_bends_down(table):
    # dn/dh < 0 ⇒ rays curve downward on a flat Earth.
    h, _ = march_rays(
        50.0, np.array([0.0], np.float32), 50.0, 1000, FLAT, table, straight=False
    )
    assert float(h[0, -1]) < 50.0


def test_initial_slope():
    assert float(initial_slope(jnp.float32(0.0), jnp.float32(0.1), FLAT)) == (
        pytest.approx(np.tan(0.1), rel=1e-6)
    )
    s = float(initial_slope(jnp.float32(1000.0), jnp.float32(0.1), SPHERE))
    assert s == pytest.approx((1 + 1000.0 / R) * np.tan(0.1), rel=1e-6)


def test_path_length_spherical_correction():
    # A horizontal-ish straight ray at high altitude accumulates path length
    # faster than surface arc (factor (h+R)/R) — utils.rs:42-53 semantics.
    h0 = 10000.0
    _, plen = march_rays(
        h0, np.array([0.0], np.float32), 50.0, 100, SPHERE, None, straight=True
    )
    x_total = 100 * 50.0
    assert float(plen[0, -1]) > x_total * (1 + h0 / R) * 0.999


def test_coarse_march_parity(table):
    """Coarse RK4 + Hermite dense output vs fine-step RK4 (the perf path).

    Rays from grazing to steep, US-76 refraction, 200 km at 50 m steps.
    The dense-output error must be far below the physical tolerance band
    (the reference's own accuracy knob is the 50 m simulation_step).
    """
    elev = jnp.deg2rad(jnp.asarray([-0.5, -0.1, 0.0, 0.1, 1.0, 5.0], jnp.float32))
    n = 4000
    h_fine, p_fine = march_rays(100.0, elev, 50.0, n, SPHERE, table, False)
    h_coarse, p_coarse = march_rays(
        100.0, elev, 50.0, n, SPHERE, table, False, coarse=8
    )
    np.testing.assert_allclose(np.asarray(h_coarse), np.asarray(h_fine), atol=0.05)
    np.testing.assert_allclose(np.asarray(p_coarse), np.asarray(p_fine), rtol=1e-6)


def test_march_matches_f64_oracle(table):
    """Absolute integrator oracle: the f32 device march (Chebyshev l(h),
    coarse RK4 + Hermite) vs an INDEPENDENT f64 RK4 at 12.5 m substeps with
    the exact host-atmosphere l(h) (fixtures.f64_march_spherical — the ODE
    re-derived from Fermat's principle). The in-family coarse-vs-fine
    parity test above can't see a shared systematic error; this can.
    Measured: ≤ 2.9 cm over 200 km, grazing to 5°."""
    from fixtures import f64_march_spherical
    from atm_raytracer_tpu.physics.atmosphere import Atmosphere, us_76

    atm = Atmosphere(us_76())
    elev = np.deg2rad(np.array([-0.5, -0.1, 0.0, 0.1, 1.0, 5.0], np.float64))
    n = 4000  # 200 km at 50 m
    h64 = f64_march_spherical(atm, 530e-9, 100.0, elev, 50.0, n, R,
                              substeps=4)
    for coarse in (1, 16):
        h_dev, _ = march_rays(
            100.0, elev.astype(np.float32), 50.0, n, SPHERE, table, False,
            coarse=coarse,
        )
        err = np.abs(np.asarray(h_dev, np.float64) - h64)
        assert err.max() < 0.1, (coarse, err.max())


def test_quadrature_path_length_parity(table):
    """march_scan_light's RK4-quadrature path length vs the fine chord sum
    (the reference's calc_dist semantics, utils.rs:42-53): the smooth
    integrand and the 50 m chord sum agree to ~1e-10 m/segment, so the
    carried P must track the chord cumsum to well under a millimeter per
    kilometer over 200 km."""
    from atm_raytracer_tpu.physics.ray import march_scan_light

    elev = jnp.deg2rad(
        jnp.asarray([-0.5, -0.1, 0.0, 0.1, 1.0, 5.0, 15.0], jnp.float32)
    )
    n = 4000
    _, p_fine = march_rays(100.0, elev, 50.0, n, SPHERE, table, False, coarse=8)

    def consumer2(carry, k0, h_f, alive, state):
        return state[2]  # P at window start; final carry = last window's P

    p_last_start = march_scan_light(
        100.0, elev, 50.0, n, SPHERE, table, False, consumer2,
        jnp.zeros_like(elev), coarse=8,
    )
    # compare against the chord cumsum at the same sample (last window start)
    n_coarse = -(-n // 8)
    k_last = (n_coarse - 1) * 8
    # both sides are f32 accumulations over ~500 windows; their random-walk
    # rounding (~f32 eps · path ≈ 0.2 m at 200 km) dominates the method
    # difference, so the band is relative
    np.testing.assert_allclose(
        np.asarray(p_last_start), np.asarray(p_fine[:, k_last]), rtol=2e-6
    )


def test_coarse_march_parity_duct(table):
    """Sharp inversion layer (spline atmosphere): coarse dense output still
    tracks the fine integration within the duct's bending scale."""
    from atm_raytracer_tpu.physics.atmosphere import (
        AtmosphereDef,
        LinearFunction,
        SplineFunction,
    )

    duct = AtmosphereDef(
        pressure_altitude=0.0,
        pressure=101325.0,
        first_temperature_function=LinearFunction(-0.0065),
        next_functions=(
            (
                50.0,
                SplineFunction(
                    boundary_condition=("Natural",),
                    points=((50.0, 287.8), (65.0, 292.0), (80.0, 288.0)),
                ),
            ),
            (80.0, LinearFunction(-0.0065)),
        ),
    )
    t = RefractionTable.build(Atmosphere(duct), 530e-9)
    elev = jnp.deg2rad(jnp.asarray([-0.05, 0.0, 0.05, 0.3], jnp.float32))
    n = 4000
    h_fine, _ = march_rays(60.0, elev, 50.0, n, SPHERE, t, False)
    h_coarse, _ = march_rays(60.0, elev, 50.0, n, SPHERE, t, False, coarse=8)
    # near-critical duct-trapped rays are intrinsically sensitive (the escape
    # angle is a bifurcation); a few meters at 200 km is within the fine
    # integrator's own distance from the true solution there
    np.testing.assert_allclose(np.asarray(h_coarse), np.asarray(h_fine), atol=2.5)


def test_l_poly_matches_table(table):
    """The compiled piecewise-Chebyshev l(h) must track the fine table in
    the ODE-relevant (cumulative-integral) sense across the whole range."""
    from atm_raytracer_tpu.physics.ray import eval_l_poly

    assert table.poly is not None  # US-76 compiles to a few segments
    hs = np.linspace(-2100.0, 20100.0, 44001).astype(np.float32)
    fine = np.asarray(table.lookup(jnp.asarray(hs)), np.float64)
    pv = np.asarray(eval_l_poly(table.poly, jnp.asarray(hs)), np.float64)
    cum = np.abs(np.cumsum(pv - fine)).max() * 0.5  # dh of this probe grid
    assert cum < 1e-7


def test_pallas_march_interpret_matches_scan(table):
    """The Pallas march kernel (one launch, piecewise-Chebyshev l(h), no
    gathers) must reproduce the XLA scan nodes; interpret mode runs on CPU."""
    from atm_raytracer_tpu.experimental.march_pallas import march_nodes_pallas as _march_nodes_pallas
    from atm_raytracer_tpu.physics.ray import initial_slope

    elev = jnp.deg2rad(jnp.asarray([-0.5, -0.1, 0.0, 0.1, 1.0], jnp.float32))
    alt = jnp.full_like(elev, 100.0)
    v0 = initial_slope(alt, elev, SPHERE)
    hp, vp = _march_nodes_pallas(
        alt, v0, 400.0, 500, table.poly, R, interpret=True
    )
    # XLA scan reference at the same coarse step (also uses table.poly)
    hs, _ = march_rays(100.0, elev, 400.0, 500, SPHERE, table, False)
    np.testing.assert_allclose(np.asarray(hp[1:]).T, np.asarray(hs)[:, 1:],
                               atol=2e-2)


def test_straight_dense_flat_and_clamp():
    from atm_raytracer_tpu.physics.ray import _straight_dense

    elev = jnp.deg2rad(jnp.asarray([1.0], jnp.float32))
    h = _straight_dense(jnp.float32([50.0]), elev, 100.0, 10, FLAT)
    np.testing.assert_allclose(
        np.asarray(h[:, 0]),
        50.0 + np.tan(np.deg2rad(1.0)) * np.arange(11) * 100.0,
        rtol=1e-5,
    )
    # a chord receding past e+phi=90° clamps to open sky
    steep = jnp.deg2rad(jnp.asarray([89.9], jnp.float32))
    h2 = _straight_dense(jnp.float32([0.0]), steep, 50000.0, 10, SPHERE)
    assert float(np.asarray(h2)[-1, 0]) >= 1e8


def test_refracted_dip_published_coefficient(table):
    """PUBLISHED horizon-dip rule: dip_refracted ≈ 1.76'·sqrt(h[m])
    (surveying/navigation standard, k ≈ 0.13; k ∈ [0.10, 0.20] maps to
    1.73'-1.83'·sqrt(h)). Bracket the grazing launch elevation with a
    batched march and pin it inside [1.70, 1.85]'·sqrt(h) — a published
    constant, not a self-derived closed form (VERDICT r3 oracle ask).
    """
    h0 = 100.0
    # 81 launch elevations spanning the plausible dip range
    elevs = np.linspace(-0.0060, -0.0044, 81).astype(np.float32)
    h, _ = march_rays(
        h0, jnp.asarray(elevs), 50.0, 1200, SPHERE, table, straight=False,
        with_path_length=False,
    )
    min_h = np.asarray(h).min(axis=1)  # monotone increasing in elev
    assert min_h[0] < 0.0 < min_h[-1], "bracket must straddle the graze"
    # grazing elevation by linear interpolation of the min-altitude curve
    dip = -float(np.interp(0.0, min_h, elevs))
    arcmin = np.pi / (180.0 * 60.0)
    coeff = dip / (arcmin * np.sqrt(h0))
    assert 1.70 < coeff < 1.85, f"dip {coeff:.3f}'*sqrt(h) outside band"
    # and the grazing distance obeys d ≈ 3.86*sqrt(h) km (k ≈ 0.13 rule;
    # k ∈ [0.10, 0.20] maps to 3.76-3.99)
    gi = int(np.argmin(np.abs(elevs - (-dip))))
    d_graze_km = float(np.argmin(np.asarray(h)[gi]) * 50.0 / 1000.0)
    assert 3.7 < d_graze_km / np.sqrt(h0) < 4.05
