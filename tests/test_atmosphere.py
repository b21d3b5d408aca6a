"""Atmosphere oracles: US-76 published tables, spline configs, hydrostatics."""

import math

import numpy as np
import pytest

from atm_raytracer_tpu.physics.atmosphere import (
    Atmosphere,
    AtmosphereDef,
    LinearFunction,
    SplineFunction,
    atmosphere_def_from_dict,
    atmosphere_def_to_dict,
    us_76,
)


@pytest.fixture(scope="module")
def atm76():
    return Atmosphere(us_76())


def test_us76_temperature_breakpoints(atm76):
    # Published US-76 layer temperatures.
    assert atm76.temperature(0.0) == pytest.approx(288.15)
    assert atm76.temperature(11000.0) == pytest.approx(216.65)
    assert atm76.temperature(20000.0) == pytest.approx(216.65)
    assert atm76.temperature(32000.0) == pytest.approx(228.65)
    assert atm76.temperature(47000.0) == pytest.approx(270.65)


def test_us76_pressure_table(atm76):
    # Published US-76 pressures (Pa). Geometric-vs-geopotential altitude
    # differences are <0.2% below 11 km; allow 1% at altitude.
    assert atm76.pressure(0.0) == pytest.approx(101325.0, rel=1e-6)
    assert atm76.pressure(5000.0) == pytest.approx(54048.0, rel=5e-3)
    assert atm76.pressure(11000.0) == pytest.approx(22632.0, rel=1e-2)
    assert atm76.pressure(20000.0) == pytest.approx(5474.9, rel=2e-2)


def test_refractive_index_standard_air(atm76):
    # n-1 of standard air at 530 nm, sea level: ~2.7-2.9e-4.
    n = atm76.n(0.0, 530e-9)
    assert 2.6e-4 < n - 1.0 < 2.95e-4
    # Longer wavelengths are less refracted (README.md:211-214).
    assert atm76.n(0.0, 700e-9) < atm76.n(0.0, 430e-9)


def test_dn_dh_matches_finite_difference(atm76):
    hs = np.array([10.0, 500.0, 3000.0, 9000.0])
    eps = 0.01
    fd = (atm76.n(hs + eps) - atm76.n(hs - eps)) / (2 * eps)
    np.testing.assert_allclose(atm76.dn_dh(hs), fd, rtol=1e-5)


def test_standard_refraction_coefficient(atm76):
    # k = ray curvature / earth curvature for a horizontal ray near the
    # surface; standard atmosphere gives k ~ 0.13-0.18 at optical wavelengths.
    k = -atm76.dlnn_dh(10.0, 530e-9) * 6371000.0
    assert 0.10 < k < 0.20


def test_linear_only_requires_fixed_point():
    d = AtmosphereDef(
        first_temperature_function=LinearFunction(-0.0065),
        temperature_fixed_point=None,
    )
    with pytest.raises(ValueError):
        Atmosphere(d)


def test_spline_atmosphere_readme_example():
    # The README example (README.md:283-317): linear below 100 m, spline above.
    d = atmosphere_def_from_dict(
        {
            "pressure": {"altitude": 0.0, "pressure": 101325},
            "first_temperature_function": {"Linear": {"gradient": -0.0065}},
            "next_functions": [
                {
                    "altitude": 100.0,
                    "function": {
                        "Spline": {
                            "boundary_condition": {
                                "Derivatives": [-0.0065, 0.0]
                            },
                            "points": [
                                [100.0, 288.0],
                                [110.0, 285.0],
                                [120.0, 291.0],
                            ],
                        }
                    },
                }
            ],
        }
    )
    atm = Atmosphere(d)
    # spline hits its points exactly
    assert atm.temperature(100.0) == pytest.approx(288.0)
    assert atm.temperature(110.0) == pytest.approx(285.0)
    assert atm.temperature(120.0) == pytest.approx(291.0)
    # linear segment chains continuously off the spline boundary value
    assert atm.temperature(99.0) == pytest.approx(288.0 + 0.0065, rel=1e-9)
    # clamped start derivative
    eps = 1e-3
    d100 = (atm.temperature(100.0 + eps) - atm.temperature(100.0)) / eps
    assert d100 == pytest.approx(-0.0065, abs=1e-3)
    # above the last point: linear extension with end derivative 0
    assert atm.temperature(500.0) == pytest.approx(291.0)


def test_def_dict_roundtrip():
    d = us_76()
    d2 = atmosphere_def_from_dict(atmosphere_def_to_dict(d))
    assert d2 == d


def test_natural_spline_bc():
    d = AtmosphereDef(
        first_temperature_function=SplineFunction(
            ("Natural",), ((0.0, 288.0), (50.0, 287.0), (100.0, 289.0))
        ),
    )
    atm = Atmosphere(d)
    assert atm.temperature(50.0) == pytest.approx(287.0)
    # natural BC: second derivative ~0 at ends
    eps = 0.5
    second = (
        atm.temperature(eps) - 2 * atm.temperature(0.0) + atm.temperature(-eps)
    ) / eps**2
    assert abs(second) < 1e-4


def test_humidity_constant(atm76):
    np.testing.assert_allclose(atm76.humidity(np.array([0.0, 100.0])), 0.0)


def test_humidity_config_constant_and_piecewise():
    """humidity: scalar or {points: ...} — linear interp, clamped ends,
    YAML round-trip (our grammar: the crate models humidity(h),
    atm_printer.rs:43, but the reference README pins no config spec)."""
    from atm_raytracer_tpu.physics.atmosphere import (
        atmosphere_def_from_dict, atmosphere_def_to_dict,
    )

    tfp = {"temperature_fixed_point": {"altitude": 0.0, "temperature": 288.15}}
    d = atmosphere_def_from_dict({"humidity": 0.35, **tfp})
    atm = Atmosphere(d)
    np.testing.assert_allclose(atm.humidity(np.array([0.0, 5000.0])), 0.35)

    d2 = atmosphere_def_from_dict({
        "humidity": {"points": [[2000.0, 0.2], [0.0, 0.8]]},  # unsorted ok
        **tfp,
    })
    atm2 = Atmosphere(d2)
    np.testing.assert_allclose(
        atm2.humidity(np.array([-100.0, 0.0, 1000.0, 2000.0, 9000.0])),
        [0.8, 0.8, 0.5, 0.2, 0.2],
    )
    # round-trips through the YAML dict form
    back = atmosphere_def_from_dict(atmosphere_def_to_dict(d2))
    assert back.humidity == d2.humidity
    # constructor override still wins (ray_path/table builders pass none)
    np.testing.assert_allclose(
        Atmosphere(d2, humidity=0.1).humidity(np.array([0.0])), 0.1
    )


def _bouguer_refraction_rad(atm, apparent_alt_rad, wavelength=530e-9,
                            h_top=86000.0, n_pts=300_000):
    """Astronomical refraction by f64 Bouguer-invariant quadrature.

    For a spherically-stratified atmosphere the invariant n·r·sin(z) = C
    holds along the ray; total bending is xi = -∫ tan(z) dn/n from the
    observer (sea level) to space. With sin z = C/(n r):

        xi = ∫_0^htop  C · (-dn/dh) / (n · sqrt(n²r² - C²)) dh,  r = R + h.

    The integrand's 1/sqrt endpoint singularity at z0 = 90° is removed by
    substituting u = sqrt(h) (du finite). Pure host-side f64 on
    Atmosphere.n — INDEPENDENT of the ray marcher, so it pins the n(h, λ)
    profile itself against published standard-refraction values.
    """
    R = 6371000.0
    z0 = np.pi / 2.0 - apparent_alt_rad
    n0 = float(atm.n(0.0, wavelength))
    C = n0 * R * np.sin(z0)
    u = np.linspace(0.0, np.sqrt(h_top), n_pts)[1:]  # skip the u=0 endpoint
    h = u * u
    r = R + h
    n = atm.n(h, wavelength)
    dn_dh = atm.dn_dh(h, wavelength)
    integrand_h = C * (-dn_dh) / (n * np.sqrt(np.maximum(n * n * r * r - C * C,
                                                         1e-30)))
    # ∫ f(h) dh = ∫ f(u²)·2u du — finite at u→0 even for z0 = 90°
    return float(np.trapezoid(integrand_h * 2.0 * u, u))


def test_astronomical_refraction_published_values(atm76):
    """Pins n(h, λ) against PUBLISHED standard-atmosphere refraction
    (VERDICT r3 'published-table oracles'): at the horizon the standard
    value is ~34 arcmin (Bennett 1982 gives 34.5', tabulated standard
    values 33.8'-35.4' across visible λ and conventions); at 45° apparent
    altitude refraction ≈ 58.1''·tan(z) ≈ 58'' (±4'' band). US-76 sea
    level matches the standard conditions (288.15 K, 101325 Pa) these
    tables assume.
    """
    arcmin = math.pi / (180.0 * 60.0)
    xi_horizon = _bouguer_refraction_rad(atm76, 0.0)
    assert 33.0 * arcmin < xi_horizon < 36.0 * arcmin, (
        f"horizon refraction {xi_horizon / arcmin:.2f}' outside published "
        "33'-36' band"
    )
    xi_45 = _bouguer_refraction_rad(atm76, math.radians(45.0))
    arcsec = arcmin / 60.0
    assert 54.0 * arcsec < xi_45 < 62.0 * arcsec, (
        f"45-deg refraction {xi_45 / arcsec:.1f}'' outside published "
        "54''-62'' band"
    )
    # Saemundsson's formula at 5 deg apparent altitude: ~9.9' (1.02/tan(h +
    # 10.3/(h + 5.11))); allow ±10% for formula-vs-profile spread
    xi_5 = _bouguer_refraction_rad(atm76, math.radians(5.0))
    saem = 1.02 / math.tan(math.radians(5.0 + 10.3 / (5.0 + 5.11))) * arcmin
    assert abs(xi_5 - saem) < 0.10 * saem
