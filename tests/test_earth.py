"""Earth-model oracles: delta-form device geodesics vs host f64, Vincenty."""

import numpy as np
import pytest

from atm_raytracer_tpu.models.earth import (
    EarthModel,
    DEGREE_DISTANCE,
    EARTH_R,
    WGS84_A,
    WGS84_B,
)

LAT0, LON0 = 49.979439, 21.622839  # README example viewpoint

SPHERE = EarthModel(kind="Spherical", radius=EARTH_R)
WGS = EarthModel(kind="Wgs84")
AE = EarthModel(kind="AzimuthalEquidistant")
FLDS = EarthModel(kind="FlatDistorted")


def _check_delta_vs_host(model, atol_m):
    az = np.array([0.0, 37.0, 90.0, 180.0, 231.0, 359.0])
    dist = np.array([0.0, 15.0, 1000.0, 50_000.0, 200_000.0])
    azg, dg = np.meshgrid(az, dist)
    lat_h, lon_h = model.coords_at_dist_host(LAT0, LON0, azg, dg)
    dlat, dlon = model.geodesic_delta(LAT0, LON0, azg.astype(np.float32),
                                      dg.astype(np.float32))
    m_per_deg = DEGREE_DISTANCE
    err_lat = np.abs(np.asarray(dlat, np.float64) - (lat_h - LAT0)) * m_per_deg
    err_lon = (
        np.abs(np.asarray(dlon, np.float64) - (lon_h - LON0))
        * m_per_deg
        * np.cos(np.deg2rad(LAT0))
    )
    assert err_lat.max() < atol_m, err_lat.max()
    assert err_lon.max() < atol_m, err_lon.max()


def test_sphere_delta_matches_host():
    _check_delta_vs_host(SPHERE, 0.06)  # f32 noise floor ~5 cm over 200 km


def test_ae_delta_matches_host():
    _check_delta_vs_host(AE, 0.06)


def test_flds_delta_matches_host():
    _check_delta_vs_host(FLDS, 0.06)


def test_ellipsoid_delta_matches_host():
    _check_delta_vs_host(WGS, 0.06)  # cancellation-free delta form, like the others


def test_vincenty_against_great_circle_limit():
    # a == b: Vincenty must reduce to the great circle.
    sph_like = EarthModel(kind="Ellipsoid", a=EARTH_R, b=EARTH_R)
    lat_v, lon_v = sph_like.coords_at_dist_host(LAT0, LON0, 73.0, 100_000.0)
    lat_s, lon_s = SPHERE.coords_at_dist_host(LAT0, LON0, 73.0, 100_000.0)
    assert lat_v == pytest.approx(lat_s, abs=1e-9)
    assert lon_v == pytest.approx(lon_s, abs=1e-9)


def test_vincenty_known_geodesic():
    # From (0, 0), azimuth 45°, s = 100 km on WGS-84. Independent first-order
    # oracle from curvature radii at the equator: north component
    # 70710.68 m / (meridian arc 110574.39 m/deg) = 0.63948°, east component
    # 70710.68 m / (parallel arc 111319.49 m/deg) = 0.63521°; curvature of the
    # geodesic changes these by O((s/R)²) ~ 1e-4 deg.
    lat, lon = WGS.coords_at_dist_host(0.0, 0.0, 45.0, 100_000.0)
    assert lat == pytest.approx(0.63948, abs=5e-4)
    assert lon == pytest.approx(0.63521, abs=5e-4)
    # sanity: on the equator heading east, 1 degree ~ 111.32 km
    lat_e, lon_e = WGS.coords_at_dist_host(0.0, 0.0, 90.0, 111_319.49)
    assert lat_e == pytest.approx(0.0, abs=1e-9)
    assert lon_e == pytest.approx(1.0, abs=1e-6)
    # heading north, 1 degree of meridian arc at equator ~ 110.574 km
    lat_n, _ = WGS.coords_at_dist_host(0.0, 0.0, 0.0, 110_574.0)
    assert lat_n == pytest.approx(1.0, abs=1e-4)


def test_to_shape():
    assert SPHERE.to_shape().radius == EARTH_R
    assert EarthModel(kind="SimpleSphere").to_shape().radius == EARTH_R
    mean = (2 * WGS84_A + WGS84_B) / 3.0
    assert WGS.to_shape().radius == pytest.approx(mean)
    assert AE.to_shape().is_flat
    assert FLDS.to_shape().is_flat
    assert EarthModel(kind="ObserverAe", radius=1e6).to_shape().is_flat
    # ObserverAe distances are spherical with proj radius (mod.rs:127-130)
    assert EarthModel(kind="ObserverAe", radius=1e6).distance_radius() == 1e6


def test_world_directions_orthonormal():
    for model in (SPHERE, AE):
        n, e, u = model.world_directions(LAT0, LON0)
        for v in (n, e, u):
            assert np.linalg.norm(v) == pytest.approx(1.0)
        assert abs(np.dot(n, e)) < 1e-12
        assert abs(np.dot(n, u)) < 1e-12
        # right-handed: north x east ~ -up? reference: east x north = up-ish
        np.testing.assert_allclose(np.cross(e, n), u, atol=1e-12)


def test_normal_offsets_match_geodesic():
    # 15 m north/east via closed offsets vs the full host geodesic.
    for model in (SPHERE, WGS, AE, FLDS):
        dlat_n, dlon_e = model.normal_offsets(np.float64(LAT0))
        lat_h, lon_h = model.coords_at_dist_host(LAT0, LON0, 0.0, 15.0)
        assert (LAT0 + dlat_n) == pytest.approx(lat_h, abs=1e-9)
        lat_h2, lon_h2 = model.coords_at_dist_host(LAT0, LON0, 90.0, 15.0)
        assert (LON0 + dlon_e) == pytest.approx(lon_h2, abs=2e-8)


def test_enu_rel_matches_cartesian_difference():
    # enu_rel must equal as_cartesian(P)-as_cartesian(O) in O's ENU basis.
    for model in (SPHERE, AE, FLDS):
        lat_o, lon_o, e_o = LAT0 + 0.001, LON0 - 0.0005, 312.0
        lat_p, lon_p, e_p = lat_o + 0.0006, lon_o + 0.0009, 290.0
        diff = model.as_cartesian(lat_p, lon_p, e_p) - model.as_cartesian(
            lat_o, lon_o, e_o
        )
        north, east, up = model.world_directions(lat_o, lon_o)
        expected = np.array([diff @ east, diff @ north, diff @ up])
        got = np.asarray(
            model.enu_rel(
                np.float32(lat_p - LAT0),
                np.float32(lon_p - LON0),
                np.float32(e_p),
                np.float32(lat_o - LAT0),
                np.float32(lon_o - LON0),
                np.float32(e_o),
                LAT0,
            )
        )
        np.testing.assert_allclose(got, expected, atol=5e-3)


def test_config_roundtrip():
    for v in (
        "SimpleSphere",
        "Wgs84",
        "AzimuthalEquidistant",
        "FlatDistorted",
        "SimpleObserverAe",
        {"Spherical": {"radius": 6371000.0}},
        {"ObserverAe": {"projection_radius": 6371000.0}},
        {"Ellipsoid": {"a": WGS84_A, "b": WGS84_B}},
    ):
        m = EarthModel.from_config(v)
        assert EarthModel.from_config(m.to_config()) == m


def test_observer_ae_accepts_reference_serde_key():
    """The reference binary's serde field is `proj_radius`
    (utils/earth_model/mod.rs:26); its README documents `projection_radius`
    (README.md:189). Both must parse, and to_config emits the binary's
    spelling so emitted YAML round-trips through the reference too."""
    m1 = EarthModel.from_config({"ObserverAe": {"proj_radius": 1.25e6}})
    m2 = EarthModel.from_config({"ObserverAe": {"projection_radius": 1.25e6}})
    assert m1 == m2 == EarthModel(kind="ObserverAe", radius=1.25e6)
    assert m1.to_config() == {"ObserverAe": {"proj_radius": 1.25e6}}


def test_vincenty_direct_published_line():
    """Independent absolute oracle for the Vincenty direct solution
    (directional_calc.rs:88-185): the Geoscience Australia test line
    Flinders Peak -> Buninyong (GRS80; flattening delta vs WGS84 is
    sub-mm at this scale): s = 54 972.271 m, alpha1 = 306d52'05.37".
    Existing geodesic tests only pin device-vs-host consistency."""
    def dms(d, m, s):
        return d + m / 60.0 + s / 3600.0

    lat1, lon1 = -dms(37, 57, 3.72030), dms(144, 25, 29.52440)
    lat2, lon2 = -dms(37, 39, 10.15610), dms(143, 55, 35.38390)
    az1 = dms(306, 52, 5.37)
    la, lo = EarthModel(kind="Wgs84").coords_at_dist_host(
        lat1, lon1, az1, 54_972.271
    )
    # published coordinates are given to 1e-5 arcsec (~0.3 mm)
    assert abs(la - lat2) * 111_194.9 < 2e-3  # meters
    assert abs(lo - lon2) * 111_194.9 * np.cos(np.deg2rad(lat2)) < 2e-3
