"""Rectilinear generator: pinhole camera math + cross-generator consistency.

The reference documents Rectilinear as the exact ground truth and Fast as its
small-FoV approximation (README.md:273-279) — so at the image center (where
both cameras agree exactly) the hits must match, and across a small FoV they
must agree closely (SURVEY §4 cross-checks).
"""

import numpy as np
import pytest

from fixtures import make_terrain_folder


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.terrain.store import Terrain

    d = tmp_path_factory.mktemp("terrain_rect")
    make_terrain_folder(d, tiles=((49, 21),), n=241)
    config = Config.from_dict(
        {
            "view": {
                "position": {
                    "latitude": 49.5,
                    "longitude": 21.5,
                    "altitude": {"Relative": 40.0},
                },
                "frame": {"direction": 50.0, "fov": 6.0, "max_distance": 12000.0,
                          "tilt": 0.0},
            },
            "simulation_step": 50.0,
            "output": {"width": 48, "height": 32},
        }
    )
    terrain = Terrain.from_folder(d)
    return config, terrain, config.into_params(terrain)


def test_camera_center_pixel_exact():
    from atm_raytracer_tpu.models.camera import rectilinear_ray_params

    elev, dirr = rectilinear_ray_params(64, 48, 20.0, tilt=3.0, direction=120.0)
    assert np.rad2deg(elev[24, 32]) == pytest.approx(3.0, abs=1e-9)
    assert np.rad2deg(dirr[24, 32]) == pytest.approx(120.0, abs=1e-9)
    # corners bend: constant-elevation rows are curved for a pinhole
    assert elev[0, 0] != elev[0, 32]


def test_camera_against_reference_formula():
    # independent transcription of rectilinear.rs:78-100 using explicit
    # rotation matrices
    from atm_raytracer_tpu.models.camera import rectilinear_ray_params

    w, h, fov, tilt, direction = 16, 12, 25.0, -2.0, 200.0
    elev, dirr = rectilinear_ray_params(w, h, fov, tilt, direction)
    z = w / 2.0 / np.tan(np.deg2rad(fov) / 2.0)
    yaw, pitch = np.deg2rad(direction), -np.deg2rad(tilt)
    ry = np.array([
        [np.cos(pitch), 0, np.sin(pitch)],
        [0, 1, 0],
        [-np.sin(pitch), 0, np.cos(pitch)],
    ])
    rz = np.array([
        [np.cos(yaw), -np.sin(yaw), 0],
        [np.sin(yaw), np.cos(yaw), 0],
        [0, 0, 1],
    ])
    for (px, py) in [(0, 0), (15, 11), (8, 6), (3, 9)]:
        v = np.array([z, px - w // 2, -(py - h // 2)], np.float64)
        v = v / np.linalg.norm(v)
        d = rz @ ry @ v
        assert np.arcsin(d[2]) == pytest.approx(elev[py, px], abs=1e-12)
        assert np.arctan2(d[1], d[0]) == pytest.approx(dirr[py, px], abs=1e-12)


def test_rectilinear_matches_fast_at_center(setup):
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    fast = render_fast(params, terrain)
    rect = render_rectilinear(params, terrain, chunk_rows=16)
    cy, cx = 16, 24  # H//2, W//2 — identical ray in both cameras
    assert bool(rect.hits.valid[cy, cx, 0]) == bool(fast.hits.valid[cy, cx, 0])
    if rect.hits.valid[cy, cx, 0]:
        assert rect.hits.distance[cy, cx, 0] == pytest.approx(
            fast.hits.distance[cy, cx, 0], abs=60.0
        )
        assert rect.hits.elevation[cy, cx, 0] == pytest.approx(
            fast.hits.elevation[cy, cx, 0], abs=5.0
        )


def test_rectilinear_close_to_fast_small_fov(setup):
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    fast = render_fast(params, terrain)
    rect = render_rectilinear(params, terrain, chunk_rows=16)
    # same terrain/sky split within a small margin (edge pixels may differ)
    agree = rect.hits.valid[..., 0] == fast.hits.valid[..., 0]
    assert agree.mean() > 0.95
    # where both hit, distances are close
    both = rect.hits.valid[..., 0] & fast.hits.valid[..., 0]
    dd = np.abs(rect.hits.distance[..., 0] - fast.hits.distance[..., 0])[both]
    assert np.median(dd) < 100.0


def test_rectilinear_objects(setup, tmp_path):
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear
    from atm_raytracer_tpu.terrain.store import Terrain

    config, terrain, _ = setup
    d = config.to_dict()
    from fixtures import M_PER_DEG as m_per_deg
    d["scene"]["objects"] = [
        {
            "position": {
                "latitude": 49.5 + 800.0 / m_per_deg * np.cos(np.deg2rad(50.0)),
                "longitude": 21.5
                + 800.0 / m_per_deg * np.sin(np.deg2rad(50.0))
                / np.cos(np.deg2rad(49.5)),
                "altitude": {"Relative": 0.0},
            },
            "color": {"r": 1.0, "g": 0.0, "b": 0.0},
            "shape": {"Cylinder": {"radius": 15.0, "height": 120.0}},
        }
    ]
    config2 = Config.from_dict(d)
    params2 = config2.into_params(terrain)
    rect = render_rectilinear(params2, terrain, chunk_rows=16)
    obj = rect.hits.valid & (rect.hits.kind == 1)
    assert obj.any(), "object not seen by rectilinear generator"
    ys, xs, _ = np.where(obj)
    assert abs(xs.mean() - 24) < 6  # near the view direction


def test_progress_percent_lines(setup, monkeypatch):
    """Per-percent progress (rectilinear.rs:40-49): both code paths report."""
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    seen = []
    render_rectilinear(params, terrain, progress=seen.append)
    assert seen, "no progress reported on the fused tilt-0 path"
    assert max(seen) == 100
    assert all(0 <= p <= 100 for p in seen)

    # legacy per-pixel path (tilt != 0, culling disabled) reports per chunk
    d = config.to_dict()
    d["view"]["frame"]["tilt"] = 1.5
    from atm_raytracer_tpu.config import Config

    params2 = Config.from_dict(d).into_params(terrain)
    seen2 = []
    monkeypatch.setenv("ATM_RAYTRACER_NO_CULL", "1")
    render_rectilinear(params2, terrain, chunk_rows=8,
                       progress=seen2.append)
    monkeypatch.delenv("ATM_RAYTRACER_NO_CULL")
    assert seen2 == sorted(seen2) and seen2[-1] == 100 and len(seen2) >= 3


def test_fused_matches_legacy_pixelwise(setup):
    """The fused shared-column program is the same math as the exact
    per-pixel path: a vanishing tilt (legacy path) must agree with tilt=0
    (fused path) to sub-step tolerance."""
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    fused = render_rectilinear(params, terrain)

    d = config.to_dict()
    d["view"]["frame"]["tilt"] = 1e-5  # forces the per-pixel legacy path
    params2 = Config.from_dict(d).into_params(terrain)
    legacy = render_rectilinear(params2, terrain, chunk_rows=16)

    agree = fused.hits.valid[..., 0] == legacy.hits.valid[..., 0]
    assert agree.mean() > 0.99, agree.mean()
    both = fused.hits.valid[..., 0] & legacy.hits.valid[..., 0]
    dd = np.abs(fused.hits.distance[..., 0] - legacy.hits.distance[..., 0])[both]
    assert np.median(dd) < 55.0  # within one simulation step
    pl = np.abs(
        fused.hits.path_length[..., 0] - legacy.hits.path_length[..., 0]
    )[both]
    assert np.median(pl) < 60.0


def test_death_segment_still_tested(tmp_path):
    """The segment STARTING at a ray's first sub--1000 m sample is still
    tested for a crossing (utils.rs:159-171 records that sample before
    stopping; ray_alive_mask and march_scan agree). Terrain at -1040 m with
    a steep-down camera puts the crossing inside exactly that segment —
    regression for a k==1 fused-path death prefix that killed it."""
    import numpy as np_

    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear
    from atm_raytracer_tpu.terrain.store import Terrain, Tile

    terrain = Terrain()
    terrain.add_tile(Tile(
        lat0=49, lon0=21, elev=np_.full((121, 121), -1040, np_.int16)
    ))
    d = {
        "view": {
            "position": {
                "latitude": 49.5, "longitude": 21.5,
                "altitude": {"Absolute": 100.0},
            },
            # ±80° rows: the bottom rays descend ~280 m per 50 m step, so
            # they pass -1000 and -1040 within one segment
            "frame": {"direction": 45.0, "fov": 160.0,
                      "max_distance": 20_000.0},
        },
        "simulation_step": 50.0,
        "output": {"width": 24, "height": 31},
    }
    params = Config.from_dict(d).into_params(terrain)
    r1 = render_rectilinear(params, terrain, max_hits=1)  # k==1 fast path
    v1 = np_.asarray(r1.hits.valid)[..., 0]
    assert v1.any(), "steep rays into -1040 m terrain must hit"
    # the k>1 consumer uses march_scan's reference-rule prefix mask; slot 0
    # must agree with the k==1 fast path on validity and key
    r2 = render_rectilinear(params, terrain, max_hits=2)
    v2 = np_.asarray(r2.hits.valid)[..., 0]
    np_.testing.assert_array_equal(v1, v2)
    both = v1 & v2
    np_.testing.assert_allclose(
        np_.asarray(r1.hits.key)[..., 0][both],
        np_.asarray(r2.hits.key)[..., 0][both], rtol=1e-6,
    )


def test_fused_multi_hit_slots(setup):
    """K>1 fused path (translucent terrain): ascending unique keys per pixel."""
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    r = render_rectilinear(params, terrain, max_hits=3)
    valid = np.asarray(r.hits.valid)
    key = np.asarray(r.hits.key)
    assert valid.shape[-1] == 3
    assert valid[..., 0].any()
    assert valid[..., 1].any(), "no pixel has a second terrain crossing"
    # keys ascend and invalid slots are +inf
    k0, k1 = key[..., 0], key[..., 1]
    both = valid[..., 0] & valid[..., 1]
    assert (k1[both] > k0[both]).all()
    assert np.isinf(key[~valid]).all()
    # slot-0 equals the single-hit render
    r1 = render_rectilinear(params, terrain, max_hits=1)
    assert np.allclose(
        np.asarray(r1.hits.distance[..., 0]), np.asarray(r.hits.distance[..., 0]),
        atol=1e-3,
    )


def test_culled_matches_dense_pixelwise(setup, monkeypatch):
    """The envelope-culled tilted path is EXACT: it must agree with the
    dense per-pixel program (same march, same per-azimuth sampling) to
    floating-point noise."""
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    d = config.to_dict()
    d["view"]["frame"]["tilt"] = 2.0
    params2 = Config.from_dict(d).into_params(terrain)

    culled = render_rectilinear(params2, terrain)
    monkeypatch.setenv("ATM_RAYTRACER_NO_CULL", "1")
    dense = render_rectilinear(params2, terrain, chunk_rows=16)
    monkeypatch.delenv("ATM_RAYTRACER_NO_CULL")

    cv = np.asarray(culled.hits.valid[..., 0])
    dv = np.asarray(dense.hits.valid[..., 0])
    assert (cv == dv).mean() > 0.999, (cv == dv).mean()
    both = cv & dv
    dd = np.abs(
        np.asarray(culled.hits.distance[..., 0])
        - np.asarray(dense.hits.distance[..., 0])
    )[both]
    assert np.median(dd) < 1.0 and dd.max() < 120.0, (np.median(dd), dd.max())
    pl = np.abs(
        np.asarray(culled.hits.path_length[..., 0])
        - np.asarray(dense.hits.path_length[..., 0])
    )[both]
    assert np.median(pl) < 2.0
    # images agree except isolated boundary pixels
    diff = np.abs(
        culled.image.astype(int) - dense.image.astype(int)
    ).max(-1)
    assert (diff <= 3).mean() > 0.995, (diff <= 3).mean()


@pytest.mark.parametrize("extra", [
    {"straight_rays": True},
    {"earth_shape": "FlatDistorted"},
])
def test_culled_matches_dense_variants(setup, extra, monkeypatch):
    """Envelope culling stays exact across physics variants (straight rays,
    flat-family models)."""
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    d = config.to_dict()
    d["view"]["frame"]["tilt"] = -1.0
    d.update(extra)
    params2 = Config.from_dict(d).into_params(terrain)

    culled = render_rectilinear(params2, terrain)
    monkeypatch.setenv("ATM_RAYTRACER_NO_CULL", "1")
    dense = render_rectilinear(params2, terrain, chunk_rows=16)
    monkeypatch.delenv("ATM_RAYTRACER_NO_CULL")
    cv = np.asarray(culled.hits.valid[..., 0])
    dv = np.asarray(dense.hits.valid[..., 0])
    assert (cv == dv).mean() > 0.998, (cv == dv).mean()
    both = cv & dv
    dd = np.abs(
        np.asarray(culled.hits.distance[..., 0])
        - np.asarray(dense.hits.distance[..., 0])
    )[both]
    assert np.median(dd) < 1.0, np.median(dd)


def test_fetch_image_false_matches_fetched(setup):
    """``fetch_image=False`` (bench device/transfer split) leaves the image
    device-resident but byte-identical after a flat fetch, on every
    generator and on both exact Rectilinear regimes (the flag is host-side
    only, so the device programs are shared with the default path)."""
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.generators.base import fetch_flat
    from atm_raytracer_tpu.generators.interpolating import render_interpolating
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    h, w = params.output.height, params.output.width

    d = config.to_dict()
    d["view"]["frame"]["tilt"] = -1.0  # envelope-culled exact regime
    params_tilt = Config.from_dict(d).into_params(terrain)

    cases = [
        (render_fast, params),
        (render_interpolating, params),
        (render_rectilinear, params),       # fused tilt-0 regime
        (render_rectilinear, params_tilt),  # culled tilted regime
    ]
    for render, p in cases:
        fetched = np.asarray(render(p, terrain).image)
        r = render(p, terrain, fetch_image=False)
        assert not isinstance(r.image, np.ndarray), render.__name__
        flat = fetch_flat(r.image)[: h * w * 3].reshape(h, w, 3)
        np.testing.assert_array_equal(fetched, flat, err_msg=render.__name__)


def test_short_march_below_one_coarse_window(tmp_path):
    """max_distance shorter than one coarse RK4 window (n_seg < coarse): the
    scans clamp the window size internally, so the fused paths' post-scan
    re-expansion and window bookkeeping must clamp identically — regression
    for the k==1 exact re-test rejecting crossings the scan found."""
    import numpy as np_

    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear
    from atm_raytracer_tpu.terrain.store import Terrain, Tile

    terrain = Terrain()
    terrain.add_tile(Tile(
        lat0=49, lon0=21, elev=np_.zeros((121, 121), np_.int16)
    ))
    d = {
        "view": {
            "position": {
                "latitude": 49.5, "longitude": 21.5,
                "altitude": {"Absolute": 60.0},
            },
            # tall fov: bottom rays plunge into the sea-level plane within a
            # few 50 m steps; 500 m => n_seg = 9 < coarse = 16
            "frame": {"direction": 45.0, "fov": 140.0, "max_distance": 500.0},
        },
        "simulation_step": 50.0,
        "output": {"width": 16, "height": 21},
    }
    params = Config.from_dict(d).into_params(terrain)
    r1 = render_rectilinear(params, terrain, max_hits=1)  # k==1 fused path
    v1 = np_.asarray(r1.hits.valid)[..., 0]
    assert v1.any(), "steep rays must hit inside the short march"
    # the k>1 consumer never re-expands; its slot 0 is the oracle
    r2 = render_rectilinear(params, terrain, max_hits=2)
    v2 = np_.asarray(r2.hits.valid)[..., 0]
    np_.testing.assert_array_equal(v1, v2)
    both = v1 & v2
    np_.testing.assert_allclose(
        np_.asarray(r1.hits.key)[..., 0][both],
        np_.asarray(r2.hits.key)[..., 0][both], rtol=1e-6,
    )
    # tilted short march exercises the culled path's clamped blocks
    d["view"]["frame"]["tilt"] = -2.0
    params_t = Config.from_dict(d).into_params(terrain)
    rt = render_rectilinear(params_t, terrain, max_hits=1)
    assert np_.asarray(rt.hits.valid).any()


def test_rectilinear_matches_independent_f64_oracle():
    """Absolute oracle for the per-pixel camera path: independent pure-numpy
    f64 re-derivation (fixtures.f64_flat_straight_oracle) over the
    rectilinear camera's own [H, W] angle grids agrees with the rendered
    hits (measured 9 mm max distance error)."""
    from fixtures import f64_flat_straight_oracle, tile_grid
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear
    from atm_raytracer_tpu.models.camera import rectilinear_ray_params
    from atm_raytracer_tpu.terrain.store import Terrain, Tile

    n = 241
    terrain = Terrain()
    terrain.add_tile(Tile(lat0=49, lon0=21, elev=tile_grid(49, 21, n)))
    cfg = Config.from_dict({
        "earth_shape": "FlatDistorted", "straight_rays": True,
        "view": {"position": {"latitude": 49.5, "longitude": 21.5,
                              "altitude": {"Relative": 30.0}},
                 "frame": {"direction": 70.0, "fov": 8.0,
                           "max_distance": 8000.0, "tilt": 0.0}},
        "simulation_step": 50.0,
        "output": {"width": 24, "height": 16},
    })
    res = render_rectilinear(cfg.into_params(terrain), terrain)
    el, az = rectilinear_ray_params(24, 16, 8.0, 0.0, 70.0)  # radians [H, W]
    has, dist, _elev, robust = f64_flat_straight_oracle(
        tile_grid(49, 21, n).astype(np.float64), 49.5, 21.5, 30.0,
        el, az, 50.0, 8000.0,
    )
    pv = np.asarray(res.hits.valid[..., 0])
    assert pv.sum() > 100
    assert (pv == has).mean() > 0.99
    robust &= pv
    assert robust.sum() > 100
    pd = np.asarray(res.hits.distance[..., 0])
    assert np.abs(pd - dist)[robust].max() < 0.05
