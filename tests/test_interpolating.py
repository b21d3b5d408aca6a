"""InterpolatingRectilinear: grid snapping + 16-case interpolation oracles.

The reference documents this generator as a faster, slightly-less-accurate
Rectilinear (README.md:277); so the cross-check oracle is closeness to the
exact Rectilinear render (SURVEY §4).
"""

import numpy as np
import pytest

from fixtures import make_terrain_folder


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.terrain.store import Terrain

    d = tmp_path_factory.mktemp("terrain_interp")
    make_terrain_folder(d, tiles=((49, 21),), n=241)
    config = Config.from_dict(
        {
            "view": {
                "position": {
                    "latitude": 49.5,
                    "longitude": 21.5,
                    "altitude": {"Relative": 40.0},
                },
                "frame": {"direction": 50.0, "fov": 8.0, "max_distance": 10000.0},
            },
            "simulation_step": 50.0,
            "output": {"width": 40, "height": 28},
        }
    )
    terrain = Terrain.from_folder(d)
    return config, terrain, config.into_params(terrain)


def test_fov_data_matches_reference_rules():
    from atm_raytracer_tpu.generators.interpolating import gen_fov_data

    elev, dirr, min_es, min_ds = gen_fov_data(64, 48, 20.0, 0.0, 90.0)
    # steps are 1.5x a per-pixel delta, bounded below by fov/width/3 * 1.5
    per_px = np.deg2rad(20.0) / 64
    assert min_es >= per_px / 3.0 * 1.5 - 1e-12
    assert min_es <= per_px * 1.6
    assert min_ds >= per_px / 3.0 * 1.5 - 1e-12
    assert min_ds <= per_px * 1.6


def test_interpolating_close_to_rectilinear(setup):
    from atm_raytracer_tpu.generators.interpolating import render_interpolating
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    interp = render_interpolating(params, terrain)
    rect = render_rectilinear(params, terrain, chunk_rows=14)
    assert interp.image.shape == rect.image.shape
    # sky/terrain split agreement
    agree = (interp.hits.valid.any(-1)) == (rect.hits.valid.any(-1))
    assert agree.mean() > 0.93, agree.mean()
    # distances close where both hit (first hit)
    both = interp.hits.valid[..., 0] & rect.hits.valid[..., 0]
    dd = np.abs(interp.hits.distance[..., 0] - rect.hits.distance[..., 0])[both]
    assert np.median(dd) < 150.0
    # image colors close (u8 space) for the overwhelming majority of pixels
    diff = np.abs(interp.image.astype(int) - rect.image.astype(int)).max(-1)
    assert (diff <= 8).mean() > 0.9, (diff <= 8).mean()


def test_grouping_kind_interleave_does_not_split():
    """collect_trace_points (:213-243) matches same-CLASS entries only: an
    object / terrain / object interleave within one step must yield 2 groups
    (the middle terrain entry does not split the object pair)."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.generators.base import HitBuffer
    from atm_raytracer_tpu.generators.interpolating import _interpolate_pixels

    kg = 3  # per-corner slots: obj@1000, terrain@1020, obj@1040
    dist = jnp.broadcast_to(
        jnp.array([1000.0, 1020.0, 1040.0], jnp.float32), (2, 2, kg)
    )
    kind = jnp.broadcast_to(jnp.array([1, 0, 1], jnp.int32), (2, 2, kg))
    ones = jnp.ones((2, 2, kg), jnp.float32)
    grid = HitBuffer(
        valid=jnp.ones((2, 2, kg), bool),
        key=dist / 50.0,
        dlat=ones * 0.01,
        dlon=ones * 0.01,
        distance=dist,
        elevation=ones * 100.0,
        path_length=dist,
        normal=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), (2, 2, kg, 3)
        ),
        kind=kind,
        rgba=jnp.ones((2, 2, kg, 4), jnp.float32),
    )
    gi = jnp.zeros((1, 1), jnp.int32)
    gj = jnp.zeros((1, 1), jnp.int32)
    half = jnp.full((1, 1), 0.5, jnp.float32)
    out = _interpolate_pixels(grid, gi, gj, half, half, 50.0, 2 * kg)
    valid = np.asarray(out.valid[0, 0])
    assert valid.sum() == 2, valid  # 2 groups, not 3
    kinds = np.asarray(out.kind[0, 0])[valid.astype(bool)]
    dists = np.asarray(out.distance[0, 0])[valid.astype(bool)]
    # slot 0 = object group (min dist 1000; last member per corner = 1040),
    # slot 1 = terrain group at 1020
    assert list(kinds) == [1, 0]
    assert abs(dists[0] - 1040.0) < 1e-3
    assert abs(dists[1] - 1020.0) < 1e-3


def test_interpolating_angles_bilinear(setup):
    from atm_raytracer_tpu.generators.interpolating import (
        gen_fov_data,
        render_interpolating,
    )

    config, terrain, params = setup
    res = render_interpolating(params, terrain)
    out = params.output
    elev, dirr, min_es, min_ds = gen_fov_data(
        out.width, out.height, params.view.frame.fov,
        params.view.frame.tilt, params.view.frame.direction,
    )
    # the interpolated angle grid approximates the true camera angles to
    # within one grid cell
    err_e = np.abs(np.deg2rad(res.elevation_deg) - elev)
    err_d = np.abs(np.deg2rad(res.azimuth_deg) - dirr)
    assert err_e.max() < min_es * 1.01
    assert err_d.max() < min_ds * 1.01


def test_progress_percent_lines(setup):
    """Per-percent progress (interpolating_rectilinear.rs:141-150)."""
    from atm_raytracer_tpu.generators.interpolating import render_interpolating

    config, terrain, params = setup
    seen = []
    render_interpolating(params, terrain, progress=seen.append)
    assert seen, "no progress reported"
    assert max(seen) == 100
    assert all(0 <= p <= 100 for p in seen)


def test_due_south_seam_grid_is_narrow(setup):
    """A view straddling the ±180° atan2 seam must NOT make the snapped grid
    span the whole circle: pixel directions are unwrapped about the camera
    (the reference's HashMap is sparse so it never noticed; a dense grid
    explodes ~20× in azimuth columns and can exhaust device memory)."""
    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators.interpolating import (
        _camera_grids,
        render_interpolating,
    )
    from atm_raytracer_tpu.generators.rectilinear import render_rectilinear

    config, terrain, params = setup
    d = config.to_dict()
    d["view"]["frame"]["direction"] = 180.0  # due south: seam in view
    params_s = Config.from_dict(d).into_params(terrain)
    out, frame = params_s.output, params_s.view.frame

    *_, grid_az_deg, _e, _a = _camera_grids(
        out.width, out.height, float(frame.fov), float(frame.tilt),
        float(frame.direction),
    )
    # narrow: proportional to the fov (plus snapping slack), nowhere near 360°
    span = float(grid_az_deg.max() - grid_az_deg.min())
    assert span < 3.0 * frame.fov, span

    interp = render_interpolating(params_s, terrain)
    rect = render_rectilinear(params_s, terrain, chunk_rows=14)
    agree = (interp.hits.valid.any(-1)) == (rect.hits.valid.any(-1))
    assert agree.mean() > 0.93, agree.mean()
    both = interp.hits.valid[..., 0] & rect.hits.valid[..., 0]
    assert both.any()
    dd = np.abs(interp.hits.distance[..., 0] - rect.hits.distance[..., 0])[both]
    assert np.median(dd) < 150.0


def test_key_is_march_position(setup):
    """HitBuffer.key must honor the base.py contract (march position
    k + prop, distance ≈ key·step) — meta/pack derives staged viewer
    distances from it (a slot-rank key corrupts them silently)."""
    from atm_raytracer_tpu.generators.interpolating import render_interpolating

    config, terrain, params = setup
    r = render_interpolating(params, terrain)
    valid = np.asarray(r.hits.valid)
    key = np.asarray(r.hits.key)
    dist = np.asarray(r.hits.distance)
    assert valid.any()
    err = np.abs(key[valid] * params.simulation_step - dist[valid])
    assert np.max(err) < 1.0, np.max(err)  # f32 rounding only
    assert np.isinf(key[~valid]).all()


def test_group_ranks_loop_parity():
    """The fori_loop grouping (used when E > _GROUP_UNROLL_MAX_E; object and
    translucent grids) must be BIT-identical to the unrolled pairwise form
    (the plain-scene path) — same selects/mins, no reassociation. Random
    entry soups with step-close clusters, interleaved kinds, and invalid
    ballast exercise every branch of collect_trace_points semantics."""
    import jax.numpy as jnp
    from atm_raytracer_tpu.generators.interpolating import (
        _group_slot_ranks_loop, _group_slot_ranks_unrolled,
    )

    rng = np.random.default_rng(7)
    for e_n, h, w, step in ((4, 5, 6, 50.0), (8, 4, 4, 100.0),
                            (16, 3, 7, 50.0), (32, 2, 5, 25.0)):
        valid = rng.random((e_n, h, w)) < 0.6
        # cluster distances so same-group merges actually occur
        dist = (rng.integers(0, 4, (e_n, h, w)) * (3.0 * step)
                + rng.random((e_n, h, w)) * 1.8 * step).astype(np.float32)
        kind = rng.integers(0, 3, (e_n, h, w)).astype(np.float32)
        args = (jnp.asarray(valid), jnp.asarray(dist), jnp.asarray(kind),
                step)
        ranks_u = np.asarray(_group_slot_ranks_unrolled(*args))
        ranks_l = np.asarray(_group_slot_ranks_loop(*args))
        np.testing.assert_array_equal(ranks_l, ranks_u, err_msg=f"E={e_n}")
