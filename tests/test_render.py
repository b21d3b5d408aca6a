"""Renderer overlays + coloring oracles.

Mirrors the reference's ONE unit test (num_decimals, renderer/mod.rs:439-460)
and adds coverage the reference validates only visually: tick placement and
dedupe (mod.rs:227-268), the eye-level / flat-horizon const-elevation lines
(mod.rs:325-365,416-431), the Simple HSV coloring formula (simple.rs:23-55),
exponential fog (mod.rs:367-376) and front-to-back alpha compositing
(mod.rs:385-414).
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from atm_raytracer_tpu.config import Config, Tick
from atm_raytracer_tpu.ops.coloring import (
    ColoringParams,
    color_hits,
    sky_color,
)
from atm_raytracer_tpu.ops.composite import apply_fog, composite, fog_color
from atm_raytracer_tpu.render.annotate import annotate_image, num_decimals


def test_num_decimals_reference_cases():
    # the 14 assertions from renderer/mod.rs:443-459, verbatim
    assert num_decimals(0.0) == 0
    assert num_decimals(1.0) == 0
    assert num_decimals(15.0) == 0
    assert num_decimals(183.0) == 0
    assert num_decimals(0.1) == 1
    assert num_decimals(0.3) == 1
    assert num_decimals(0.9) == 1
    assert num_decimals(1.8) == 1
    assert num_decimals(12.6) == 1
    assert num_decimals(133.5) == 1
    assert num_decimals(0.25) == 2
    assert num_decimals(33.99) == 2
    assert num_decimals(33.01) == 2
    assert num_decimals(133.01002) == 5


def _params(**out_over):
    cfg = {
        "view": {
            "position": {"latitude": 49.5, "longitude": 21.5,
                         "altitude": {"Absolute": 100.0}},
            "frame": {"direction": 90.0, "fov": 20.0, "max_distance": 10000.0},
        },
        "output": {"width": 200, "height": 100, **out_over},
    }
    config = Config.from_dict(cfg)

    class _NoTerrain:
        def get_elev_or0(self, lat, lon):
            return 0.0

        def get_elev(self, lat, lon):
            return None

    return config.into_params(_NoTerrain())


def test_azimuth_tick_lands_at_center_column():
    params = _params(ticks=[{"Single": {"azimuth": 90.0, "size": 10,
                                        "labelled": False}}])
    w, h = 200, 100
    az = np.linspace(80.0 + 0.05, 100.0 - 0.05, w)
    el = np.linspace(5.0, -5.0, h)
    img = np.zeros((h, w, 3), np.uint8)
    out = annotate_image(img, params, el, az, 100.0)
    cols = np.where((out[:10] == 255).all(-1).any(0))[0]
    assert len(cols) >= 1
    assert abs(cols.mean() - w / 2) < 2.0  # tick at the 90° center column


def test_tick_dedupe_keeps_larger():
    # Multiple every 1° (size 5) + Single at 90° (size 12) collide at the
    # center pixel; the larger must win (mod.rs:258-264)
    params = _params(
        ticks=[
            {"Multiple": {"bias": 0.0, "step": 1.0, "size": 5, "labelled": False}},
            {"Single": {"azimuth": 90.0, "size": 12, "labelled": False}},
        ]
    )
    w, h = 200, 100
    az = np.linspace(80.05, 99.95, w)
    el = np.linspace(5.0, -5.0, h)
    out = annotate_image(np.zeros((h, w, 3), np.uint8), params, el, az, 100.0)
    center = int(np.argmin(np.abs(az - 90.0)))
    col = out[:, center]
    assert (col[:12] == 255).all()  # full 12-pixel tick, not the 5-pixel one


def test_eye_level_line_at_zero_elevation():
    params = _params(show_eye_level=True)
    w, h = 200, 100
    az = np.linspace(80.05, 99.95, w)
    el = np.linspace(5.0, -5.0, h)  # elevation 0 at row ~49.5
    out = annotate_image(np.zeros((h, w, 3), np.uint8), params, el, az, 100.0)
    magenta = (out[..., 0] == 255) & (out[..., 1] == 128) & (out[..., 2] == 255)
    rows = np.where(magenta.any(1))[0]
    assert len(rows) > 0 and abs(rows.mean() - 49.5) < 1.5


def test_flat_horizon_line_only_when_flat_and_refracted():
    w, h = 200, 100
    az = np.linspace(80.05, 99.95, w)
    el = np.linspace(5.0, -5.0, h)

    def render(extra_cfg, straight):
        cfg = {
            "view": {
                "position": {"latitude": 49.5, "longitude": 21.5,
                             "altitude": {"Absolute": 100.0}},
                "frame": {"direction": 90.0, "fov": 20.0, "max_distance": 10000.0},
            },
            "straight_rays": straight,
            "output": {"width": w, "height": h, "show_flat_horizon": True},
            **extra_cfg,
        }
        config = Config.from_dict(cfg)

        class _NoTerrain:
            def get_elev_or0(self, lat, lon):
                return 0.0

        params = config.into_params(_NoTerrain())
        out = annotate_image(np.zeros((h, w, 3), np.uint8), params, el, az, 100.0)
        return (out[..., 0] == 0) & (out[..., 1] == 128) & (out[..., 2] == 255)

    blue_flat = render({"earth_shape": "AzimuthalEquidistant"}, False)
    assert blue_flat.any()
    # at elevation acos(1/n) ≈ +1.4° for n≈1.00027 → above the 0° row
    rows = np.where(blue_flat.any(1))[0]
    n = 1.000277
    expect_elev = math.degrees(math.acos(1.0 / n))
    expect_row = float(np.argmin(np.abs(el - expect_elev)))
    assert abs(rows.mean() - expect_row) < 3.0

    assert not render({"earth_shape": "AzimuthalEquidistant"}, True).any()
    assert not render({}, False).any()  # spherical shape → no line


def _hsv_reference(h, s, v):
    """Independent reimplementation of simple.rs:57-87 for oracle checks."""
    h = h % 360.0
    if h < 0:
        h += 360.0
    c = v * s
    x = c * (1.0 - abs((h / 60.0) % 2.0 - 1.0))
    m = v - c
    sector = int(h // 60.0)
    rp, gp, bp = [
        (c, x, 0.0), (x, c, 0.0), (0.0, c, x), (0.0, x, c), (x, 0.0, c), (c, 0.0, x)
    ][sector]
    return rp + m, gp + m, bp + m


def test_simple_coloring_land_matches_reference_formula():
    p = ColoringParams(kind="Simple", water_level=0.0, max_distance=10000.0)
    for elev, dist in [(500.0, 2000.0), (1500.0, 9000.0), (3200.0, 100.0)]:
        rgb = np.asarray(
            color_hits(
                p,
                jnp.float32([dist]), jnp.float32([elev]),
                jnp.zeros((1, 3)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3)),
            )
        )[0]
        dist_ratio = dist / 10000.0
        elev_ratio = elev / 4500.0
        h = 120.0 - 240.0 * elev_ratio ** 0.65
        v = (2.1 - elev_ratio * 2.0 if elev_ratio > 0.7
             else 0.9 - elev_ratio / 0.7 * 0.2) * (1.0 - dist_ratio * 0.6)
        s = 1.0 - dist_ratio * 0.9
        want = _hsv_reference(h, s, v)
        got = rgb * 255.0
        want_u8 = [int(c * 255.0) for c in want]  # Rust: trunc to u8
        np.testing.assert_allclose(got, want_u8, atol=1.0)


def test_simple_coloring_water_formula():
    p = ColoringParams(kind="Simple", water_level=10.0, max_distance=10000.0)
    rgb = np.asarray(
        color_hits(
            p, jnp.float32([5000.0]), jnp.float32([3.0]),
            jnp.zeros((1, 3)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3)),
        )
    )[0] * 255.0
    mul = 1.0 - 0.5 * 0.6
    assert rgb[0] == 0
    assert abs(rgb[1] - int(128.0 * mul)) <= 1
    assert abs(rgb[2] - int(255.0 * mul)) <= 1


def test_fog_formula_and_fog_base():
    colors = jnp.ones((1, 1, 3), jnp.float32) * 0.2
    plen = jnp.float32([[3000.0]])
    out = np.asarray(apply_fog(colors, plen, 1000.0))[0, 0]
    coeff = 1.0 - math.exp(-3.0)
    want = 0.2 * (1 - coeff) + (160.0 / 255.0) * coeff
    want = math.trunc(want * 255.0) / 255.0  # fog() casts through u8 (mod.rs:372)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_composite_translucent_terrain_blends_to_sky():
    p = ColoringParams(kind="Shading", water_level=-1000.0,
                       light_dir=(0.0, 0.0, 1.0))
    k = 2
    valid = jnp.asarray([[True, False]])
    alpha = jnp.asarray([[0.5, 0.0]], jnp.float32)
    dist = jnp.zeros((1, k), jnp.float32)
    elev = jnp.full((1, k), 100.0, jnp.float32)
    plen = jnp.zeros((1, k), jnp.float32)
    normal = jnp.zeros((1, k, 3), jnp.float32).at[..., 2].set(1.0)
    kind = jnp.zeros((1, k), jnp.int32)
    rgb = jnp.zeros((1, k, 3), jnp.float32)
    img = np.asarray(
        composite(p, None, valid, alpha, dist, elev, plen, normal, kind, rgb)
    )[0]
    terrain_rgb = np.asarray(
        color_hits(p, dist, elev, normal, kind, rgb)
    )[0, 0]
    sky = sky_color(p)
    want = np.trunc((0.5 * terrain_rgb + 0.5 * sky) * 255.0)
    np.testing.assert_allclose(img, want, atol=1.0)


def test_sky_colors_per_palette():
    assert tuple(sky_color(ColoringParams(kind="Simple"))) == (
        pytest.approx(28 / 255), pytest.approx(28 / 255), pytest.approx(28 / 255))
    leg = sky_color(ColoringParams(kind="Shading", palette="Legacy"))
    np.testing.assert_allclose(leg, np.trunc(np.array([0.11, 0.11, 0.11]) * 255) / 255)
    np.testing.assert_allclose(fog_color(), np.array([160, 160, 160]) / 255.0)


def test_vertical_multiple_tick_wraps_past_90deg():
    """A vertical Multiple tick enumerated past +90° is looked up by its
    MIRROR-WRAPPED elevation (mod.rs:179-186): tilt 85°, step 7° enumerates
    91°, which must land on the row showing 89° — the unwrapped lookup
    finds no row and silently drops the tick."""
    params = _params(
        vertical_ticks=[{"Multiple": {"bias": 0.0, "step": 7.0, "size": 8,
                                      "labelled": False}}],
        width=200, height=100,
    )
    params.view.frame.tilt = 85.0
    params.view.frame.fov = 40.0  # aspect 0.5 → vertical half-span 10°
    w, h = 200, 100
    az = np.linspace(80.05, 99.95, w)
    el = np.linspace(89.9, 70.1, h)  # rows top→bottom; 91° wraps to 89°
    out = annotate_image(np.zeros((h, w, 3), np.uint8), params, el, az, 100.0)
    tick_rows = np.where((out[:, :8] == 255).all(-1).any(1))[0]
    # enumerated ticks: 77, 84, 91→89 — three distinct rows, including one
    # near the 89° row (index ~4-5)
    assert len(tick_rows) == 3
    assert tick_rows.min() <= 6


def test_single_tick_label_uses_raw_angle():
    """Single ticks format the RAW configured angle (mod.rs:98,158): a
    Single at -5° is labelled \"-5\", not \"355\"; Multiple labels wrap."""
    from atm_raytracer_tpu.render.annotate import _expand_ticks

    params = _params(ticks=[{"Single": {"azimuth": -5.0, "size": 10,
                                        "labelled": True}}])
    items = _expand_ticks(params.output.ticks, params, vertical=False)
    (lookup, label, _size, _labelled), = items
    assert lookup == -5.0 and label == "-5"

    params = _params(ticks=[{"Multiple": {"bias": 0.0, "step": 10.0,
                                          "size": 10, "labelled": True}}])
    params.view.frame.direction = 0.0  # span (-10, 10): enumerates -10, 0
    items = _expand_ticks(params.output.ticks, params, vertical=False)
    labels = {label for _, label, _, _ in items}
    lookups = {lk for lk, _, _, _ in items}
    assert "350" in labels  # -10 wrapped for display (mod.rs:118-124)
    assert -10.0 in lookups  # but looked up unwrapped (mod.rs:125)


def test_composite_requantizes_after_every_trace_point():
    """The reference's fold returns Rgb<u8> after EVERY add
    (renderer/mod.rs:378-383,406,410): with two translucent hits the
    running sum truncates between adds. Emulate the Rust fold exactly in
    f64 and require equality — an exact-accumulate-then-truncate-once fold
    diverges by 1-2 u8 levels."""
    p = ColoringParams(kind="Shading", water_level=-1000.0,
                       light_dir=(0.0, 0.0, 1.0))
    k = 2
    valid = jnp.asarray([[True, True]])
    alpha = jnp.asarray([[0.5, 0.75]], jnp.float32)
    dist = jnp.zeros((1, k), jnp.float32)
    elev = jnp.zeros((1, k), jnp.float32)
    plen = jnp.zeros((1, k), jnp.float32)
    normal = jnp.zeros((1, k, 3), jnp.float32).at[..., 2].set(1.0)
    kind = jnp.ones((1, k), jnp.int32)  # Rgba objects: own color
    rgb = jnp.asarray([[[0.613, 0.207, 0.101], [0.308, 0.902, 0.404]]],
                      jnp.float32)
    img = np.asarray(
        composite(p, None, valid, alpha, dist, elev, plen, normal, kind, rgb)
    )[0]
    cols = np.asarray(color_hits(p, dist, elev, normal, kind, rgb),
                      np.float64)[0]  # already on the u8 grid
    sky = np.asarray(sky_color(p), np.float64)
    # Rust fold: result is Rgb<u8>; add() = trunc((r/255 + c*a)*255) per step
    result = np.zeros(3)
    accum = 1.0
    for i, a in enumerate([0.5, 0.75]):
        result = np.trunc(
            np.clip(result / 255.0 + cols[i] * (accum * a), 0.0, 1.0) * 255.0
        )
        accum *= 1.0 - a
    result = np.trunc(np.clip(result / 255.0 + sky * accum, 0.0, 1.0) * 255.0)
    np.testing.assert_array_equal(img, result.astype(np.uint8))
