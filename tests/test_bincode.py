"""Reference-metadata bincode interop (src/generator/mod.rs:26-45).

No Rust toolchain exists in this environment, so the layout (transcribed
from the in-tree type definitions — see meta/bincode.py) is validated by
round-trip through our own encoder, including the two defensively-handled
unknowns: the opaque atm-refraction Environment bytes (skipped by
anchor-scan) and both nalgebra Vector3 serde layouts.
"""

import gzip

import numpy as np
import pytest

from atm_raytracer_tpu.meta import bincode as B


def _sample_params(env_raw: bytes):
    return {
        "scene": {
            "terrain_folder": "./terrain",
            "objects": [
                {
                    "position": {"lat": 49.55, "lon": 21.62, "elev": 401.5},
                    "shape": {"Frustum": {"r1": 20.0, "r2": 5.0, "height": 120.0}},
                    "color": {"r": 0.9, "g": 0.2, "b": 0.1, "a": 0.75},
                },
                {
                    "position": {"lat": 49.52, "lon": 21.58, "elev": 380.0},
                    "shape": {"Billboard": {
                        "width": 30.0, "height": 20.0,
                        "texture_path": "tex/tree.png",
                    }},
                    "color": {"r": 1.0, "g": 1.0, "b": 1.0, "a": 1.0},
                },
            ],
            "terrain_alpha": 0.8,
        },
        "view": {
            "position": {
                "latitude": 49.5, "longitude": 21.5,
                "altitude": {"Relative": 100.0},
            },
            "frame": {"direction": 45.0, "tilt": 0.5, "fov": 30.0,
                      "max_distance": 150_000.0},
            "coloring": {"Shading": {
                "water_level": 0.0, "ambient_light": 0.4,
                "light_dir_world": [0.1, -0.2, 0.97],
                "palette": "Improved",
            }},
            "fog_distance": 80_000.0,
        },
        "model": {"Spherical": {"radius": 6_371_000.0}},
        "env_raw": env_raw,
        "straight_rays": False,
        "simulation_step": 50.0,
        "output": {
            "file": "./output.png",
            "file_metadata": "./output.dat",
            "width": 5,
            "height": 4,
            "ticks": [
                {"Single": {"azimuth": 45.0, "size": 10, "labelled": True}},
                {"Multiple": {"bias": 0.0, "step": 5.0, "size": 6,
                              "labelled": False}},
            ],
            "vertical_ticks": [
                {"Multiple": {"bias": 0.0, "step": 1.0, "size": 5,
                              "labelled": True}},
            ],
            "show_eye_level": True,
            "show_flat_horizon": False,
            "generator": "Rectilinear",
        },
    }


def _sample_result(h=4, w=5, k=2):
    rng = np.random.RandomState(7)

    class Hits:
        valid = rng.rand(h, w, k) < 0.6
        dlat = rng.randn(h, w, k).astype(np.float64) * 0.01
        dlon = rng.randn(h, w, k).astype(np.float64) * 0.01
        distance = (rng.rand(h, w, k) * 1e5).astype(np.float64)
        elevation = (rng.randn(h, w, k) * 100).astype(np.float64)
        path_length = (rng.rand(h, w, k) * 1e5).astype(np.float64)
        normal = rng.randn(h, w, k, 3).astype(np.float64)
        kind = (rng.rand(h, w, k) < 0.3).astype(np.int32)
        rgba = rng.rand(h, w, k, 4).astype(np.float64)

    # first slot of the first pixel always valid (stable spot checks)
    Hits.valid[0, 0, 0] = True
    # HitBuffer contract: key is the march sort position, distance = key*step
    # (distinct per slot — equal keys would make compaction order a
    # tie-break accident)
    Hits.key = np.where(
        Hits.valid, Hits.distance / 50.0, np.inf
    ).astype(np.float32)
    elev = rng.randn(h, w) * 2.0
    az = 45.0 + rng.randn(h, w)
    return elev, az, Hits


# an "atmosphere" blob of awkward bytes: includes gzip magic, fake enum
# tags, utf8-looking runs and float-like patterns to stress the anchor scan
_ENV = (b"\x1f\x8b\x00\x00" + bytes(range(256)) * 3
        + np.array([101325.0, 288.15, -0.0065, 530e-9]).tobytes() + b"\x02\x00\x00\x00")


@pytest.mark.parametrize("vec3_prefixed", [False, True])
def test_roundtrip(vec3_prefixed):
    params = _sample_params(_ENV)
    elev, az, hits = _sample_result()
    blob = B.encode_alldata(params, elev, az, hits,
                            vec3_prefixed=vec3_prefixed)
    assert blob[:2] == B.GZIP_MAGIC
    p2, elev2, az2, hb = B.decode_alldata(blob)

    assert p2["scene"]["terrain_folder"] == "./terrain"
    assert p2["scene"]["terrain_alpha"] == 0.8
    assert len(p2["scene"]["objects"]) == 2
    assert p2["scene"]["objects"][1]["shape"]["Billboard"]["texture_path"] == "tex/tree.png"
    assert p2["view"]["frame"]["max_distance"] == 150_000.0
    sh = p2["view"]["coloring"]["Shading"]
    np.testing.assert_allclose(sh["light_dir_world"], [0.1, -0.2, 0.97])
    assert p2["view"]["fog_distance"] == 80_000.0
    assert p2["model"] == {"Spherical": {"radius": 6_371_000.0}}
    assert p2["env_raw"] == _ENV
    assert p2["straight_rays"] is False
    assert p2["simulation_step"] == 50.0
    assert p2["output"]["width"] == 5 and p2["output"]["height"] == 4
    assert p2["output"]["generator"] == "Rectilinear"
    assert p2["output"]["ticks"][0]["Single"]["azimuth"] == 45.0
    assert p2["output"]["vertical_ticks"][0]["Multiple"]["labelled"] is True

    np.testing.assert_allclose(elev2, elev)
    np.testing.assert_allclose(az2, az)
    np.testing.assert_array_equal(
        hb.valid.sum(-1), np.asarray(hits.valid).sum(-1)
    )
    # spot-check one trace point end to end (compaction reorders slots)
    i, j = 0, 0
    s_src = int(np.nonzero(hits.valid[i, j])[0][0])
    np.testing.assert_allclose(
        hb.distance[i, j, 0], hits.distance[i, j, s_src], rtol=1e-6
    )
    np.testing.assert_allclose(
        hb.dlat[i, j, 0], hits.dlat[i, j, s_src], atol=1e-9
    )
    np.testing.assert_allclose(
        hb.normal[i, j, 0], hits.normal[i, j, s_src], rtol=1e-6
    )
    assert hb.kind[i, j, 0] == hits.kind[i, j, s_src]


def test_unit_and_simple_variants():
    params = _sample_params(b"\x00" * 40)
    params["model"] = "Wgs84"
    params["view"]["coloring"] = {"Simple": {"water_level": 2.0,
                                             "max_distance": 99.0}}
    params["view"]["fog_distance"] = None
    params["output"]["file_metadata"] = None
    params["output"]["ticks"] = []
    params["output"]["vertical_ticks"] = []
    params["straight_rays"] = True
    elev, az, hits = _sample_result()
    p2, _, _, _ = B.decode_alldata(
        B.encode_alldata(params, elev, az, hits)
    )
    assert p2["model"] == "Wgs84"
    assert p2["view"]["coloring"]["Simple"]["max_distance"] == 99.0
    assert p2["view"]["fog_distance"] is None
    assert p2["output"]["file_metadata"] is None
    assert p2["straight_rays"] is True


def test_viewer_opens_bincode_artifact(tmp_path):
    """`view` on a Rust-style .dat: load, re-render, pixel info."""
    from atm_raytracer_tpu.meta.serialize import load_metadata
    from atm_raytracer_tpu.meta.viewer import _render_from_metadata, pixel_info

    params = _sample_params(_ENV)
    elev, az, hits = _sample_result()
    path = tmp_path / "ref.dat"
    path.write_bytes(B.encode_alldata(params, elev, az, hits))

    config, result = load_metadata(path)
    assert config.output.width == 5 and config.output.height == 4
    # the lowered world light vector survives the angle inversion exactly
    lowered = config.view.coloring.into_coloring(
        config.view.frame, config.view.position, config.earth_shape
    )
    light = np.asarray(lowered.light_dir)
    np.testing.assert_allclose(
        light, np.asarray([0.1, -0.2, 0.97]) / np.linalg.norm([0.1, -0.2, 0.97]),
        atol=1e-12,
    )
    img = _render_from_metadata(config, result)
    assert img.shape == (4, 5, 3) and img.dtype == np.uint8
    info = pixel_info(config, result, 0, 0)
    assert "dist" in info or "distance" in info.lower()


def test_observer_ae_artifact_loads(tmp_path):
    """ObserverAe artifacts must survive load_metadata: the bincode field
    key has to match EarthModel.from_config's grammar (projection_radius) —
    regression for a decoder that emitted 'proj_radius' and crashed every
    ObserverAe reference artifact."""
    from atm_raytracer_tpu.meta.serialize import load_metadata

    params = _sample_params(_ENV)
    params["model"] = {"ObserverAe": {"projection_radius": 6_371_000.0}}
    elev, az, hits = _sample_result()
    path = tmp_path / "ae.dat"
    path.write_bytes(B.encode_alldata(params, elev, az, hits))
    config, result = load_metadata(path)
    assert config.earth_shape.kind == "ObserverAe"


def test_raw_uncompressed_bincode_loads(tmp_path):
    """decode_alldata accepts raw bincode; load_metadata must route it
    there (anything without zip magic) instead of np.load."""
    from atm_raytracer_tpu.meta.serialize import load_metadata

    params = _sample_params(_ENV)
    elev, az, hits = _sample_result()
    path = tmp_path / "raw.dat"
    path.write_bytes(B.encode_alldata(params, elev, az, hits, compress=False))
    config, result = load_metadata(path)
    assert config.output.width == 5 and config.output.height == 4


def test_corrupt_artifact_errors():
    params = _sample_params(_ENV)
    elev, az, hits = _sample_result()
    raw = gzip.decompress(B.encode_alldata(params, elev, az, hits))
    with pytest.raises(B.BincodeError):
        B.decode_alldata(raw[: len(raw) // 2])  # truncated


def test_fuzzed_artifact_never_crashes():
    """Corrupted reference artifacts must fail with the documented error
    family (BincodeError/ValueError/gzip-OSError/EOFError), never an
    internal IndexError/struct.error/KeyError — the viewer surfaces these
    as a clean ERROR line (main.rs:36-38 analog)."""
    params = _sample_params(_ENV)
    elev, az, hits = _sample_result()
    blob = B.encode_alldata(params, elev, az, hits)  # gzipped
    raw = gzip.decompress(blob)
    rng = np.random.RandomState(41)
    ok_types = (B.BincodeError, ValueError, OSError, EOFError)

    def attempt(data):
        try:
            B.decode_alldata(bytes(data))
        except ok_types:
            pass  # clean, documented failure
        # benign mutations (env padding, float payloads) may still decode

    for src in (blob, raw):
        for _ in range(120):
            buf = bytearray(src)
            mode = rng.randint(3)
            if mode == 0:  # single byte flip
                i = rng.randint(len(buf))
                buf[i] ^= 1 << rng.randint(8)
            elif mode == 1:  # truncate
                buf = buf[: rng.randint(len(buf))]
            else:  # splice a random run
                i = rng.randint(len(buf))
                n = min(rng.randint(1, 32), len(buf) - i)
                buf[i:i + n] = rng.bytes(n)
            attempt(buf)
    attempt(b"")
    attempt(b"\x1f\x8b")
    attempt(rng.bytes(4096))


def test_observer_ae_encode_accepts_both_spellings(tmp_path):
    """EarthModel.to_config emits the reference serde spelling
    (`proj_radius`, earth_model/mod.rs:26); the encoder must take either
    that or the README's `projection_radius`."""
    from atm_raytracer_tpu.meta.serialize import load_metadata

    elev, az, hits = _sample_result()
    for spelling in ("proj_radius", "projection_radius"):
        params = _sample_params(_ENV)
        params["model"] = {"ObserverAe": {spelling: 1_250_000.0}}
        path = tmp_path / f"ae_{spelling}.dat"
        path.write_bytes(B.encode_alldata(params, elev, az, hits))
        config, _ = load_metadata(path)
        assert config.earth_shape.kind == "ObserverAe"
        assert config.earth_shape.radius == 1_250_000.0


def test_gen_side_reference_artifact_roundtrip(tmp_path):
    """The gen-side write path (`--output-meta x.dat --meta-format
    reference`, meta/serialize.py::save_metadata fmt="reference") emits
    gzip(bincode(AllData)) that (a) is byte-stable across writes, (b) our
    own reader reopens with the render's hits exactly, and (c) carries the
    documented best-effort Environment bytes (encode_environment).
    Reference layout: src/generator/mod.rs:26-45."""
    from fixtures import make_terrain_folder

    from atm_raytracer_tpu.config import Config, atmosphere_def_to_dict
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.meta.serialize import (
        load_metadata, reference_params_dict, save_metadata,
    )
    from atm_raytracer_tpu.terrain.store import Terrain

    terrain_dir = make_terrain_folder(tmp_path, tiles=((49, 21),), n=121)
    cfg = Config.from_dict({
        "scene": {"terrain_folder": str(terrain_dir), "terrain_alpha": 0.9},
        "view": {
            "position": {"latitude": 49.5, "longitude": 21.5,
                         "altitude": {"Relative": 20.0}},
            "frame": {"direction": 30.0, "fov": 10.0,
                      "max_distance": 4000.0},
            "fog_distance": 8000.0,
        },
        "simulation_step": 50.0,
        "output": {"width": 40, "height": 30,
                   "file": str(tmp_path / "o.png")},
    })
    terrain = Terrain.from_folder(terrain_dir)
    result = render_fast(cfg.into_params(terrain), terrain)

    p1, p2 = tmp_path / "out.dat", tmp_path / "out2.dat"
    save_metadata(p1, cfg, result, fmt="reference", terrain=terrain)
    save_metadata(p2, cfg, result, fmt="reference", terrain=terrain)
    assert p1.read_bytes() == p2.read_bytes()  # bit-stable
    assert p1.read_bytes()[:2] == B.GZIP_MAGIC

    cfg2, result2 = load_metadata(p1)
    assert cfg2.earth_shape.kind == "Spherical"
    assert cfg2.view.fog_distance == 8000.0
    assert cfg2.simulation_step == 50.0
    assert cfg2.scene.terrain_alpha == 0.9

    # angle grids: the Fast generator's separable [H]/[W] vectors round-trip
    # as the broadcast [H, W] grids the reference stores per pixel
    elev2 = np.asarray(result2.elevation_deg)
    az2 = np.asarray(result2.azimuth_deg)
    np.testing.assert_array_equal(
        elev2, np.broadcast_to(
            np.asarray(result.elevation_deg, np.float64)[:, None],
            elev2.shape,
        ),
    )
    np.testing.assert_array_equal(
        az2, np.broadcast_to(
            np.asarray(result.azimuth_deg, np.float64)[None, :], az2.shape,
        ),
    )

    # hits round-trip exactly: compare valid-slot-compacted fields (the
    # reader re-compacts slots to the front; values must be bit-equal)
    v1 = np.asarray(result.hits.valid)
    v2 = np.asarray(result2.hits.valid)
    assert v1.sum() == v2.sum() > 0
    for field in ("dlat", "dlon", "distance", "elevation", "path_length"):
        a = np.asarray(getattr(result.hits, field), np.float32)[v1]
        b = np.asarray(getattr(result2.hits, field), np.float32)[v2]
        np.testing.assert_array_equal(a, b, err_msg=field)
    np.testing.assert_array_equal(
        np.asarray(result.hits.normal, np.float32)[v1],
        np.asarray(result2.hits.normal, np.float32)[v2],
    )
    np.testing.assert_array_equal(
        np.asarray(result.hits.rgba, np.float32)[v1],
        np.asarray(result2.hits.rgba, np.float32)[v2],
    )

    # the Environment segment is the documented encoding of this config's
    # shape + AtmosphereDef + wavelength (best-effort layout; PARITY.md)
    raw_params, _, _, _ = B.decode_alldata(p1.read_bytes())
    assert raw_params["env_raw"] == B.encode_environment(
        cfg.earth_shape.to_shape().radius,
        atmosphere_def_to_dict(cfg.atmosphere), cfg.wavelength,
    )
    assert len(raw_params["env_raw"]) > 0


def test_encode_environment_layout():
    """Pin the documented Environment byte layout (encode_environment
    docstring): flat vs spherical tags, Linear/Spline temp functions,
    boundary conditions, optional fixed point."""
    import struct

    # Flat shape, minimal atmosphere, no fixed point
    blob = B.encode_environment(None, {
        "pressure": {"altitude": 0.0, "pressure": 101325.0},
        "first_temperature_function": {"Linear": {"gradient": -0.0065}},
        "next_functions": [],
        "temperature_fixed_point": None,
    }, 530e-9)
    want = (struct.pack("<I", 0)                      # Flat
            + struct.pack("<dd", 0.0, 101325.0)       # pressure fixed point
            + struct.pack("<I", 0)                    # Linear
            + struct.pack("<d", -0.0065)
            + struct.pack("<Q", 0)                    # next_functions len
            + b"\x00"                                 # Option None
            + struct.pack("<d", 530e-9))
    assert blob == want

    # Spherical + spline w/ Derivatives BC + fixed point
    blob = B.encode_environment(6_371_000.0, {
        "pressure": {"altitude": 100.0, "pressure": 90000.0},
        "first_temperature_function": {"Spline": {
            "boundary_condition": {"Derivatives": [[-0.0065, 0.0]]},
            "points": [[100.0, 288.0], [200.0, 287.0]],
        }},
        "next_functions": [
            {"altitude": 200.0,
             "function": {"Linear": {"gradient": -0.0065}}},
        ],
        "temperature_fixed_point": {"altitude": 0.0, "temperature": 288.15},
    }, 650e-9)
    want = (struct.pack("<I", 1) + struct.pack("<d", 6_371_000.0)
            + struct.pack("<dd", 100.0, 90000.0)
            + struct.pack("<I", 1)                    # Spline
            + struct.pack("<I", 1)                    # Derivatives
            + struct.pack("<dd", -0.0065, 0.0)
            + struct.pack("<Q", 2)
            + struct.pack("<dd", 100.0, 288.0)
            + struct.pack("<dd", 200.0, 287.0)
            + struct.pack("<Q", 1)
            + struct.pack("<d", 200.0)
            + struct.pack("<I", 0) + struct.pack("<d", -0.0065)
            + b"\x01" + struct.pack("<dd", 0.0, 288.15)
            + struct.pack("<d", 650e-9))
    assert blob == want
