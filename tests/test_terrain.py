"""Terrain: parser round-trips, store semantics, device gather vs host."""

import numpy as np
import pytest

from atm_raytracer_tpu.models.earth import EarthModel
from atm_raytracer_tpu.terrain import (
    Terrain,
    coords_from_name,
    read_dted,
    read_dted_header,
    read_geotiff,
    sample_elevation,
    sample_terrain_data,
    write_dted,
    write_geotiff,
)
from fixtures import analytic_hills, make_terrain_folder, tile_grid


def test_dted_roundtrip(tmp_path):
    grid = tile_grid(49, 21, 61)
    grid[0, 0] = -42  # exercise signed-magnitude encoding
    p = tmp_path / "n49_e021.dt2"
    write_dted(p, 49, 21, grid)
    hdr = read_dted_header(p)
    assert hdr.origin_lat == 49 and hdr.origin_lon == 21
    assert hdr.n_lat == 61 and hdr.n_lon == 61
    hdr2, elev = read_dted(p)
    np.testing.assert_array_equal(elev, grid.astype(np.float32))


def test_dted_negative_lon(tmp_path):
    grid = tile_grid(49, 21, 13)
    p = tmp_path / "s02_w071.dt2"
    write_dted(p, -2, -71, grid)
    hdr = read_dted_header(p)
    assert hdr.origin_lat == -2 and hdr.origin_lon == -71


def test_geotiff_roundtrip(tmp_path):
    grid = tile_grid(49, 21, 61)
    p = tmp_path / "N49E021.tif"
    write_geotiff(p, grid[::-1])
    img = read_geotiff(p)
    np.testing.assert_array_equal(img, grid[::-1].astype(np.float32))
    assert coords_from_name(p) == (49, 21)
    assert coords_from_name("S23W071.hgt.tif") == (-23, -71)
    assert coords_from_name("nothing.tif") is None


def test_store_bilinear_matches_analytic(tmp_path):
    make_terrain_folder(tmp_path, tiles=((49, 21),), n=601, fmt="dted")
    t = Terrain.from_folder(tmp_path)
    # mid-tile: bilinear of a smooth function on a 600-interval grid
    for lat, lon in [(49.5, 21.5), (49.979439, 21.622839), (49.0, 21.0)]:
        got = t.get_elev(lat, lon)
        expect = analytic_hills(lat, lon)
        assert got == pytest.approx(expect, abs=2.0)
    # outside any tile: None → callers use 0.0
    assert t.get_elev(48.5, 21.5) is None
    assert t.get_elev_or0(48.5, 21.5) == 0.0


def test_device_sample_matches_host(tmp_path):
    make_terrain_folder(tmp_path, tiles=((49, 21), (49, 22)), n=241, fmt="dted")
    t = Terrain.from_folder(tmp_path)
    pack = t.pack((49.0, 50.0), (21.0, 23.0))
    lat0, lon0 = 49.4, 21.9
    rng = np.random.RandomState(0)
    dlat = rng.uniform(-0.35, 0.55, 300).astype(np.float32)
    dlon = rng.uniform(-0.85, 1.05, 300).astype(np.float32)
    got = np.asarray(sample_elevation(pack, dlat, dlon, lat0, lon0))
    expect = np.array(
        [t.get_elev_or0(lat0 + a, lon0 + b) for a, b in zip(dlat, dlon)]
    )
    np.testing.assert_allclose(got, expect, atol=0.5)


def test_device_sample_missing_tile_is_zero(tmp_path):
    make_terrain_folder(tmp_path, tiles=((49, 21),), n=61)
    t = Terrain.from_folder(tmp_path)
    pack = t.pack((48.0, 50.0), (20.0, 22.0))
    got = np.asarray(
        sample_elevation(
            pack,
            np.float32([0.0, -1.0]),  # second point falls in missing tile
            np.float32([0.0, 0.0]),
            49.5,
            21.5,
        )
    )
    assert got[0] != 0.0
    assert got[1] == 0.0


def test_mixed_resolution_pack(tmp_path):
    # two tiles with different post counts in one pack
    grid_a = tile_grid(49, 21, 121)
    grid_b = tile_grid(49, 22, 61)
    write_dted(tmp_path / "a.dt2", 49, 21, grid_a)
    write_dted(tmp_path / "b.dt2", 49, 22, grid_b)
    t = Terrain.from_folder(tmp_path)
    pack = t.pack((49.0, 50.0), (21.0, 23.0))
    got = np.asarray(
        sample_elevation(
            pack,
            np.float32([0.1, 0.1]),
            np.float32([0.3, 1.3]),
            49.2,
            21.2,
        )
    )
    assert got[0] == pytest.approx(t.get_elev(49.3, 21.5), abs=0.5)
    assert got[1] == pytest.approx(t.get_elev(49.3, 22.5), abs=0.5)


def test_normals_point_up_and_tilt_downhill(tmp_path):
    make_terrain_folder(tmp_path, tiles=((49, 21),), n=241)
    t = Terrain.from_folder(tmp_path)
    pack = t.pack((49.0, 50.0), (21.0, 22.0))
    model = EarthModel(kind="Spherical", radius=6371000.0)
    lat0, lon0 = 49.5, 21.5
    dlat = np.float32([0.0, 0.07, -0.13])
    dlon = np.float32([0.0, 0.11, 0.21])
    elev, normal = sample_terrain_data(pack, model, dlat, dlon, lat0, lon0)
    normal = np.asarray(normal)
    # unit length
    np.testing.assert_allclose(np.linalg.norm(normal, axis=-1), 1.0, atol=1e-5)
    # positive component along local up
    _, _, up = model.world_directions(lat0 + dlat.astype(np.float64),
                                      lon0 + dlon.astype(np.float64))
    up_dot = (normal * up).sum(-1)
    assert (up_dot > 0.5).all()
    # compare against analytic gradient of the landscape at point 0
    eps = 1e-4
    dz_dlat = (analytic_hills(lat0 + eps, lon0) - analytic_hills(lat0 - eps, lon0)) / (
        2 * eps
    )  # m per degree
    # normal's north component ~ -slope_north * up_component (small slopes)
    m_per_deg_lat = np.deg2rad(1.0) * 6371000.0
    slope_north = dz_dlat / m_per_deg_lat
    north0, _, up0 = model.world_directions(lat0, lon0)
    n0 = normal[0]
    got_slope = -(n0 @ north0) / (n0 @ up0)
    assert got_slope == pytest.approx(slope_north, rel=0.1, abs=5e-3)


def test_gradient_normals_close_to_reference_mode(tmp_path):
    from atm_raytracer_tpu.terrain import sample_terrain_data

    make_terrain_folder(tmp_path, tiles=((49, 21),), n=241)
    t = Terrain.from_folder(tmp_path)
    pack = t.pack((49.0, 50.0), (21.0, 22.0))
    model = EarthModel(kind="Spherical", radius=6371000.0)
    rng = np.random.RandomState(1)
    dlat = rng.uniform(0.05, 0.45, 200).astype(np.float32)
    dlon = rng.uniform(0.05, 0.45, 200).astype(np.float32)
    _, n_grad = sample_terrain_data(pack, model, dlat, dlon, 49.3, 21.3,
                                    normal_mode="gradient")
    _, n_ref = sample_terrain_data(pack, model, dlat, dlon, 49.3, 21.3,
                                   normal_mode="reference")
    # same direction within a few degrees (the ±15 m arms smooth over cell
    # boundaries; the landscape is smooth at this resolution)
    cos = (np.asarray(n_grad) * np.asarray(n_ref)).sum(-1)
    assert (cos > 0.995).mean() > 0.95


def test_native_loader_matches_python_parser(tmp_path):
    from atm_raytracer_tpu.terrain import native

    if not native.available():
        import subprocess, pathlib
        build = (pathlib.Path(__file__).parents[1]
                 / "atm_raytracer_tpu" / "native" / "build.sh")
        subprocess.run(["sh", str(build)], check=True)
    assert native.available()
    grid = tile_grid(49, 21, 121)
    grid[3, 7] = -123  # signed magnitude path
    p = tmp_path / "n49_e021.dt2"
    write_dted(p, 49, 21, grid)
    info = native.probe(p)
    assert info == (49.0, 21.0, 121, 121)
    tiles, origins, status = native.load_batch([p, p], 121, 121, max_threads=2)
    assert (status == 0).all()
    np.testing.assert_array_equal(origins, [[49, 21], [49, 21]])
    _, expect = read_dted(p)
    np.testing.assert_array_equal(tiles[0], expect)
    np.testing.assert_array_equal(tiles[1], expect)
    # non-DTED file probes as None
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"not a tile")
    assert native.probe(junk) is None


def test_native_geotiff_matches_python_parser(tmp_path):
    from atm_raytracer_tpu.terrain import native

    if not native.gtif_available():
        import subprocess, pathlib
        build = pathlib.Path("atm_raytracer_tpu/native/build.sh")
        subprocess.run(["sh", str(build)], check=True)
    assert native.gtif_available()
    rng = np.random.default_rng(7)
    grid = rng.integers(-500, 3000, (121, 121)).astype(np.float32)
    p = tmp_path / "N49E021.tif"
    write_geotiff(p, grid)  # north-first on disk
    assert native.gtif_probe(p) == (121, 121)
    tiles, status = native.gtif_load_batch([p, p], 121, 121, max_threads=2)
    assert (status == 0).all()
    expect = read_geotiff(p)[::-1]  # python parser + south-first flip
    np.testing.assert_array_equal(tiles[0], expect)
    np.testing.assert_array_equal(tiles[1], expect)

    # Deflate-compressed, big-endian, float32 variant (exercises zlib +
    # byte-order + sample-format branches of the C++ decoder)
    import struct, zlib
    h = w = 33
    vals = (rng.normal(500, 200, (h, w))).astype(">f4")
    data = zlib.compress(vals.tobytes())
    entries = []
    def entry(tag, type_, count, value):
        return struct.pack(">HHII", tag, type_, count, value)
    data_offset = 8 + 2 + 8 * 12 + 4
    entries.append(entry(256, 4, 1, w))
    entries.append(entry(257, 4, 1, h))
    entries.append(entry(258, 3, 1, 32 << 16))
    entries.append(entry(259, 3, 1, 8 << 16))
    entries.append(entry(273, 4, 1, data_offset))
    entries.append(entry(278, 4, 1, h))
    entries.append(entry(279, 4, 1, len(data)))
    entries.append(entry(339, 3, 1, 3 << 16))
    buf = (b"MM" + struct.pack(">HI", 42, 8)
           + struct.pack(">H", len(entries)) + b"".join(entries)
           + struct.pack(">I", 0) + data)
    p2 = tmp_path / "N50E021.tif"
    p2.write_bytes(buf)
    assert native.gtif_probe(p2) == (h, w)
    tiles2, status2 = native.gtif_load_batch([p2], h, w)
    assert status2[0] == 0
    expect2 = read_geotiff(p2)[::-1]
    np.testing.assert_array_equal(tiles2[0], expect2)

    # unsupported compression -> nonzero status (python fallback handles it)
    junk = tmp_path / "junk.tif"
    junk.write_bytes(b"II" + struct.pack("<HI", 42, 8) + b"\x00\x00")
    _, st = native.gtif_load_batch([junk], 4, 4)
    assert st[0] != 0


def test_preload_batches_mixed_formats(tmp_path, capsys):
    from atm_raytracer_tpu.terrain.store import Terrain

    g1 = tile_grid(49, 21, 61)
    g2 = tile_grid(49, 22, 61)
    write_dted(tmp_path / "n49_e021.dt2", 49, 21, g1)
    write_geotiff(tmp_path / "N49E022.tif", g2[::-1])
    t = Terrain.from_folder(tmp_path)
    t.preload([(49, 21), (49, 22), (49, 23)])  # (49,23) missing: ignored
    assert (49, 21) in t._loaded and (49, 22) in t._loaded
    np.testing.assert_allclose(t._loaded[(49, 21)].elev, g1, atol=0.51)
    np.testing.assert_allclose(t._loaded[(49, 22)].elev, g2, atol=0.51)


def test_add_tile_invalidates_pack_cache():
    """pack() memoizes by bbox + tile keys; replacing a tile's CONTENT via
    add_tile under the same key must not serve the previous mosaic."""
    from atm_raytracer_tpu.terrain.store import Tile

    n = 11
    t = Terrain()
    t.add_tile(Tile(lat0=49, lon0=21,
                    elev=np.full((n, n), 100.0, np.float32)))
    box = ((49.2, 49.8), (21.2, 21.8))
    p1 = t.pack(*box)
    assert float(np.asarray(p1.tiles).max()) == 100.0
    t.add_tile(Tile(lat0=49, lon0=21,
                    elev=np.full((n, n), 250.0, np.float32)))
    p2 = t.pack(*box)
    assert float(np.asarray(p2.tiles).max()) == 250.0


def test_paired_sampler_bit_identical(tmp_path):
    """The win4 paired sampler must reproduce the plain quad path BITWISE
    (elevation and gradient normals) — including odd sample counts and rays
    that exit the mosaic — for every earth model that passes the gate."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.models.earth import EARTH_R
    from atm_raytracer_tpu.terrain.sample import paired_step_ok

    make_terrain_folder(
        tmp_path, tiles=((49, 21), (49, 22), (50, 21), (50, 22)), n=121
    )
    pack = Terrain.from_folder(tmp_path).pack((49, 50), (21, 22))
    assert pack.win4 is not None and pack.seam_jump == 0.0
    lat0, lon0 = 49.6, 21.4
    az = jnp.linspace(0.0, 359.0, 48, dtype=jnp.float32)
    models = [
        EarthModel(kind="Spherical", radius=EARTH_R),
        EarthModel(kind="Wgs84"),
        EarthModel(kind="AzimuthalEquidistant"),
        EarthModel(kind="FlatDistorted"),
    ]
    from atm_raytracer_tpu.terrain.sample import sample_group

    # 40 km stays inside the 2°×2° mosaic; 300 km exits it in every azimuth
    for step, n in [(50.0, 800), (200.0, 1501)]:
        dists = jnp.arange(1, n + 1, dtype=jnp.float32) * step
        for model in models:
            assert paired_step_ok(pack, model, lat0, step, n * step)
            g_auto = sample_group(pack, model, lat0, step, n * step)
            dlat, dlon = model.geodesic_delta(
                lat0, lon0, az[:, None], dists[None, :]
            )
            e0, n0 = sample_terrain_data(pack, model, dlat, dlon, lat0, lon0)
            # every SAFE group size must reproduce the quad path bitwise,
            # including odd group sizes (G=3) and n not divisible by G
            for g in sorted({2, 3, g_auto}):
                if g > g_auto:
                    continue
                e1, n1 = sample_terrain_data(
                    pack, model, dlat, dlon, lat0, lon0, paired=g
                )
                assert bool(jnp.all(e0 == e1)), (model.kind, step, g)
                assert bool(jnp.all(n0 == n1)), (model.kind, step, g)
            # bool True still means pairs (back-compat for the culled path)
            e1, n1 = sample_terrain_data(
                pack, model, dlat, dlon, lat0, lon0, paired=True
            )
            assert bool(jnp.all(e0 == e1)), (model.kind, step)
            assert bool(jnp.all(n0 == n1)), (model.kind, step)


def test_paired_gate_rejects_unsafe_configs(tmp_path):
    """paired_step_ok must refuse: seam-inconsistent mosaics (missing tile →
    no win4), steps wide enough that a pair can straddle >2 post cells, and
    observers whose march can reach a pole (unbounded dlon rate)."""
    from atm_raytracer_tpu.models.earth import EARTH_R
    from atm_raytracer_tpu.terrain.sample import paired_step_ok

    make_terrain_folder(
        tmp_path, tiles=((49, 21), (49, 22), (50, 22)), n=121
    )  # (50,21) missing inside the bbox → zero slot → seam_jump > 0
    holey = Terrain.from_folder(tmp_path).pack((49, 50), (21, 22))
    sphere = EarthModel(kind="Spherical", radius=EARTH_R)
    assert holey.win4 is None
    assert not paired_step_ok(holey, sphere, 49.6, 50.0, 40e3)

    full = tmp_path / "full"
    full.mkdir()
    make_terrain_folder(
        full, tiles=((49, 21), (49, 22), (50, 21), (50, 22)), n=121
    )
    pack = Terrain.from_folder(full).pack((49, 50), (21, 22))
    assert pack.win4 is not None
    # a requested box OVERHANGING the loaded mosaic (the common case: view
    # reach past the tile set) raises the envelope's seam_jump — the field
    # steps to the 0.0 fallback at the mosaic edge — but must NOT disable
    # win4: outer-boundary samples are masked invalid → 0.0 in both the quad
    # and win4 paths, so pairing stays bit-exact (the bitwise test above
    # marches rays clean out of the mosaic)
    over = Terrain.from_folder(full).pack((48.2, 51.8), (20.1, 23.9))
    assert over.seam_jump > 0.0
    assert over.win4 is not None
    assert paired_step_ok(over, sphere, 49.6, 50.0, 40e3)
    # 120 posts/degree ≈ 927 m/post at this latitude: a 2.5 km step spans
    # >2 post cells → reject; 50 m is safely sub-cell → accept
    assert paired_step_ok(pack, sphere, 49.6, 50.0, 40e3)
    assert not paired_step_ok(pack, sphere, 49.6, 2500.0, 200e3)
    # pole-reaching march: dlon/dd is unbounded on the sphere
    assert not paired_step_ok(pack, sphere, 89.0, 50.0, 400e3)
