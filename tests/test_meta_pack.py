"""Fused viewer-metadata pack: tolerances documented in meta/pack.py."""

import numpy as np

from atm_raytracer_tpu.meta.pack import (
    pack_viewer_fields, unpack_viewer_fields,
)


def test_pack_roundtrip_tolerances():
    rng = np.random.RandomState(3)
    shape = (37, 53, 2)
    valid = rng.rand(*shape) < 0.7
    key = np.where(valid, rng.rand(*shape) * 4000.0, np.inf).astype(np.float32)
    dlat = (rng.rand(*shape) * 2.7 - 1.35).astype(np.float32)
    dlon = (rng.rand(*shape) * 2.7 - 1.35).astype(np.float32)
    elevation = (rng.rand(*shape) * 1500.0).astype(np.float32)
    step = 50.0

    kf, la, lo, el, ranges = pack_viewer_fields(key, dlat, dlon, elevation)
    nbytes = sum(np.asarray(x).nbytes for x in (kf, la, lo, el))
    assert nbytes == 14 * int(np.prod(shape))  # 14 B / pixel-slot

    v2, key2, dist2, dlat2, dlon2, el2 = unpack_viewer_fields(
        kf, la, lo, el, np.asarray(ranges), shape, step
    )
    np.testing.assert_array_equal(v2, valid)
    # key exact → distance reproduces the device expression bit-exactly
    np.testing.assert_array_equal(key2[valid], key[valid])
    expect_dist = np.where(valid, key, 0.0).astype(np.float32) * np.float32(step)
    np.testing.assert_array_equal(dist2, expect_dist)
    # 2^24-level coding + f32 round-off: ≤ range·2^-22 (~6.4e-7° ≈ 7 cm here)
    assert np.abs(dlat2[valid] - dlat[valid]).max() < 2.7 * 2.0**-22
    assert np.abs(dlon2[valid] - dlon[valid]).max() < 2.7 * 2.0**-22
    # u16 coding + f32 round-off: ≤ range·2^-15 (~4.6 cm here)
    assert np.abs(el2[valid] - elevation[valid]).max() < 1500.0 * 2.0**-15

    # lazy container: O(K) pixel decode agrees with the full-frame arrays
    from atm_raytracer_tpu.meta.pack import ViewerFields

    vf = ViewerFields(kf, la, lo, el, np.asarray(ranges), shape, step)
    px = vf.pixel(11, 29)
    np.testing.assert_array_equal(px["valid"], valid[11, 29])
    np.testing.assert_array_equal(px["key"], key2[11, 29])
    np.testing.assert_array_equal(px["distance"], dist2[11, 29])
    np.testing.assert_array_equal(px["dlat"], dlat2[11, 29])
    np.testing.assert_array_equal(px["dlon"], dlon2[11, 29])
    np.testing.assert_array_equal(px["elevation"], el2[11, 29])


def test_pack_empty_frame():
    shape = (4, 5, 1)
    key = np.full(shape, np.inf, np.float32)
    z = np.zeros(shape, np.float32)
    kf, la, lo, el, ranges = pack_viewer_fields(key, z, z, z)
    v2, key2, dist2, *_ = unpack_viewer_fields(
        kf, la, lo, el, np.asarray(ranges), shape, 50.0
    )
    assert not v2.any()
    assert (dist2 == 0).all()


def test_fetch_flat_chunked_matches_monolithic():
    """Bounded-slice device fetch is bit-identical to one np.asarray."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.generators.base import fetch_flat

    x = jnp.arange(17 * 589, dtype=jnp.float32).reshape(17, 589)
    # chunk smaller than the array → exercises the sliced path
    out = fetch_flat(x, chunk_bytes=4096)
    np.testing.assert_array_equal(out, np.asarray(x).reshape(-1))
    # at-or-under one chunk → single fetch path
    np.testing.assert_array_equal(fetch_flat(x), np.asarray(x).reshape(-1))
    # numpy passthrough
    host = np.arange(12).reshape(3, 4)
    np.testing.assert_array_equal(fetch_flat(host, chunk_bytes=8), host.reshape(-1))


def test_fetch_flat_many_matches_individual():
    """The shared-pool multi-array fetch is bit-identical per array."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.generators.base import fetch_flat_many

    a = jnp.arange(1000, dtype=jnp.float32).reshape(10, 100)
    b = (jnp.arange(300, dtype=jnp.uint32) * jnp.uint32(2654435761))
    c = np.arange(12).reshape(3, 4)  # host passthrough
    fa, fb, fc = fetch_flat_many((a, b, c))
    np.testing.assert_array_equal(fa, np.asarray(a).reshape(-1))
    np.testing.assert_array_equal(fb, np.asarray(b))
    np.testing.assert_array_equal(fc, c.reshape(-1))
    assert fetch_flat_many(()) == []


def test_fetch_flat_threaded_matches_monolithic():
    """The overlapped (thread-pool) fetch path is bit-identical too."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.generators import base
    from atm_raytracer_tpu.generators.base import fetch_flat

    n = base._FETCH_OVERLAP_MIN_BYTES // 4 + 12345  # f32: just over threshold
    x = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)).astype(
        jnp.float32
    )
    np.testing.assert_array_equal(fetch_flat(x), np.asarray(x))


def _small_fast_render(tmp_path_factory):
    """Tiny real Fast render (synthetic DTED) for separable-pack tests."""
    import yaml

    from atm_raytracer_tpu.config import parse_config
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.terrain.store import Terrain

    from fixtures import make_terrain_folder

    d = tmp_path_factory.mktemp("sep_terrain")
    make_terrain_folder(d, tiles=((49, 21),), n=121)
    cfg = {
        "scene": {"terrain_folder": str(d)},
        "view": {
            "position": {
                "latitude": 49.35,
                "longitude": 21.30,
                "altitude": {"Relative": 120.0},
            },
            "frame": {
                "direction": 45.0,
                "fov": 20.0,
                "max_distance": 30000.0,
                "tilt": 0.0,
            },
            "coloring": {"Shading": {"water_level": -100.0}},
        },
        "straight_rays": False,
        "simulation_step": 100.0,
        "output": {"width": 64, "height": 48},
    }
    p = tmp_path_factory.mktemp("sep_cfg") / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    config = parse_config(p)
    terrain = Terrain.from_folder(str(d))
    params = config.into_params(terrain)
    return params, render_fast(params, terrain)


def test_separable_pack_roundtrip(tmp_path_factory):
    """Separable staging: key/distance bit-exact, elevation in the u16 band,
    derived f64 lat/lon within the device f32 geodesic band of the staged
    device values, and the payload strictly smaller than the dense pack."""
    from atm_raytracer_tpu.meta.pack import fetch_viewer_fields_separable

    params, r = _small_fast_render(tmp_path_factory)
    step = float(params.simulation_step)
    # co_fetch stages extras through the same pool: image bytes intact and
    # the return shape switches to (vf, extras)
    vf_co, (img,) = fetch_viewer_fields_separable(
        r, params.model, step, co_fetch=(r.image,)
    )
    np.testing.assert_array_equal(img, np.asarray(r.image).reshape(-1))
    vf = fetch_viewer_fields_separable(r, params.model, step)
    np.testing.assert_array_equal(vf_co.valid, vf.valid)

    key = np.asarray(r.hits.key, np.float32)
    valid = np.isfinite(key)
    assert valid.any() and (~valid).any()  # scene has both ground and sky

    np.testing.assert_array_equal(vf.valid, valid)
    np.testing.assert_array_equal(vf.key[valid], key[valid])
    expect_dist = (
        np.where(valid, key, np.float32(0.0)) * np.float32(step)
    ).astype(np.float32)
    np.testing.assert_array_equal(vf.distance, expect_dist)

    elevation = np.asarray(r.hits.elevation, np.float32)
    el_rng = float(elevation[valid].max() - elevation[valid].min())
    assert (
        np.abs(vf.elevation[valid] - elevation[valid]).max()
        <= max(el_rng, 1.0) * 2.0**-15
    )

    # derived lat/lon vs the DEVICE-computed f32 hit positions: bounded by
    # the device geodesic's own f32 band (≤6 cm ≈ 5.4e-7° over 200 km;
    # models/earth.py geodesic_delta) plus lerp round-off
    dlat_dev = np.asarray(r.hits.dlat, np.float64)
    dlon_dev = np.asarray(r.hits.dlon, np.float64)
    assert np.abs(vf.dlat[valid] - dlat_dev[valid]).max() < 1.5e-6
    assert np.abs(vf.dlon[valid] - dlon_dev[valid]).max() < 1.5e-6

    # payload: bitmask + 6 B/valid-slot, strictly under the dense 14 B/slot
    p = int(np.prod(key.shape))
    assert vf.nbytes == (p + 31) // 32 * 4 + int(valid.sum()) * 6
    assert vf.nbytes < 14 * p

    # O(K) pixel decode agrees with the full-frame arrays
    ys, xs = np.nonzero(valid[..., 0])
    y, x = int(ys[len(ys) // 2]), int(xs[len(xs) // 2])
    px = vf.pixel(y, x)
    np.testing.assert_array_equal(px["valid"], valid[y, x])
    np.testing.assert_array_equal(px["key"], vf.key[y, x])
    np.testing.assert_array_equal(px["distance"], vf.distance[y, x])
    np.testing.assert_array_equal(px["elevation"], vf.elevation[y, x])
    np.testing.assert_allclose(px["dlat"], vf.dlat[y, x], atol=1e-12)
    np.testing.assert_allclose(px["dlon"], vf.dlon[y, x], atol=1e-12)
    # the popcount-rank fast path (no cached index) and the cached-index
    # path must agree everywhere, including pixels whose slot window
    # straddles a 32-bit bitmask word boundary
    _ = vf._positions  # force the cached-index branch on vf
    for yy, xx in [(y, x), (0, 0), (int(ys[-1]), int(xs[-1]))]:
        pa = vf.pixel(yy, xx)          # cached-index branch
        pb = vf_co.pixel(yy, xx)       # popcount-rank branch (no index yet)
        assert "_positions" not in vf_co._cache
        for f in ("valid", "key", "distance", "elevation", "dlat", "dlon"):
            np.testing.assert_array_equal(pa[f], pb[f])
    # a sky pixel decodes as all-invalid
    sky_rows = np.nonzero(~valid.any(axis=(1, 2)))[0]
    if sky_rows.size:
        px0 = vf.pixel(int(sky_rows[0]), 0)
        assert not px0["valid"].any()
        assert (px0["distance"] == 0).all()


def test_separable_pack_empty_frame():
    """All-sky frame: zero compacted payload, empty decode everywhere."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.generators.base import HitBuffer, RenderResult
    from atm_raytracer_tpu.meta.pack import fetch_viewer_fields_separable
    from atm_raytracer_tpu.models.earth import EarthModel

    shape = (5, 7, 1)
    inf = jnp.full(shape, jnp.inf, jnp.float32)
    z = jnp.zeros(shape, jnp.float32)
    hits = HitBuffer(
        valid=jnp.zeros(shape, bool), key=inf, dlat=z, dlon=z, distance=z,
        elevation=z, path_length=z,
        normal=jnp.zeros(shape + (3,), jnp.float32),
        kind=jnp.zeros(shape, jnp.int32),
        rgba=jnp.zeros(shape + (4,), jnp.float32),
    )
    r = RenderResult(
        image=None, hits=hits,
        elevation_deg=np.linspace(-1, 1, 5),
        azimuth_deg=np.linspace(44, 46, 7),
        observer=(49.0, 21.0, 300.0),
    )
    model = EarthModel.from_config("SimpleSphere")
    vf = fetch_viewer_fields_separable(r, model, 50.0)
    assert not vf.valid.any()
    assert (vf.distance == 0).all()
    assert vf.nbytes == ((5 * 7 + 31) // 32) * 4
    px = vf.pixel(2, 3)
    assert not px["valid"].any()


def test_popcount_fallback_matches_bitwise_count():
    """ADVICE r3: np.bitwise_count is NumPy>=2 only; the unpackbits
    fallback must agree on arrays AND scalars (the two _rank call shapes)."""
    import numpy as np

    from atm_raytracer_tpu.meta import pack

    def fallback(a):
        arr = np.atleast_1d(np.ascontiguousarray(a, dtype=np.uint32))
        bits = np.unpackbits(arr.view(np.uint8)).reshape(arr.size, 32)
        return bits.sum(axis=-1, dtype=np.int64).reshape(np.shape(a))

    rng = np.random.default_rng(7)
    words = rng.integers(0, 2**32, size=257, dtype=np.uint32)
    assert np.array_equal(fallback(words), np.bitwise_count(words))
    scalar = np.uint32(0xDEADBEEF)
    assert int(fallback(scalar)) == int(np.bitwise_count(scalar))
    assert int(fallback(words[:0]).sum(dtype=np.int64)) == 0
    # the module-level _popcount (whichever branch was taken at import)
    # agrees with the fallback too
    assert np.array_equal(np.asarray(pack._popcount(words)), fallback(words))


def test_delta_pack_matches_separable(tmp_path_factory):
    """Delta pack (v3): keys within the documented 1/256-step fixed point,
    elevation bit-equal to the separable pack's u16 coding, derived lat/lon
    inside the viewer's DMS display band, the frame reconstruction
    bit-exact, and the staged payload strictly smaller than separable
    metadata + raw frame."""
    from atm_raytracer_tpu.meta.pack import (
        _KEY_QUANT,
        fetch_viewer_fields_delta,
        fetch_viewer_fields_separable,
        frame_base_rgb,
    )

    params, r = _small_fast_render(tmp_path_factory)
    step = float(params.simulation_step)
    v2 = fetch_viewer_fields_separable(r, params.model, step)
    v3, img, stats = fetch_viewer_fields_delta(
        r, params.model, step,
        frame_base_rgb(params.coloring, None),
    )
    np.testing.assert_array_equal(v3.valid, v2.valid)
    valid = v2.valid
    assert valid.any() and (~valid).any()

    # key: quantized to 1/256 march steps (meta/pack.py::_KEY_QUANT)
    assert (
        np.abs(v3.key[valid] - v2.key[valid]).max()
        <= 0.5 / _KEY_QUANT + 1e-5
    )
    # → distance inside the 0.001 km display step, lat/lon inside the
    # 0.01" DMS step (≈ 2.8e-6 °)
    assert (
        np.abs(v3.distance[valid] - v2.distance[valid]).max()
        <= step / (2.0 * _KEY_QUANT) + 1e-3
    )
    assert np.abs(v3.dlat[valid] - v2.dlat[valid]).max() < 2.8e-6
    assert np.abs(v3.dlon[valid] - v2.dlon[valid]).max() < 2.8e-6
    # elevation: identical u16 coding → decodes bit-equal
    np.testing.assert_array_equal(v3.elevation, v2.elevation)

    # the frame reconstructs bit-exactly from hit-pixel streams + the
    # constant sky color
    np.testing.assert_array_equal(img, np.asarray(r.image))

    # payload accounting: strictly smaller than separable meta + raw frame
    raw = v2.nbytes + int(np.asarray(r.image).nbytes)
    assert 0 < stats["staged_bytes"] < raw
    assert stats["n_valid"] == int(valid.sum())
    assert stats["n_hit_px"] == int(valid.any(-1).sum())

    # pixel decode path still works on the delta-built container
    ys, xs = np.nonzero(valid[..., 0])
    y, x = int(ys[len(ys) // 2]), int(xs[len(xs) // 2])
    px = v3.pixel(y, x)
    np.testing.assert_array_equal(px["key"], v3.key[y, x])
    np.testing.assert_array_equal(px["elevation"], v3.elevation[y, x])


def test_delta_pack_empty_frame():
    """All-sky frame through the delta pack: zero valid slots, the
    reconstruction is pure sky, and no exceptions fire."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.meta.pack import pack_viewer_fields_delta

    h, w, k = 6, 9, 1
    key = jnp.full((h, w, k), jnp.inf, jnp.float32)
    el = jnp.zeros((h, w, k), jnp.float32)
    img = jnp.full((h, w, 3), 28, jnp.uint8)
    (bits, key_d, kexc_i, kexc_v, el_n, eexc_i, eexc_v, el_ranges,
     img_n, img_ei, img_ev, counts) = pack_viewer_fields_delta(key, el, img)
    assert all(int(v) == 0 for v in np.asarray(counts))
    assert not np.asarray(bits).any()


def test_delta_encode_exceptions_roundtrip():
    """_delta_encode + host decode: exact for adversarial streams (big
    jumps, sign flips, first-element overflow)."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.meta.pack import _delta_decode, _delta_encode

    rng = np.random.RandomState(11)
    x = np.cumsum(rng.randint(-40, 40, size=4096)).astype(np.int64)
    x[0] += 1_000_000  # first delta overflows i16
    x[100:] += 900_000  # mid-stream jump
    x[2000:] -= 2_000_000  # negative jump
    xj = jnp.asarray(x, jnp.int32)
    import jax

    d, ei, ev, ne = jax.jit(
        lambda v: _delta_encode(v, jnp.int32(v.shape[0]), 32767, jnp.int16)
    )(xj)
    ne = int(ne)
    assert ne >= 3
    got = _delta_decode(
        np.asarray(d), np.asarray(ei[:ne]), np.asarray(ev[:ne])
    )
    np.testing.assert_array_equal(got, x)


def test_frame_compact_roundtrip(tmp_path_factory):
    """pack_frame_compact/unpack_frame_compact reconstruct the frame
    bit-exactly from hit-pixel RGB + bitmask + the sky constant, with
    strictly fewer staged bytes than the raw u8 frame (the headline bench
    fetch path)."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.meta.pack import (
        frame_base_rgb, pack_frame_compact, unpack_frame_compact,
    )

    params, r = _small_fast_render(tmp_path_factory)
    h, w = r.image.shape[0], r.image.shape[1]
    bits, img_n, img_ei, img_ev, counts = pack_frame_compact(
        jnp.asarray(r.hits.valid), jnp.asarray(r.image)
    )
    n, *nes = (int(v) for v in np.asarray(counts))
    valid_px = np.asarray(r.hits.valid).any(-1)
    assert n == int(valid_px.sum())
    channels = [
        (np.asarray(img_n[c, :(n + 1) // 2]),
         np.asarray(img_ei[c, :nes[c]]), np.asarray(img_ev[c, :nes[c]]))
        for c in range(3)
    ]
    sky = frame_base_rgb(params.coloring, None)
    frame = unpack_frame_compact(np.asarray(bits), channels, sky, h, w, n)
    np.testing.assert_array_equal(frame, np.asarray(r.image))
    staged = np.asarray(bits).nbytes + sum(
        x.nbytes for ch in channels for x in ch
    )
    assert staged < 3 * h * w


def test_frame_compact_lossless_with_fog_and_objects(tmp_path):
    """The compact frame fetch is lossless for ANY scene: hit pixels ship
    raw RGB and no-hit pixels are exactly the constant fog/sky base even
    with translucent terrain + objects (partial-alpha remainders only
    occur on hit pixels)."""
    import math

    import jax.numpy as jnp

    from fixtures import M_PER_DEG, make_terrain_folder

    from atm_raytracer_tpu.config import Config
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.meta.pack import (
        frame_base_rgb, pack_frame_compact, unpack_frame_compact,
    )
    from atm_raytracer_tpu.terrain.store import Terrain

    d = make_terrain_folder(tmp_path, tiles=((49, 21),), n=121)
    cfg = Config.from_dict({
        "scene": {
            "terrain_folder": str(d),
            "terrain_alpha": 0.7,
            "objects": [{
                "position": {
                    "latitude": 49.5 + 600.0 / M_PER_DEG,
                    "longitude": 21.5,
                    "altitude": {"Relative": 0.0},
                },
                "color": {"r": 0.9, "g": 0.2, "b": 0.1, "a": 0.5},
                "shape": {"Cylinder": {"radius": 25.0, "height": 150.0}},
            }],
        },
        "view": {
            "position": {"latitude": 49.5, "longitude": 21.5,
                         "altitude": {"Relative": 25.0}},
            "frame": {"direction": 0.0, "fov": 15.0,
                      "max_distance": 6000.0},
            "fog_distance": 10000.0,
        },
        "simulation_step": 50.0,
        "output": {"width": 48, "height": 36},
    })
    terrain = Terrain.from_folder(d)
    params = cfg.into_params(terrain)
    r = render_fast(params, terrain)
    h, w = r.image.shape[0], r.image.shape[1]
    bits, img_n, img_ei, img_ev, counts = pack_frame_compact(
        jnp.asarray(r.hits.valid), jnp.asarray(r.image)
    )
    n, *nes = (int(v) for v in np.asarray(counts))
    sky = frame_base_rgb(params.coloring, params.view.fog_distance)
    frame = unpack_frame_compact(
        np.asarray(bits),
        [(np.asarray(img_n[c, :(n + 1) // 2]),
          np.asarray(img_ei[c, :nes[c]]), np.asarray(img_ev[c, :nes[c]]))
         for c in range(3)],
        sky, h, w, n,
    )
    np.testing.assert_array_equal(frame, np.asarray(r.image))
    assert math.isfinite(n) and 0 < n < h * w


def test_delta_encode4_exceptions_roundtrip():
    """Nibble coding + host decode: exact for adversarial streams (odd
    length, first-element overflow, big jumps both signs, boundary values
    -8/+7)."""
    import jax
    import jax.numpy as jnp

    from atm_raytracer_tpu.meta.pack import _delta_decode4, _delta_encode4

    rng = np.random.RandomState(5)
    x = np.cumsum(rng.randint(-8, 8, size=4097)).astype(np.int64)  # odd n
    x[0] += 300  # first delta overflows the nibble
    x[77:] += 5000
    x[3000:] -= 12345
    xj = jnp.asarray(x, jnp.int32)
    nb, ei, ev, ne = jax.jit(
        lambda v: _delta_encode4(v, jnp.int32(v.shape[0]))
    )(xj)
    ne = int(ne)
    assert ne >= 3
    got = _delta_decode4(
        np.asarray(nb), len(x), np.asarray(ei[:ne]), np.asarray(ev[:ne])
    )
    np.testing.assert_array_equal(got, x)


def test_pack_frame_stream_nosync_and_overflow():
    """The static-shape stream codec round-trips bit-exactly, and an
    exception-cap overflow reports None (raw-refetch signal) instead of a
    wrong frame."""
    import jax.numpy as jnp

    from atm_raytracer_tpu.meta.pack import (
        pack_frame_stream, unpack_frame_stream,
    )

    rng = np.random.RandomState(2)
    h, w, k = 24, 40, 2
    sky = np.array([7, 8, 9], np.uint8)
    valid = rng.rand(h, w, k) < 0.5
    # smooth image on hit pixels (nibble-friendly), sky elsewhere
    base = np.cumsum(rng.randint(-3, 4, size=(h * w, 3)), axis=0) % 200
    img = base.astype(np.uint8).reshape(h, w, 3)
    img[~valid.any(-1)] = sky
    cap = 64
    bits, img_n, img_ei, img_ev, counts = pack_frame_stream(
        jnp.asarray(valid), jnp.asarray(img), cap
    )
    out = unpack_frame_stream(
        np.asarray(bits), np.asarray(img_n), np.asarray(img_ei),
        np.asarray(img_ev), np.asarray(counts), sky, h, w, cap,
    )
    np.testing.assert_array_equal(out, img)

    # adversarial image: every delta overflows the nibble → counts blow
    # past a tiny cap and the decoder must refuse
    wild = (rng.randint(0, 2, size=(h, w, 3)) * 255).astype(np.uint8)
    wild[~valid.any(-1)] = sky
    tiny_cap = 4
    bits2, n2, ei2, ev2, c2 = pack_frame_stream(
        jnp.asarray(valid), jnp.asarray(wild), tiny_cap
    )
    assert unpack_frame_stream(
        np.asarray(bits2), np.asarray(n2), np.asarray(ei2),
        np.asarray(ev2), np.asarray(c2), sky, h, w, tiny_cap,
    ) is None
