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
