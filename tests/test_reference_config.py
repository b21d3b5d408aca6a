"""A verbatim reference-style YAML config (README.md:76-324 grammar) must
parse, lower, and render — the compatibility contract for users switching
from the Rust binary.
"""

import numpy as np
import pytest
import yaml

from fixtures import make_terrain_folder

REFERENCE_STYLE_CONFIG = """
scene:
    terrain_folder: {terrain}
    # Objects sit 130-170 m out inside the 4-degree fov around direction 31:
    # the fixture terrain is an upslope that occludes everything beyond
    # ~350 m, so close-in placement is what makes object pixels actually
    # render (the r4 positions were kilometers out and never hit).
    objects:
        - position:
            latitude: 49.50117
            longitude: 21.50103
            altitude:
                Absolute: 320.0
          color:
            r: 0.5
            g: 0.0
            b: 0.0
          shape:
            Billboard:
                width: 4.125
                height: 60.0
                texture_path: {texture}
        - position:
            latitude: 49.50100
            longitude: 21.50093
            altitude:
                Relative: 0.0
          color:
            r: 0.5
            g: 0.0
            b: 0.5
          shape:
            Cylinder:
                radius: 1.5
                height: 55.0
        - position:
            latitude: 49.50129
            longitude: 21.50126
            altitude:
                Relative: 0.0
          color:
            r: 0.1
            g: 0.6
            b: 0.5
            a: 0.5
          shape:
            Frustum:
                r1: 2.5
                r2: 1.0
                height: 55.0
    terrain_alpha: 0.98

view:
    position:
        latitude: 49.5
        longitude: 21.5
        altitude:
            Relative: 2
    frame:
        direction: 31
        fov: 4
        max_distance: 20000
        tilt: 0
    coloring:
        Shading:
            water_level: 0.0
            ambient_light: 0.4
            light_zenith_angle: 45.0
            light_dir: 180.0
    fog_distance: 20000

earth_shape:
    Spherical:
        radius: 6378000.0

wavelength: 530e-9
straight_rays: false
simulation_step: 50

output:
    width: 120
    height: 80
    file: {out}
    file_metadata: {meta}
    ticks:
      - Multiple:
          bias: 0
          step: 10
          size: 10
          labelled: true
      - Single:
          azimuth: 45
          size: 15
          labelled: true
    vertical_ticks:
      - Multiple:
          bias: 0
          step: 1
          size: 8
          labelled: true
    show_eye_level: true
    show_flat_horizon: false
    generator: Fast

atmosphere:
    pressure:
        altitude: 0.0
        pressure: 101325
    first_temperature_function:
        Linear:
            gradient: -0.0065
    next_functions:
        - altitude: 100.0
          function:
            Spline:
                boundary_condition:
                    Derivatives:
                        - -0.0065
                        - 0.0
                points:
                    -
                        - 100.0
                        - 288.0
                    -
                        - 110.0
                        - 285.0
                    -
                        - 120.0
                        - 291.0
        - altitude: 120.0
          function:
            Linear:
                gradient: -0.0065
"""


def test_reference_style_config_end_to_end(tmp_path):
    from PIL import Image

    from atm_raytracer_tpu.config import parse_config
    from atm_raytracer_tpu.generators import render_fast
    from atm_raytracer_tpu.terrain.store import Terrain

    terr_sub = tmp_path / "terrain"
    terr_sub.mkdir()
    terrain_dir = make_terrain_folder(terr_sub, tiles=((49, 21),), n=241)
    tex = tmp_path / "texture.png"
    arr = np.zeros((8, 8, 4), np.uint8)
    arr[..., 1] = 200
    arr[..., 3] = 255
    Image.fromarray(arr).save(tex)

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        REFERENCE_STYLE_CONFIG.format(
            terrain=terrain_dir, texture=tex,
            out=tmp_path / "out.png", meta=tmp_path / "out.dat",
        )
    )
    config = parse_config(cfg_path)

    # grammar spot checks
    assert config.earth_shape.kind == "Spherical"
    assert config.earth_shape.radius == 6378000.0
    assert config.scene.terrain_alpha == 0.98
    assert len(config.scene.objects) == 3
    assert config.view.fog_distance == 20000
    assert config.output.generator == "Fast"
    assert len(config.output.ticks) == 2
    assert len(config.output.vertical_ticks) == 1
    atm = config.atmosphere
    assert atm.pressure == 101325
    assert len(atm.next_functions) == 2

    # the spline boundary condition reached the model
    from atm_raytracer_tpu.physics.atmosphere import SplineFunction

    spline = atm.next_functions[0][1]
    assert isinstance(spline, SplineFunction)
    assert spline.boundary_condition[0] == "Derivatives"

    # lower + render end-to-end. This is the suite's only mixed
    # billboard+frustum scene over translucent terrain + fog — exactly the
    # shape whose bucketed object merge stalled XLA CPU compilation >50 min
    # in round 4 (missing buffer boundary between kind buckets,
    # ops/objects.py::apply_objects_planes). The wall bound makes a compile
    # regression fail loudly instead of silently eating the suite budget
    # (healthy: ~25 s on the 1-core CI host).
    import time

    terrain = Terrain.from_folder(terrain_dir)
    params = config.into_params(terrain)
    t0 = time.monotonic()
    result = render_fast(params, terrain)
    elapsed = time.monotonic() - t0
    assert result.image.shape == (80, 120, 3)
    valid = np.asarray(result.hits.valid)
    kind = np.asarray(result.hits.kind)
    assert valid.any()
    assert (valid & (kind == 1)).any(), "object (billboard/frustum) hits"
    assert (valid.sum(-1) >= 2).any(), "translucent terrain keeps depth"
    assert elapsed < 600, (
        f"mixed-kind render took {elapsed:.0f}s — object-merge compile "
        "blowup regression (see ops/objects.py bucket boundary note)"
    )

    # round-trip: to_dict re-parses to the same lowering-relevant content
    from atm_raytracer_tpu.config import Config

    config2 = Config.from_dict(config.to_dict())
    assert config2.earth_shape.kind == "Spherical"
    assert len(config2.scene.objects) == 3
    assert config2.atmosphere == atm


def test_unknown_enum_variants_rejected_at_parse():
    """serde rejects unknown enum variants at deserialize time (params.rs
    passim); matching keeps a bad palette from silently rendering Improved
    and a bad generator from silently falling through the CLI dispatch."""
    import pytest

    from atm_raytracer_tpu.config import Config

    base = {
        "view": {
            "position": {"latitude": 49.5, "longitude": 21.5,
                         "altitude": {"Absolute": 100.0}},
            "frame": {},
        },
        "output": {},
    }
    for patch, msg in [
        ({"output": {"generator": "Quantum"}}, "generator"),
        ({"view": {**base["view"],
                   "coloring": {"Shading": {"palette": "Nope"}}}}, "palette"),
        ({"view": {**base["view"],
                   "coloring": {"Rainbow": {}}}}, "coloring"),
        ({"earth_shape": "NotAModel"}, "earth_shape"),
    ]:
        with pytest.raises(ValueError, match=msg):
            Config.from_dict({**base, **patch})
    # valid variants still parse
    Config.from_dict({**base, "output": {"generator": "Rectilinear"}})
    Config.from_dict({**base, "view": {**base["view"], "coloring": {
        "Shading": {"palette": "Legacy"}}}})
