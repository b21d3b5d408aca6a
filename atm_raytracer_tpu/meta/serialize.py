"""Metadata artifact: self-contained params + per-pixel trace points.

Replaces the reference's gzip(bincode(AllData{params, result})) artifact
(src/generator/mod.rs:20-45, decoded in src/viewer/mod.rs:12-34). The format
here is a compressed npz (zip+deflate) carrying the config as YAML plus the
dense hit buffers; like the reference's, it is enough to re-render and
inspect the image without terrain data or re-simulation (SURVEY §5
checkpoint/resume). Byte format is explicitly NOT bincode-compatible — the
capability (round-trip of params + per-pixel trace points) is what is
preserved.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import yaml

from ..config import Config
from ..generators.base import HitBuffer, RenderResult

FORMAT_VERSION = 1


def save_metadata(path, config: Config, result: RenderResult) -> None:
    hits = result.hits
    # write to the EXACT filename the user gave (np.savez appends .npz to
    # string paths; the reference honors --output-meta verbatim)
    with open(path, "wb") as fh:
        _savez(fh, config, result, hits)


def _savez(fh, config, result, hits):
    from ..generators.base import fetch_flat_many

    # ONE shared-pool staging of all ten hit fields: flat fetches avoid the
    # device de-tiling pass on the minor dims, and pooling pipelines the
    # many ~8-33 MB per-field transfers that would otherwise serialize
    names = ("valid", "key", "dlat", "dlon", "distance", "elevation",
             "path_length", "normal", "kind", "rgba")
    dtypes = (bool, np.float32, np.float32, np.float32, np.float32,
              np.float32, np.float32, np.float32, np.int32, np.float32)
    arrays = [getattr(hits, n) for n in names]
    flats = fetch_flat_many(arrays)
    fields = {
        n: f.reshape(a.shape).astype(d, copy=False)
        for n, f, a, d in zip(names, flats, arrays, dtypes)
    }

    np.savez_compressed(
        fh,
        format_version=np.int32(FORMAT_VERSION),
        config_yaml=np.frombuffer(
            yaml.safe_dump(config.to_dict()).encode(), dtype=np.uint8
        ),
        observer=np.asarray(result.observer, np.float64),
        elevation_deg=np.asarray(result.elevation_deg, np.float64),
        azimuth_deg=np.asarray(result.azimuth_deg, np.float64),
        **fields,
    )


def load_metadata(path) -> Tuple[Config, RenderResult]:
    """Load a metadata artifact: native npz OR a reference bincode ``.dat``.

    The format is sniffed from the magic bytes — gzip (``\\x1f\\x8b``) or a
    raw (uncompressed) bincode blob routes through :mod:`.bincode`
    (decode_alldata handles both; generator/mod.rs:26-45); zip magic
    (``PK``) is our npz.
    """
    with open(path, "rb") as fh:
        magic = fh.read(2)
    if magic != b"PK":  # npz is a zip archive; everything else is bincode
        return _load_bincode(path)
    with np.load(path, allow_pickle=False) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"metadata format v{version} is newer than supported")
        config = Config.from_dict(yaml.safe_load(bytes(z["config_yaml"]).decode()))
        hits = HitBuffer(
            valid=z["valid"],
            key=z["key"],
            dlat=z["dlat"],
            dlon=z["dlon"],
            distance=z["distance"],
            elevation=z["elevation"],
            path_length=z["path_length"],
            normal=z["normal"],
            kind=z["kind"],
            rgba=z["rgba"],
        )
        result = RenderResult(
            image=None,  # re-rendered by the viewer
            hits=hits,
            elevation_deg=z["elevation_deg"],
            azimuth_deg=z["azimuth_deg"],
            observer=tuple(z["observer"]),
        )
    return config, result


def _invert_light_dir(light, model, position: dict, direction_deg: float):
    """World light vector → (zenith_angle°, light_dir°) such that
    ConfColoring.into_coloring reproduces the vector exactly.

    The lowering (params.rs:240-258) is light = −front·sinZ·cosL +
    right·sinZ·sinL + up·cosZ in the observer's view basis, which inverts as
    Z = acos(light·up), L = atan2(light·right, −light·front).
    """
    import math as _math

    north, east, up = model.world_directions(
        position["latitude"], position["longitude"]
    )
    az = _math.radians(direction_deg)
    front = north * _math.cos(az) + east * _math.sin(az)
    right = east * _math.cos(az) - north * _math.sin(az)
    light = np.asarray(light, np.float64)
    light = light / np.linalg.norm(light)  # lowered vectors are unit (params.rs:257)
    zen = _math.degrees(_math.acos(float(np.clip(np.dot(light, up), -1, 1))))
    ldir = _math.degrees(
        _math.atan2(float(np.dot(light, right)), float(-np.dot(light, front)))
    )
    return zen, ldir


def _load_bincode(path) -> Tuple[Config, RenderResult]:
    """Reference-artifact load path (see meta/bincode.py for the layout)."""
    from ..models.earth import EarthModel
    from .bincode import decode_alldata

    with open(path, "rb") as fh:
        params, elev, az, hits = decode_alldata(fh.read())

    view = params["view"]
    coloring = view["coloring"]
    if "Shading" in coloring:
        s = coloring["Shading"]
        model = EarthModel.from_config(params["model"])
        zen, ldir = _invert_light_dir(
            s["light_dir_world"], model, view["position"],
            view["frame"]["direction"],
        )
        conf_coloring = {"Shading": {
            "water_level": s["water_level"],
            "ambient_light": s["ambient_light"],
            "light_zenith_angle": zen,
            "light_dir": ldir,
            "palette": s["palette"],
        }}
    else:
        conf_coloring = {"Simple": {
            "water_level": coloring["Simple"]["water_level"],
        }}

    objects = []
    for ob in params["scene"]["objects"]:
        objects.append({
            "position": {
                "latitude": ob["position"]["lat"],
                "longitude": ob["position"]["lon"],
                "altitude": {"Absolute": ob["position"]["elev"]},
            },
            "shape": ob["shape"],
            "color": ob["color"],
        })

    d = {
        "scene": {
            "terrain_folder": params["scene"]["terrain_folder"],
            "objects": objects,
            "terrain_alpha": params["scene"]["terrain_alpha"],
        },
        "view": {
            "position": view["position"],
            "frame": view["frame"],
            "coloring": conf_coloring,
        },
        # the atm-refraction Environment bytes are opaque (out-of-tree crate;
        # meta/bincode.py) — the viewer does not re-trace rays, so the
        # default US-76 stands in for display purposes only
        "earth_shape": params["model"],
        "straight_rays": params["straight_rays"],
        "simulation_step": params["simulation_step"],
        "output": params["output"],
    }
    if view.get("fog_distance") is not None:
        d["view"]["fog_distance"] = view["fog_distance"]
    config = Config.from_dict(d)

    pos = view["position"]
    ((alt_kind, alt_value),) = pos["altitude"].items()
    result = RenderResult(
        image=None,
        hits=hits,
        elevation_deg=elev,
        azimuth_deg=az,
        # Relative altitude needs terrain the artifact does not carry; the
        # reference viewer has the same limitation (unwrap_or(0.0))
        observer=(pos["latitude"], pos["longitude"], float(alt_value)),
    )
    return config, result
