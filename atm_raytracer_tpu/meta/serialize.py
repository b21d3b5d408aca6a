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
    np.savez_compressed(
        fh,
        format_version=np.int32(FORMAT_VERSION),
        config_yaml=np.frombuffer(
            yaml.safe_dump(config.to_dict()).encode(), dtype=np.uint8
        ),
        observer=np.asarray(result.observer, np.float64),
        elevation_deg=np.asarray(result.elevation_deg, np.float64),
        azimuth_deg=np.asarray(result.azimuth_deg, np.float64),
        valid=np.asarray(hits.valid),
        key=np.asarray(hits.key, np.float32),
        dlat=np.asarray(hits.dlat, np.float32),
        dlon=np.asarray(hits.dlon, np.float32),
        distance=np.asarray(hits.distance, np.float32),
        elevation=np.asarray(hits.elevation, np.float32),
        path_length=np.asarray(hits.path_length, np.float32),
        normal=np.asarray(hits.normal, np.float32),
        kind=np.asarray(hits.kind, np.int32),
        rgba=np.asarray(hits.rgba, np.float32),
    )


def load_metadata(path) -> Tuple[Config, RenderResult]:
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
