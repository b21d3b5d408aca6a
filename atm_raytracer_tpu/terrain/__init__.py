"""Terrain: host-side tile parsers + HBM-resident mosaic with bilinear gather.

Replaces the reference's terrain layer (src/terrain/) and its parser crates
(``dted`` 0.2, ``geotiff-rs`` 0.1): 1°×1° tiles keyed by floor(lat),floor(lon)
(terrain/mod.rs:55-127), lazy loading (terrain/mod.rs:33-53), bilinear
elevation sampling (terrain/geotiff.rs:61-100), missing tile → None with
callers defaulting to 0.0 (e.g. generators/utils.rs:28-31,84).
"""

from .dted import read_dted, read_dted_header, write_dted
from .geotiff import read_geotiff, coords_from_name, write_geotiff
from .store import Terrain, TerrainPack, Tile
from .sample import paired_step_ok, sample_elevation, sample_group, sample_terrain_data

__all__ = [
    "read_dted",
    "read_dted_header",
    "write_dted",
    "read_geotiff",
    "write_geotiff",
    "coords_from_name",
    "Terrain",
    "TerrainPack",
    "Tile",
    "paired_step_ok",
    "sample_group",
    "sample_elevation",
    "sample_terrain_data",
]
