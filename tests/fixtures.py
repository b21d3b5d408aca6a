"""Synthetic terrain fixtures shared by tests and benchmarks.

The reference has no fixtures (SURVEY §4); these generate deterministic
analytic landscapes written as real DTED / GeoTIFF files so the whole
parser → store → device-gather path is exercised.
"""

from __future__ import annotations

import numpy as np

from atm_raytracer_tpu.terrain import write_dted, write_geotiff


# spherical meters per degree of latitude (R = 6371 km): pi*R/180
M_PER_DEG = 111_194.9


def analytic_hills(lat, lon, base_lat=49.0, base_lon=21.0):
    """Smooth deterministic landscape, meters; works on arrays (degrees)."""
    la = np.asarray(lat, np.float64) - base_lat
    lo = np.asarray(lon, np.float64) - base_lon
    return (
        300.0
        + 250.0 * np.sin(2 * np.pi * la * 3.0) * np.cos(2 * np.pi * lo * 2.0)
        + 120.0 * np.sin(2 * np.pi * (la * 7.0 + lo * 5.0))
    )


def tile_grid(lat0: int, lon0: int, n: int):
    """Post grid (inclusive edges) of analytic_hills over a 1-degree tile."""
    lats = lat0 + np.arange(n) / (n - 1)
    lons = lon0 + np.arange(n) / (n - 1)
    grid = analytic_hills(lats[:, None], lons[None, :])
    return np.round(grid).astype(np.int16)  # integer meters, like real tiles


def make_terrain_folder(tmpdir, tiles=((49, 21),), n: int = 121, fmt: str = "dted"):
    """Write synthetic tiles into tmpdir; returns the folder path."""
    for lat0, lon0 in tiles:
        grid = tile_grid(lat0, lon0, n)  # [n_lat, n_lon], row 0 = south
        if fmt == "dted":
            write_dted(tmpdir / f"n{lat0}_e{lon0}.dt2", lat0, lon0, grid)
        elif fmt == "geotiff":
            name = (
                f"{'N' if lat0 >= 0 else 'S'}{abs(lat0):02d}"
                f"{'E' if lon0 >= 0 else 'W'}{abs(lon0):03d}.tif"
            )
            write_geotiff(tmpdir / name, grid[::-1])  # north-up image rows
        else:
            raise ValueError(fmt)
    return tmpdir
