"""ctypes bindings for the native (C++) tile loader, with graceful fallback.

The native path parses DTED tiles with one worker thread per tile
(native/dted_loader.cpp) — the equivalent of the reference's Rust ``dted``
crate parsing, but batched. If the shared library hasn't been built (or the
platform lacks it), callers fall back to the pure-numpy parser in
``terrain.dted`` transparently.

Build once with: ``sh atm_raytracer_tpu/native/build.sh``
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / "libdted_loader.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.dted_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.dted_probe.restype = ctypes.c_int
    lib.dted_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dted_load_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def probe(path) -> Optional[Tuple[float, float, int, int]]:
    """(origin_lat, origin_lon, n_lat, n_lon) or None if not DTED."""
    lib = _load_lib()
    if lib is None:
        return None
    lat = ctypes.c_double()
    lon = ctypes.c_double()
    n_lat = ctypes.c_int()
    n_lon = ctypes.c_int()
    rc = lib.dted_probe(
        str(path).encode(), ctypes.byref(lat), ctypes.byref(lon),
        ctypes.byref(n_lat), ctypes.byref(n_lon),
    )
    if rc != 0:
        return None
    return lat.value, lon.value, n_lat.value, n_lon.value


def load_batch(
    paths: List, rows: int, cols: int, max_threads: int = 8
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parse many DTED tiles in parallel into [n, rows, cols] float32.

    Returns (tiles, origins[n,2], status[n]) or None if the lib is missing.
    Tiles smaller than (rows, cols) are zero-padded at the top/right.
    """
    lib = _load_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, rows, cols), np.float32)
    origins = np.zeros((n, 2), np.float64)
    status = np.zeros(n, np.int32)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    lib.dted_load_batch(
        blob,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        origins.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rows,
        cols,
        max_threads,
    )
    return out, origins, status


# -- GeoTIFF loader (native/geotiff_loader.cpp) ------------------------------

_GTIF_PATH = Path(__file__).resolve().parent.parent / "native" / "libgeotiff_loader.so"
_gtif = None


def _load_gtif():
    global _gtif
    if _gtif is not None:
        return _gtif
    if not _GTIF_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_GTIF_PATH))
    except OSError:
        return None
    lib.gtif_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.gtif_probe.restype = ctypes.c_int
    lib.gtif_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gtif_load_batch.restype = None
    _gtif = lib
    return lib


def gtif_available() -> bool:
    return _load_gtif() is not None


def gtif_probe(path) -> Optional[Tuple[int, int]]:
    """(rows, cols) of a baseline TIFF, or None if not readable natively."""
    lib = _load_gtif()
    if lib is None:
        return None
    rows = ctypes.c_int()
    cols = ctypes.c_int()
    rc = lib.gtif_probe(str(path).encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    return rows.value, cols.value


def gtif_load_batch(
    paths: List, rows: int, cols: int, max_threads: int = 8
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode many GeoTIFF tiles in parallel into [n, rows, cols] float32.

    Rows come out SOUTH-first (the Tile orientation — the flip happens in
    C++, not as a Python copy). Returns (tiles, status[n]) or None if the
    lib is missing.
    """
    lib = _load_gtif()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, rows, cols), np.float32)
    status = np.zeros(n, np.int32)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    lib.gtif_load_batch(
        blob,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rows,
        cols,
        max_threads,
    )
    return out, status
