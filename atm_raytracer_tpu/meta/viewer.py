"""Metadata viewer: re-render + per-pixel inspection (`view` subcommand).

Capability parity with the reference's FLTK GUI (src/viewer/app.rs): the
image is re-rendered from stored trace points via the same compositor
(app.rs:244 reuses renderer::draw_image), pixels can be inspected for view
direction, per-trace-point distance (km/mi), elevation (m/ft) and lat/lon in
DMS (app.rs:112-176).

Two modes:
* interactive (matplotlib window, when a display is available): pan/zoom via
  the matplotlib toolbar, click a pixel to select (space in the reference),
  info panel beside the image, Esc clears;
* headless: ``--pixel X Y`` prints the same info to stdout; ``--save-image``
  writes the re-rendered PNG.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import Config
from ..generators.base import RenderResult
from ..ops.composite import composite
from ..render.image import save_png
from .serialize import load_metadata


def _render_from_metadata(config: Config, result: RenderResult) -> np.ndarray:
    coloring = config.view.coloring.into_coloring(
        config.view.frame, config.view.position, config.earth_shape
    )
    hits = result.hits
    img = composite(
        coloring,
        config.view.fog_distance,
        np.asarray(hits.valid),
        np.asarray(hits.rgba[..., 3]),
        np.asarray(hits.distance),
        np.asarray(hits.elevation),
        np.asarray(hits.path_length),
        np.asarray(hits.normal),
        np.asarray(hits.kind),
        np.asarray(hits.rgba[..., :3]),
    )
    return np.asarray(img)


def _dms(value: float, pos: str, neg: str) -> str:
    """Degrees-minutes-seconds like viewer/app.rs:141-176."""
    hemi = pos if value >= 0 else neg
    v = abs(value)
    d = int(v)
    m = int((v - d) * 60)
    s = (v - d - m / 60) * 3600
    return f"{d}°{m:02d}'{s:05.2f}\"{hemi}"


def pixel_info(config: Config, result: RenderResult, x: int, y: int) -> str:
    """Text info for one pixel (viewer/app.rs:112-176)."""
    el = np.asarray(result.elevation_deg)
    az = np.asarray(result.azimuth_deg)
    elev_ang = float(el[y, x] if el.ndim == 2 else el[y])
    azim = float(az[y, x] if az.ndim == 2 else az[x])
    lines = [
        f"Pixel ({x}, {y})",
        f"View direction: azimuth {azim:.4f}°, elevation {elev_ang:.4f}°",
    ]
    hits = result.hits
    lat0, lon0, _ = result.observer
    any_hit = False
    for k in range(hits.valid.shape[-1]):
        if not hits.valid[y, x, k]:
            continue
        any_hit = True
        dist = float(hits.distance[y, x, k])
        elev = float(hits.elevation[y, x, k])
        lat = lat0 + float(hits.dlat[y, x, k])
        lon = lon0 + float(hits.dlon[y, x, k])
        kind = "terrain" if int(hits.kind[y, x, k]) == 0 else "object"
        lines.append(
            f"Trace point {k} ({kind}): distance {dist / 1000.0:.3f} km "
            f"({dist / 1609.344:.3f} mi), elevation {elev:.1f} m "
            f"({elev / 0.3048:.1f} ft)"
        )
        lines.append(f"  position: {_dms(lat, 'N', 'S')} {_dms(lon, 'E', 'W')}")
    if not any_hit:
        lines.append("No trace points (sky).")
    return "\n".join(lines)


def run_view(path, pixel=None, save_image: Optional[str] = None) -> int:
    config, result = load_metadata(path)
    image = _render_from_metadata(config, result)
    result.image = image

    if save_image:
        save_png(image, save_image)
        print(f"Saved re-rendered image to {save_image}")
    if pixel is not None:
        x, y = pixel
        print(pixel_info(config, result, x, y))
        return 0
    if save_image:
        return 0

    # interactive mode (backend init can fail at several points headless —
    # matplotlib defers the real framework check to figure creation)
    try:
        import os as _os

        if not (_os.environ.get("DISPLAY") or _os.environ.get("WAYLAND_DISPLAY")):
            raise RuntimeError("no DISPLAY")
        import matplotlib

        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt

        fig, (ax_img, ax_info) = plt.subplots(
            1, 2, figsize=(12.8, 8.0), gridspec_kw={"width_ratios": [4, 1]}
        )
    except Exception as e:  # headless fallback
        print(f"No display available ({e}); use --pixel X Y or --save-image.")
        return 1
    ax_img.imshow(image)
    ax_img.set_title(str(path))
    ax_info.axis("off")
    text = ax_info.text(0.0, 1.0, "Click a pixel", va="top", fontsize=8,
                        family="monospace", wrap=True)
    marker = ax_img.plot([], [], "r+", markersize=12)[0]

    def on_click(event):
        if event.inaxes is not ax_img or event.xdata is None:
            return
        x, y = int(round(event.xdata)), int(round(event.ydata))
        marker.set_data([x], [y])
        text.set_text(pixel_info(config, result, x, y))
        fig.canvas.draw_idle()

    def on_key(event):
        if event.key == "escape":
            marker.set_data([], [])
            text.set_text("Click a pixel")
            fig.canvas.draw_idle()

    fig.canvas.mpl_connect("button_press_event", on_click)
    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.tight_layout()
    plt.show()
    return 0
