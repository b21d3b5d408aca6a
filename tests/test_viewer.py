"""Viewer interaction parity (src/viewer/app.rs:272-328) tested headlessly.

The ViewerApp logic is backend-independent; these tests drive it on the Agg
backend with synthetic events: wheel-zoom about the cursor, drag-pan,
click-select, Space-select, Esc-clear.
"""

import types

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")


def _fake_result(h=24, w=32, k=2):
    from atm_raytracer_tpu.generators.base import HitBuffer, RenderResult

    rng = np.random.default_rng(0)
    valid = np.zeros((h, w, k), bool)
    valid[..., 0] = True
    hits = HitBuffer(
        valid=valid,
        key=np.where(valid, 1.0, np.inf).astype(np.float32),
        dlat=rng.normal(0, 0.01, (h, w, k)).astype(np.float32),
        dlon=rng.normal(0, 0.01, (h, w, k)).astype(np.float32),
        distance=np.full((h, w, k), 1234.5, np.float32),
        elevation=np.full((h, w, k), 321.0, np.float32),
        path_length=np.full((h, w, k), 1240.0, np.float32),
        normal=np.tile(np.array([0, 0, 1], np.float32), (h, w, k, 1)),
        kind=np.zeros((h, w, k), np.int32),
        rgba=np.ones((h, w, k, 4), np.float32),
    )
    return RenderResult(
        image=np.zeros((h, w, 3), np.uint8),
        hits=hits,
        elevation_deg=np.linspace(5, -5, h),
        azimuth_deg=np.linspace(40, 60, w),
        observer=(49.5, 21.5, 400.0),
    )


@pytest.fixture()
def app():
    from atm_raytracer_tpu.meta.viewer import build_viewer

    result = _fake_result()
    fig, app = build_viewer(None, result, title="t")
    yield app
    import matplotlib.pyplot as plt

    plt.close(fig)


def _ev(app, x=None, y=None, key=None, step=0, inside=True):
    return types.SimpleNamespace(
        inaxes=app.ax_img if inside else None,
        xdata=x, ydata=y, key=key, step=step, button=1,
    )


def test_click_selects_pixel(app):
    app.on_press(_ev(app, 10.2, 7.8))
    app.on_release(_ev(app, 10.2, 7.8))
    assert "Pixel (10, 8)" in app.text.get_text()
    assert list(app.marker.get_xdata()) == [10]


def test_wheel_zooms_about_cursor(app):
    x0, y0 = 10.0, 8.0
    xlim0 = app.ax_img.get_xlim()
    app.on_scroll(_ev(app, x0, y0, step=1))  # zoom in
    xlim1 = app.ax_img.get_xlim()
    scale = 1.0 / app.ZOOM_STEP
    assert xlim1[0] == pytest.approx(x0 - (x0 - xlim0[0]) * scale)
    assert xlim1[1] == pytest.approx(x0 + (xlim0[1] - x0) * scale)
    # the cursor's relative position within the view is invariant
    rel0 = (x0 - xlim0[0]) / (xlim0[1] - xlim0[0])
    rel1 = (x0 - xlim1[0]) / (xlim1[1] - xlim1[0])
    assert rel1 == pytest.approx(rel0)
    # zooming back out restores the original window
    app.on_scroll(_ev(app, x0, y0, step=-1))
    assert app.ax_img.get_xlim() == pytest.approx(xlim0)


def test_drag_pans_and_does_not_select(app):
    xlim0 = app.ax_img.get_xlim()
    ylim0 = app.ax_img.get_ylim()
    app.on_press(_ev(app, 5.0, 5.0))
    app.on_motion(_ev(app, 8.0, 6.0))  # +3 in x, +1 in y
    # after the shift the cursor's data coords map back to the anchor (5, 5);
    # a further +2 screen motion therefore reports data (7, 5)
    app.on_motion(_ev(app, 7.0, 5.0))
    app.on_release(_ev(app, 7.0, 5.0))
    xlim1 = app.ax_img.get_xlim()
    ylim1 = app.ax_img.get_ylim()
    assert xlim1[0] == pytest.approx(xlim0[0] - 5.0)
    assert xlim1[1] == pytest.approx(xlim0[1] - 5.0)
    assert ylim1[0] == pytest.approx(ylim0[0] - 1.0)
    assert "Pixel" not in app.text.get_text()  # a drag is not a click


def test_space_selects_cursor_and_escape_clears(app):
    app.on_motion(_ev(app, 3.4, 2.1))  # hover
    app.on_key(_ev(app, key=" "))
    assert "Pixel (3, 2)" in app.text.get_text()
    assert "1.234 km" in app.text.get_text()
    app.on_key(_ev(app, key="escape"))
    assert "Pixel" not in app.text.get_text()
    assert len(app.marker.get_xdata()) == 0


def test_events_outside_image_ignored(app):
    xlim0 = app.ax_img.get_xlim()
    app.on_scroll(_ev(app, 5.0, 5.0, step=1, inside=False))
    app.on_press(_ev(app, 5.0, 5.0, inside=False))
    app.on_motion(_ev(app, 9.0, 9.0, inside=False))
    assert app.ax_img.get_xlim() == pytest.approx(xlim0)
    assert app._drag is None
