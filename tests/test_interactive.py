"""Interactive app loop (app/interactive.py — the reference's windowed
message pump, App.cpp:55-87 + DXRPathTracer camera/HUD) driven headlessly
through the scripted input path."""

import numpy as np

from dxrpathtracer_tpu.app.interactive import (InteractiveApp,
                                               ansi_halfblock_frame, to_rgb8)
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes


def _app(**kw):
    return InteractiveApp(
        settings=AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2),
        width=32, height=32, display=False, **kw)


def test_scripted_loop_renders_and_accumulates():
    app = _app()
    n = app.run_scripted([(None, 3)])
    assert n == 3
    assert app.session.sample_idx == 3
    assert np.isfinite(np.asarray(app.session.accum)).all()
    assert len(app.frame_times) == 3
    hud = app.hud_line()
    assert "MRays/s" in hud and "sample" in hud


def test_camera_move_restarts_accumulation():
    """Camera input must reset progressive accumulation on the next update
    (DXRPathTracer.cpp:1416-1461 restart watch)."""
    app = _app()
    app.run_scripted([(None, 2)])
    assert app.session.sample_idx == 2
    pos0 = app.session.camera.position.copy()
    app.run_scripted([("w", 1)])
    assert not np.allclose(app.session.camera.position, pos0)
    assert app.session.sample_idx == 1  # restarted, then rendered one sample


def test_look_keys_rotate_and_restart():
    app = _app()
    app.run_scripted([(None, 1)])
    y0 = app.session.camera.y_rot
    app.run_scripted([("l", 1)])
    assert app.session.camera.y_rot != y0
    assert app.session.sample_idx == 1


def test_exposure_key_changes_display_not_accum():
    app = _app()
    app.run_scripted([(None, 1)])
    before = np.asarray(app.current_display_image()).mean()
    app.handle_key("]")  # +0.5 exposure
    after = np.asarray(app.current_display_image()).mean()
    assert after > before


def test_quit_key_stops_loop():
    app = _app()
    n = app.run_scripted([(None, 1), ("x", 5)])
    assert app.quit
    assert n == 1


def test_screenshot_writes_png(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    app = _app()
    app.run_scripted([(None, 1), ("p", 0)])
    assert (tmp_path / "screenshot_000.png").exists()


def test_ansi_halfblock_present():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:8] = [255, 0, 0]
    txt = ansi_halfblock_frame(img, max_cols=16, max_rows=8)
    assert "▀" in txt and "38;2;255;0;0" in txt
    assert txt.count("\n") == 7


def test_to_rgb8_range():
    x = np.asarray([[[-0.5, 0.5, 2.0]]], np.float32)
    out = to_rgb8(x)
    assert out.tolist() == [[[0, 127, 255]]]
