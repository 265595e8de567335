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


def test_settings_menu_edits_and_restarts():
    """The 'o' menu edits any registry setting via replace(); restart-watched
    changes reset progressive accumulation (Settings.cpp:176-332 equivalent)."""
    from dxrpathtracer_tpu.app.interactive import InteractiveApp

    app = InteractiveApp(width=32, height=32, display=False)
    app.render_one()
    assert app.session.sample_idx == 1
    app.handle_key("o")
    assert app.menu is not None
    # navigate to a known field and adjust it
    names = [f.name for f in app.menu.fields]
    app.menu.cursor = names.index("sqrt_num_samples")
    before = app.session.settings.sqrt_num_samples
    app.handle_key("l")
    assert app.session.settings.sqrt_num_samples == before + 1
    # bool toggle
    app.menu.cursor = names.index("enable_normal_maps")
    app.handle_key("l")
    assert app.session.settings.enable_normal_maps is False
    # menu close
    app.handle_key("o")
    assert app.menu is None
    # a restart-watched change resets accumulation on the next frame
    app.render_one()
    assert app.session.sample_idx == 1  # restarted, then rendered sample 0


def test_present_thumbnail_pipeline():
    """present() pulls only a device-downsampled uint8 thumbnail (~40 KB)
    and pipelines it one frame behind (VERDICT round-2 item 10)."""
    from dxrpathtracer_tpu.app.interactive import InteractiveApp

    app = InteractiveApp(width=64, height=64, display=True)
    import io, contextlib, sys as _sys
    app.render_one()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        app.present()   # frame 0: starts the async copy, nothing drawn yet
    assert buf.getvalue() == ""
    thumb = app._pending_thumb
    assert thumb.dtype == np.uint8
    assert thumb.shape[0] <= app.PRESENT_ROWS and thumb.shape[1] <= app.PRESENT_COLS
    app.render_one()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        app.present()   # frame 1: draws frame 0's thumbnail
    assert "▀" in buf.getvalue()


def test_bake_window_toggles_and_previews():
    """The lightmap window (reference HUD bake orchestration + 7-texture
    preview combo, DXRPathTracer.cpp:2225-2302): 'b' starts progressive
    baking (frames advance the BAKE, not the camera accumulation), 'v'
    cycles the preview, 'b' again returns to the path tracer with the
    baker retained for resume."""
    app = _app()
    n = app.run_scripted([(None, 1), ("b", 2), ("v", 1), ("v", 0), ("b", 1)])
    assert n == 5
    assert app.baker is not None
    assert app.baker.sample_index == 3  # 2 + 1 while preview cycled
    assert not app.bake_mode
    assert app.preview_idx == 2
    assert np.isfinite(np.asarray(app.baker.lightmap())).all()
    # every preview texture renders to a finite uint8 thumbnail
    app.bake_mode = True
    for i in range(len(app.PREVIEWS)):
        app.preview_idx = i
        th = app._bake_preview_thumb(16, 16)
        assert th.shape == (16, 16, 3) and th.dtype == np.uint8
    # bake HUD shows bake state
    app.frame_times.append(0.1)
    hud = app.hud_line()
    assert "baking" in hud and "preview" in hud
    # scene switch drops the stale baker
    app.handle_key("1")
    assert app.baker is None and not app.bake_mode


def test_enable_ray_tracing_setting_drives_raster_mode():
    """EnableRayTracing=false selects the forward raster path
    (DXRPathTracer::Render :1538-1559): the app starts in raster mode, 'm'
    flips the setting itself, and a settings-menu edit stays in sync."""
    app = InteractiveApp(
        settings=AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2,
                             enable_ray_tracing=False),
        width=32, height=32, display=False)
    assert app.raster_mode
    app.run_scripted([(None, 1)])   # renders the raster frame
    assert np.isfinite(np.asarray(app.session.accum)).all()
    app.handle_key("m")             # back to path tracing
    assert app.session.settings.enable_ray_tracing and not app.raster_mode
    # menu edit of the same field keeps raster_mode in sync
    app.session.settings = app.session.settings.replace(
        enable_ray_tracing=False)
    assert app.raster_mode


def test_show_progress_bar_setting_controls_hud():
    app = _app()
    app.run_scripted([(None, 1)])
    assert "sample" in app.hud_line()
    app.session.settings = app.session.settings.replace(
        show_progress_bar=False)
    assert "sample" not in app.hud_line()


def test_stable_power_state_presents_synchronously(capsys):
    """StablePowerState (DXRPathTracer.cpp:1391-1395) = repeatable timing:
    the present path must draw the CURRENT frame synchronously instead of
    the one-frame-deep pipelined thumbnail."""
    app = InteractiveApp(
        settings=AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2,
                             stable_power_state=True),
        width=32, height=32, display=True)
    app.session.update()
    app.render_one()
    app.present()   # first present must already draw (no warm-up frame)
    out = capsys.readouterr().out
    assert "\x1b[38;2;" in out


def test_raster_mode_consumes_live_bake_when_lightmap_render_enabled():
    """EnableLightMapRender in the viewer samples the in-session bake in
    raster mode (the reference's Mesh.hlsl:155-162 branch consuming the
    baked lightmap), and renders a different image than live lighting."""
    app = _app()
    app.run_scripted([("b", 2), ("b", 0)])      # bake 2 samples, exit bake
    assert app.baker is not None and not app.bake_mode
    app.session.settings = app.session.settings.replace(
        enable_ray_tracing=False)
    app.run_scripted([(None, 1)])               # raster, live lighting
    live = np.asarray(app.session.accum).copy()
    app.session.settings = app.session.settings.replace(
        enable_light_map_render=True)
    app.run_scripted([(None, 1)])               # raster, lightmap-lit
    lit = np.asarray(app.session.accum)
    assert np.isfinite(lit).all()
    assert not np.allclose(lit, live)
