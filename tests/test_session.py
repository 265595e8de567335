"""Session-level behavior: restart logic, checkpoint/resume, spot-light NEE."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes


def _small_session(**kw):
    s = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2, **kw)
    return RenderSession(settings=s, width=16, height=16)


def test_restart_on_settings_change():
    sess = _small_session()
    sess.render_frame()
    assert sess.sample_idx == 1
    # Watched setting change -> accumulation reset (DXRPathTracer.cpp:1416-1461)
    sess.settings = sess.settings.replace(max_path_length=4)
    sess.render_frame()
    assert sess.sample_idx == 1  # reset to 0, then rendered one sample
    # Unwatched setting (vsync) does NOT reset
    sess.settings = sess.settings.replace(enable_vsync=False)
    sess.render_frame()
    assert sess.sample_idx == 2


def test_restart_on_camera_move():
    sess = _small_session()
    sess.render_frame()
    sess.camera.set_position((1.0, 2.5, -10.0))
    sess.render_frame()
    assert sess.sample_idx == 1


def test_early_out_at_total_samples():
    sess = _small_session()
    for _ in range(10):
        sess.render_frame()
    # SqrtNumSamples=2 -> stops at 4 (DXRPathTracer.cpp:2026-2028)
    assert sess.sample_idx == 4
    assert sess.render_frame() is False


def test_benchmark_mode_never_converges():
    """benchmark_mode = the reference's `static const bool Benchmark`
    (DXRPathTracer.cpp:109,247-253): the progressive loop never early-outs,
    and the flag itself is not a restart key (flipping it mid-session must
    not reset the accumulation)."""
    sess = _small_session(benchmark_mode=True)
    for _ in range(6):
        assert sess.render_frame() is True
    assert sess.sample_idx == 6  # past SqrtNumSamples^2 = 4
    assert not sess.done

    base = AppSettings(sqrt_num_samples=2)
    assert base.restart_key() == base.replace(benchmark_mode=True).restart_key()


def test_checkpoint_resume():
    sess = _small_session()
    sess.render_frame()
    sess.render_frame()
    state = sess.checkpoint_state()
    ref = np.asarray(sess.render_to_completion())

    sess2 = _small_session()
    sess2.restore_state(state)
    assert sess2.sample_idx == 2
    out = np.asarray(sess2.render_to_completion())
    assert np.allclose(out, ref, atol=1e-6)


def test_spot_light_nee():
    """A synthetic spot light illuminates the slab through the path tracer's
    NEE loop (RayTrace.hlsl:264-313): with sun+sky off, all lighting must come
    from the spot, fall off with its cone, and vanish when RenderLights=off."""
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.scene.types import make_spot_lights
    import dataclasses

    scene, preset = load_scene(Scenes.BoxTest)
    lights = make_spot_lights(
        positions=[[3.0, 4.0, 0.0]],
        # stored convention is the NEGATED pointing direction (surface->light
        # axis, DXRPathTracer.cpp:976): light points down, store up.
        directions=[[0.0, 1.0, 0.0]],
        intensities=[[50.0, 25.0, 10.0]],
        angular_attenuation=[[0.6, 1.2]])
    scene = dataclasses.replace(scene, lights=lights)

    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2,
                           enable_sun=False, enable_sky=False,
                           max_path_length=2)
    sess = RenderSession(settings=settings, width=24, height=24,
                         scene=scene, preset=preset)
    sess.settings = settings  # preset application resets sun_direction only
    img_on = np.asarray(sess.render_to_completion())
    assert np.isfinite(img_on).all()
    assert img_on.max() > 0.0  # the spot lights something
    # Color ratio follows the light's intensity (R > G > B)
    lit = img_on.reshape(-1, 3)[img_on.reshape(-1, 3).sum(-1) > 1e-4]
    assert lit.size > 0
    assert lit[:, 0].mean() > lit[:, 1].mean() > lit[:, 2].mean()

    sess2 = RenderSession(settings=settings.replace(render_lights=False),
                          width=24, height=24, scene=scene, preset=preset)
    img_off = np.asarray(sess2.render_to_completion())
    assert img_off.max() == 0.0


def test_profiler_scopes():
    from dxrpathtracer_tpu.app.profiler import Profiler
    import time
    p = Profiler()
    with p.cpu_scope("work"):
        time.sleep(0.01)
    assert p.timing("work") >= 0.009
    assert "work" in p.report()


def test_multislab_accumulation_matches_single_slab():
    """Slab-list accumulation (donated per-slab buffers) must produce the
    same image as a single-slab frame; exercises session._build_step's
    multi-slab path on a small frame by shrinking MAX_SLAB_RAYS."""
    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2)
    sess1 = RenderSession(settings=settings, width=32, height=16)
    ref = np.asarray(sess1.render_to_completion())

    class TinySlabSession(RenderSession):
        MAX_SLAB_RAYS = 32 * 4  # force 4 slabs at 32x16

    sess2 = TinySlabSession(settings=settings, width=32, height=16)
    assert len(sess2._accum_slabs) == 4
    img = np.asarray(sess2.render_to_completion())
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)

    # checkpoint/restore round-trips through the property + setter
    state = sess2.checkpoint_state()
    sess2.restore_state(state)
    assert len(sess2._accum_slabs) == 4
    np.testing.assert_allclose(np.asarray(sess2.accum), img, rtol=1e-6)


def test_gpu_scope_fences_on_result():
    from dxrpathtracer_tpu.app.profiler import Profiler
    import jax.numpy as jnp
    p = Profiler()
    with p.gpu_scope("pass") as scope:
        scope.result = jnp.ones((8, 8)) * 2.0
    assert p.timing("pass") > 0.0


def test_staged_tracer_matches_monolith():
    """StagedTracer (separately-jitted per-pass dispatches, the default
    single-chip path) must produce the SAME image as the monolithic
    trace_paths program (used by the sharded multi-chip step) — both drivers
    call the same _shade_vertex/_flush_shadow/_apply_vertex helpers, with a
    spot light so the batched shadow flush carries sun+spot+terminal rays."""
    import dataclasses
    import os

    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.scene.types import make_spot_lights

    scene, preset = load_scene(Scenes.BoxTest)
    lights = make_spot_lights(
        positions=[[3.0, 4.0, 0.0]], directions=[[0.0, 1.0, 0.0]],
        intensities=[[50.0, 25.0, 10.0]], angular_attenuation=[[0.6, 1.2]])
    scene = dataclasses.replace(scene, lights=lights)
    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2)

    imgs = {}
    for mode in ("staged", "monolith"):
        if mode == "staged":
            os.environ["DXRPT_STAGED"] = "1"
        else:
            os.environ.pop("DXRPT_STAGED", None)
        try:
            sess = RenderSession(settings=settings, width=24, height=24,
                                 scene=scene, preset=preset)
            sess.settings = settings
            imgs[mode] = np.asarray(sess.render_to_completion())
        finally:
            os.environ.pop("DXRPT_STAGED", None)
    diff = np.abs(imgs["staged"] - imgs["monolith"]).max()
    assert diff < 1e-5, diff


def test_cli_render_profile_trace(tmp_path):
    """--profile-trace captures a jax.profiler device trace around the
    render (the PIX/timestamp-capture equivalent, SURVEY §5.1)."""
    import os
    from dxrpathtracer_tpu.app.cli import main
    out = tmp_path / "r.png"
    trace_dir = tmp_path / "trace"
    rc = main(["render", "--current-scene", "BoxTest", "--width", "16",
               "--height", "16", "--sqrt-num-samples", "1",
               "--profile-trace", str(trace_dir), "--output", str(out)])
    assert rc in (0, None)
    assert out.exists()
    found = [f for _root, _d, files in os.walk(trace_dir) for f in files]
    assert found, "trace directory is empty"


def test_cli_bake_bundle_then_lightmap_lit_render(tmp_path):
    """`bake --output FILE.npz` saves a {lightmap, tri_uv} bundle and
    `render --raster --lightmap FILE.npz` renders lightmap-lit from it —
    the CLI form of the reference's EnableLightMapRender flow
    (Mesh.hlsl:155-162)."""
    from dxrpathtracer_tpu.app.cli import main
    bundle = tmp_path / "lm.npz"
    rc = main(["bake", "--current-scene", "BoxTest", "--resolution", "32",
               "--samples", "1", "--output", str(bundle)])
    assert rc in (0, None)
    data = np.load(bundle)
    assert data["lightmap"].shape == (32, 32, 3)
    assert data["tri_uv"].ndim == 3 and data["tri_uv"].shape[1:] == (3, 2)

    out = tmp_path / "lit.png"
    rc = main(["render", "--raster", "--current-scene", "BoxTest",
               "--width", "32", "--height", "16",
               "--lightmap", str(bundle), "--output", str(out)])
    assert rc in (0, None)
    assert out.exists()
