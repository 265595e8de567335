"""Alpha-test at benchmark scale on REAL BC4 opacity data (VERDICT r2 item
6): SunTemple's on-disk foliage opacity maps drive the any-hit accept_fn
(RayTrace.hlsl:485-507; Timing.txt:6-8 is the matching perf axis)."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.scene.registry import FOLIAGE_DDS, sponza_alpha_standin

_HAVE_DDS = (Path("/root/reference") / FOLIAGE_DDS).exists()
pytestmark = pytest.mark.skipif(not _HAVE_DDS,
                                reason="SunTemple foliage DDS not present")


@pytest.fixture(scope="module")
def alpha_scene():
    scene, preset = sponza_alpha_standin(num_cards=32)
    return scene, preset


def test_scene_has_real_opacity(alpha_scene):
    scene, _ = alpha_scene
    assert scene.materials.any_opacity
    assert bool(np.asarray(scene.materials.has_opacity)[1])
    # the bound texture is the real 1024^2 BC4 mask, not a default texel
    idx = int(np.asarray(scene.materials.opacity)[1])
    base, w, h = (int(v) for v in np.asarray(scene.textures.meta)[idx])
    assert (w, h) == (1024, 1024)
    texels = np.asarray(scene.textures.texels)[base:base + w * h, 0]
    assert 0.05 < (texels < 0.35).mean() < 0.95  # a real mask: mixed coverage


def test_any_hit_passes_through_transparent_texels(alpha_scene):
    """Shadow rays through a foliage card: with the alpha accept_fn the
    transmitted fraction matches the mask's transparent fraction; with
    FORCE_OPAQUE (accept_fn=None) everything is blocked."""
    import jax
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.accel.traverse import any_hit
    from dxrpathtracer_tpu.render.integrator import _make_alpha_test
    from dxrpathtracer_tpu.app.settings import AppSettings
    from dxrpathtracer_tpu.scene.build import build_scene
    from dxrpathtracer_tpu.scene.procedural import make_plane
    from dxrpathtracer_tpu.scene.registry import _load_fbx_scene_full  # noqa: F401
    import dataclasses

    # a single upright card at the origin with the real opacity mask
    from dxrpathtracer_tpu.scene.textures import (AtlasBuilder,
                                                  default_material_table)
    from dxrpathtracer_tpu.scene.dds import load_dds
    builder = AtlasBuilder()
    materials = default_material_table(1, builder)
    mask = load_dds(Path("/root/reference") / FOLIAGE_DDS).data
    op_idx = builder.add("opacity", mask)
    opacity = np.asarray(materials.opacity).copy()
    opacity[0] = op_idx
    materials = dataclasses.replace(
        materials, opacity=opacity,
        has_opacity=np.ones(1, bool), any_opacity=True)
    card = make_plane((2.0, 2.0), (0.0, 0.0, 0.0))
    scene = build_scene([card], materials=materials, atlas_builder=builder)
    scene_dev = jax.device_put(scene)
    bvh = build_bvh(
        np.asarray(scene.positions)[np.asarray(scene.tri_idx)[:, 0]],
        np.asarray(scene.positions)[np.asarray(scene.tri_idx)[:, 1]],
        np.asarray(scene.positions)[np.asarray(scene.tri_idx)[:, 2]])

    n = 64 * 64
    g = np.linspace(-0.95, 0.95, 64)
    gx, gz = np.meshgrid(g, g, indexing="ij")
    o = np.stack([gx.ravel(), np.full(n, -1.0), gz.ravel()], -1).astype(np.float32)
    d = np.broadcast_to(np.asarray([0.0, 1.0, 0.0], np.float32), (n, 3))
    tmax = jnp.full((n,), 10.0)

    accept = _make_alpha_test(scene_dev, AppSettings())
    vis_alpha = np.asarray(any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                                   0.0, tmax, accept_fn=accept))
    vis_opaque = np.asarray(any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                                    0.0, tmax))
    assert vis_opaque.mean() == 0.0  # FORCE_OPAQUE: card blocks everything
    passed = vis_alpha.mean()
    # transmitted fraction ~ the mask's transparent (opacity < 0.35) area
    texels = np.asarray(mask)[..., 0]
    transparent = (texels < 0.35).mean()
    assert abs(passed - transparent) < 0.12, (passed, transparent)


def test_alpha_scene_renders_finite(alpha_scene):
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    scene, preset = alpha_scene
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes.Sponza,
                             sqrt_num_samples=2),
        width=64, height=32, scene=scene, preset=preset)
    sess.render_frame()
    arr = np.asarray(sess.accum)
    assert np.isfinite(arr).all()
    assert arr.max() > 0.0


def test_punch_through_matches_inloop_accept(alpha_scene):
    """The punch-through alpha traversal (accept evaluated sparsely outside
    the loop) returns exactly what the in-loop accept_fn oracle returns."""
    import jax
    from functools import partial
    from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene
    from dxrpathtracer_tpu.accel.traverse import closest_hit
    from dxrpathtracer_tpu.render.integrator import (_make_alpha_test,
                                                     _punch_through_closest)
    from dxrpathtracer_tpu.app.settings import AppSettings

    scene, _ = alpha_scene
    scene_dev = jax.device_put(scene)
    bvh = build_bvh_for_scene(scene_dev,
                              positions=np.asarray(scene.positions),
                              tri_idx=np.asarray(scene.tri_idx))
    accept = _make_alpha_test(scene_dev, AppSettings())

    rng = np.random.default_rng(0)
    n = 1024
    o = np.stack([rng.uniform(-10, 10, n), rng.uniform(0.5, 7, n),
                  rng.uniform(-4, 4, n)], -1).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    tmax = jnp.full((n,), 50.0)
    act = jnp.ones((n,), bool)

    ref = closest_hit(bvh, o, d, 1e-4, tmax, act, accept_fn=accept)
    got = _punch_through_closest(partial(closest_hit, bvh), accept,
                                 o, d, jnp.full((n,), 1e-4), tmax, act)
    same_tri = np.asarray(ref.tri_id) == np.asarray(got.tri_id)
    assert same_tri.mean() > 0.999, f"{(~same_tri).sum()} mismatches"
    both = (np.asarray(ref.tri_id) >= 0) & same_tri
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-5)
