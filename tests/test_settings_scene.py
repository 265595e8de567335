"""Settings registry, restart tracking, scene construction, sky cache tests."""

import numpy as np

from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
from dxrpathtracer_tpu.scene.procedural import box_test_meshes, make_box
from dxrpathtracer_tpu.scene.build import build_scene
from dxrpathtracer_tpu.scene.textures import (DEFAULT_BASECOLOR_UNORM,
                                              DEFAULT_ROUGHNESS_UNORM)


def test_settings_defaults_match_reference():
    """Defaults mirror AppSettings.cs:36-237."""
    s = AppSettings()
    assert s.sqrt_num_samples == 4
    assert s.max_path_length == 3
    assert s.max_any_hit_path_length == 1
    assert s.exposure == -14.0
    assert s.bloom_exposure == -4.0
    assert s.bloom_blur_sigma == 2.5
    assert s.sun_size == 1.0
    assert s.sun_direction == (0.26, 0.987, -0.16)
    assert s.turbidity == 2.0
    assert s.enable_indirect_specular is False
    assert s.apply_multiscattering_energy_compensation is True
    assert s.total_samples == 16


def test_restart_key_tracks_watched_settings():
    s = AppSettings()
    assert s.restart_key() == s.replace(enable_vsync=False).restart_key()
    assert s.restart_key() != s.replace(max_path_length=4).restart_key()
    assert s.restart_key() != s.replace(sun_size=2.0).restart_key()
    assert s.restart_key() != s.replace(enable_sun=False).restart_key()
    # Hashable (usable as a static jit arg)
    hash(s)


def test_boxtest_geometry():
    meshes = box_test_meshes()
    assert len(meshes) == 2
    box, slab = meshes
    assert box.positions.shape == (24, 3)
    assert box.indices.shape == (36,)
    # 2m box centered (0, 1.5, 0): top at y=2.5, bottom at 0.5
    assert np.isclose(box.positions[:, 1].max(), 2.5)
    assert np.isclose(box.positions[:, 1].min(), 0.5)
    # slab (10, 0.25, 10) at origin
    assert np.isclose(slab.positions[:, 0].max(), 5.0)
    assert np.isclose(slab.positions[:, 1].max(), 0.125)
    # Normals are unit and axis-aligned
    assert np.allclose(np.linalg.norm(box.normals, axis=-1), 1.0)


def test_scene_build_and_defaults():
    scene = build_scene(box_test_meshes())
    assert scene.num_triangles == 24
    assert scene.num_vertices == 48
    # Default material: BoxTest texture names are absent from Content ->
    # defaults (Model.cpp:104-149): albedo 0xC0 (non-sRGB), roughness 0x40
    texels = np.asarray(scene.textures.texels)
    meta = np.asarray(scene.textures.meta)
    alb_idx = int(np.asarray(scene.materials.albedo)[0])
    assert np.isclose(texels[meta[alb_idx, 0], 0], DEFAULT_BASECOLOR_UNORM)
    rough_idx = int(np.asarray(scene.materials.roughness)[0])
    assert np.isclose(texels[meta[rough_idx, 0], 0], DEFAULT_ROUGHNESS_UNORM)
    assert not scene.materials.any_opacity
    assert scene.lights.num_lights == 0


def test_box_transform_orientation():
    from dxrpathtracer_tpu.core.quaternion import quat_from_roll_pitch_yaw
    q = quat_from_roll_pitch_yaw(0.0, np.pi / 2, 0.0)  # yaw 90deg
    m = make_box((2.0, 2.0, 2.0), (5.0, 0.0, 0.0), orientation=q)
    # Rotation preserved extents for a cube; center moved to (5,0,0)
    c = (m.positions.max(0) + m.positions.min(0)) / 2
    assert np.allclose(c, [5, 0, 0], atol=1e-5)
    # Normals stay unit
    assert np.allclose(np.linalg.norm(m.normals, axis=-1), 1.0, atol=1e-6)


def test_sky_cache_dirty_tracking():
    from dxrpathtracer_tpu.sky.skycache import SkyCache
    sc = SkyCache(resolution=16)
    sun = np.array([0.26, 0.987, -0.16], np.float32)
    assert sc.update(sun, 1.0, np.array([0.25] * 3), 2.0) is True
    assert sc.update(sun, 1.0, np.array([0.25] * 3), 2.0) is False
    assert sc.update(sun, 2.0, np.array([0.25] * 3), 2.0) is True
    assert np.isfinite(sc.cubemap).all()
    assert np.isfinite(sc.sun_irradiance).all()
    assert (sc.sun_render_color <= 65000.0).all()


def test_hosek_model_values():
    """Physical sanity of the ported Hosek model (dataset must be packed)."""
    from dxrpathtracer_tpu.sky import hosek
    assert hosek.have_dataset()
    sun = np.array([0.26, 0.987, -0.16])
    sun = sun / np.linalg.norm(sun)
    m = hosek.make_sky_model(sun, 2.0, np.array([0.25] * 3))
    assert m.name == "hosek"
    # Sky brighter near the sun than at the same elevation on the opposite
    # azimuth (circumsolar brightening).
    def rot_y(d, ang):
        c, s = np.cos(ang), np.sin(ang)
        return np.array([c * d[0] + s * d[2], d[1], -s * d[0] + c * d[2]])

    near = m.sky_radiance(rot_y(sun, np.deg2rad(10))[None, :])
    far = m.sky_radiance(rot_y(sun, np.pi)[None, :])
    assert near.sum() > far.sum() > 0
    # Solar disc is orders of magnitude brighter than the sky dome
    solar = m.solar_radiance(sun[None, :])
    assert solar.min() > 1000.0
    # Zenith luminance of a turbidity-2 sky ~ O(10) kcd/m^2: radiance
    # (pre-683) of a few to tens of W/m^2/sr-equivalent units
    zenith = m.sky_radiance(np.array([[0.0, 1.0, 0.0]]))
    assert 0.5 < zenith[0, 1] < 100.0


def test_cubemap_roundtrip():
    from dxrpathtracer_tpu.sky.cubemap import (build_cubemap_from_fn,
                                               sample_cubemap)
    import jax.numpy as jnp

    def fn(d):
        return np.stack([d[:, 0] * 0.5 + 0.5, d[:, 1] * 0.5 + 0.5,
                         d[:, 2] * 0.5 + 0.5], -1)

    cube = build_cubemap_from_fn(fn, resolution=32)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(sample_cubemap(jnp.asarray(cube), jnp.asarray(dirs)))
    expect = fn(dirs)
    assert np.allclose(got, expect, atol=0.02)


def test_corrupt_fbx_warns_and_strict_raises(tmp_path, caplog):
    """A broken FBX must NEVER silently become the procedural stand-in:
    non-strict emits a warning, strict raises (VERDICT round-2 item 9)."""
    import logging
    import dataclasses
    from dxrpathtracer_tpu.scene import registry

    bad = tmp_path / "corrupt.fbx"
    bad.write_bytes(b"Kaydara FBX Binary  \x00\x1a\x00" + b"\xde\xad\xbe\xef" * 64)
    preset = dataclasses.replace(registry.PRESETS[Scenes.Sponza],
                                 fbx_path=str(bad))

    with caplog.at_level(logging.WARNING, logger="dxrpathtracer_tpu.scene.registry"):
        meshes = registry.load_scene_meshes(preset, strict=False)
    assert meshes, "fallback stand-in expected"
    assert any("FBX" in r.message and "stand-in" in r.message
               for r in caplog.records), "expected a loud fallback warning"

    import pytest
    with pytest.raises(Exception):
        registry.load_scene_meshes(preset, strict=True)


def test_atlas_two_channel_texture():
    """BC5/ATI2-style 2-channel normal maps must pack into the RGBA pool
    (blue=0, alpha=1) instead of crashing build() (ADVICE.md round 2)."""
    from dxrpathtracer_tpu.scene.textures import AtlasBuilder

    b = AtlasBuilder()
    data = np.random.default_rng(0).random((4, 4, 2)).astype(np.float32)
    idx = b.add("bc5_normal", data)
    atlas = b.build()
    base, w, h = (int(x) for x in np.asarray(atlas.meta)[idx])
    texels = np.asarray(atlas.texels)[base:base + w * h].reshape(h, w, 4)
    np.testing.assert_allclose(texels[..., :2], data, atol=1e-6)
    np.testing.assert_array_equal(texels[..., 2], 0.0)
    np.testing.assert_array_equal(texels[..., 3], 1.0)


def test_suntemple_standin_composition():
    """The SunTemple stand-in must (a) carry the asset's REAL BC4 foliage
    opacity on material 1 (the snapshot's only SunTemple content) and (b)
    put geometry in front of the reference camera preset
    (DXRPathTracer.cpp:96-97) — the round-3 gallery exposed the Sponza
    stand-in rendering a blank wall there."""
    from dxrpathtracer_tpu.scene import registry
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene
    from dxrpathtracer_tpu.accel.traverse import closest_hit
    import jax.numpy as jnp

    scene, preset = registry.load_scene(Scenes.SunTemple)
    assert bool(scene.materials.any_opacity)
    assert scene.num_triangles > 200_000
    # ALL THREE real on-disk opacity maps are bound (materials 1-3), each to
    # a distinct atlas texture
    from pathlib import Path
    if all((Path("/root/reference") / p).exists()
           for p in registry.SUNTEMPLE_FOLIAGE_DDS):
        has_op = np.asarray(scene.materials.has_opacity)
        op = np.asarray(scene.materials.opacity)
        assert has_op[1] and has_op[2] and has_op[3]
        assert len({int(op[1]), int(op[2]), int(op[3])}) == 3

    # camera-forward rays must hit geometry at sensible distances
    cam = FirstPersonCamera(aspect=16 / 9)
    cam.set_position(preset.camera_position)
    cam.set_x_rotation(preset.camera_rotation[0])
    cam.set_y_rotation(preset.camera_rotation[1])
    fwd = np.asarray(cam.forward(), np.float32)
    o = jnp.asarray(np.broadcast_to(np.asarray(preset.camera_position,
                                               np.float32), (8, 3)).copy())
    # fan of rays around forward
    rng = np.random.default_rng(3)
    d = fwd[None, :] + 0.15 * rng.normal(size=(8, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    bvh = build_bvh_for_scene(scene)
    rec = closest_hit(bvh, o, d, jnp.zeros(8), jnp.full(8, 3e38))
    t = np.asarray(rec.t)
    hit = np.asarray(rec.tri_id) >= 0
    assert hit.all()
    # the processional axis is open: hits between 2m (not inside a wall)
    # and 60m (the courtyard is closed)
    assert (t[hit] > 2.0).all() and (t[hit] < 60.0).all(), t
