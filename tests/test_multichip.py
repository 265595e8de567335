"""Multi-chip row-sharded rendering == single-chip rendering (ULP-tight).

Runs on 8 virtual CPU devices (conftest sets
--xla_force_host_platform_device_count=8), the CI stand-in for an ICI mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
from dxrpathtracer_tpu.parallel.mesh import (make_render_mesh, make_sharded_step,
                                             shard_accum)
from dxrpathtracer_tpu.render.camera import FirstPersonCamera
from dxrpathtracer_tpu.render.integrator import FrameConstants, render_sample
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene


def test_sharded_equals_single():
    assert len(jax.devices()) >= 8
    scene, preset = load_scene(Scenes.BoxTest)
    bvh = build_bvh_for_scene(scene)
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position(preset.camera_position)
    W, H = 16, 16
    sun = np.asarray(preset.sun_direction, np.float32)
    sun /= np.linalg.norm(sun)
    frame = FrameConstants(
        inv_view_projection=jnp.asarray(cam.inv_view_projection()),
        camera_pos_ws=jnp.asarray(cam.position),
        sun_direction_ws=jnp.asarray(sun),
        sun_irradiance=jnp.asarray(np.asarray([90, 75, 56], np.float32)),
        sun_render_color=jnp.asarray(np.asarray([65000, 53437, 39919], np.float32)),
        cos_sun_angular_radius=jnp.float32(np.cos(np.deg2rad(1.0))),
        sin_sun_angular_radius=jnp.float32(np.sin(np.deg2rad(1.0))),
        curr_sample_idx=jnp.uint32(0),
    )
    sky = jnp.full((6, 8, 8, 3), 2.0, jnp.float32)
    settings = AppSettings(sqrt_num_samples=1)

    single = np.asarray(render_sample(scene, bvh, sky, settings, frame, W, H,
                                      jnp.zeros((H, W, 3), jnp.float32)))

    mesh = make_render_mesh(jax.devices()[:8])
    step = make_sharded_step(mesh, settings, W, H)
    accum = shard_accum(mesh, jnp.zeros((H, W, 3), jnp.float32))
    sharded = np.asarray(step(scene, bvh, accum, sky, frame))

    assert sharded.shape == single.shape
    # Same math, different XLA programs: fusion choices differ by last-ULP
    # rounding; require near-bitwise agreement.
    assert np.allclose(sharded, single, rtol=1e-5, atol=1e-5), (
        np.abs(sharded - single).max())


def test_sharded_bake_equals_single():
    """The bake dispatch (the reference's DispatchRays(4096,4096)) sharded
    by texel rows equals the single-chip bake_sample (global CMJ indices
    come from the per-device row offset)."""
    assert len(jax.devices()) >= 8
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.bake.baker import Baker, bake_sample
    from dxrpathtracer_tpu.parallel.mesh import make_sharded_bake_step

    res = 32
    sess = RenderSession(settings=AppSettings(current_scene=Scenes.BoxTest),
                         width=8, height=8)
    baker = Baker(sess, resolution=res)
    assert len(baker._accum_slabs) == 1, "expected a single slab at 32x32"
    pos = baker._pos_slabs[0]
    nrm = baker._nrm_slabs[0]
    frame = sess.frame_constants(0)

    single = np.asarray(bake_sample(
        sess.scene, sess.bvh, sess._sky_cube_dev, sess.settings, frame,
        pos, nrm, jnp.zeros((res, res, 4), jnp.float32), jnp.uint32(0),
        row_offset=jnp.uint32(0), total_texels=res * res,
        sun_bvh=sess.sun_grid))

    mesh = make_render_mesh(jax.devices()[:8])
    step = make_sharded_bake_step(mesh, sess.settings, res)
    accum = shard_accum(mesh, jnp.zeros((res, res, 4), jnp.float32))
    pos_sh = shard_accum(mesh, pos)
    nrm_sh = shard_accum(mesh, nrm)
    sharded = np.asarray(step(sess.scene, sess.bvh, accum,
                              sess._sky_cube_dev, frame, pos_sh, nrm_sh,
                              jnp.uint32(0), sess.sun_grid))

    assert sharded.shape == single.shape
    # the bake chain (trace + firefly clamp + validity) is longer than the
    # render path, so fusion-order rounding accumulates a little more
    assert np.allclose(sharded, single, rtol=1e-4, atol=1e-4), (
        np.abs(sharded - single).max())


def test_sample_parallel_equals_sequential():
    """Sample sharding: 8 devices x 2 steps == 16 sequential single-chip
    samples. Every device takes the same sample COUNT, so the mean of
    per-device running means is the exact mean over all 16 global samples
    (modulo fp summation order)."""
    import dataclasses
    from dxrpathtracer_tpu.parallel.mesh import (make_sample_parallel_step,
                                                 sample_parallel_image)

    assert len(jax.devices()) >= 8
    scene, preset = load_scene(Scenes.BoxTest)
    bvh = build_bvh_for_scene(scene)
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position(preset.camera_position)
    W, H = 16, 16
    sun = np.asarray(preset.sun_direction, np.float32)
    sun /= np.linalg.norm(sun)
    frame0 = FrameConstants(
        inv_view_projection=jnp.asarray(cam.inv_view_projection()),
        camera_pos_ws=jnp.asarray(cam.position),
        sun_direction_ws=jnp.asarray(sun),
        sun_irradiance=jnp.asarray(np.asarray([90, 75, 56], np.float32)),
        sun_render_color=jnp.asarray(np.asarray([65000, 53437, 39919], np.float32)),
        cos_sun_angular_radius=jnp.float32(np.cos(np.deg2rad(1.0))),
        sin_sun_angular_radius=jnp.float32(np.sin(np.deg2rad(1.0))),
        curr_sample_idx=jnp.uint32(0),
    )
    sky = jnp.full((6, 8, 8, 3), 2.0, jnp.float32)
    settings = AppSettings(sqrt_num_samples=4)  # 16 samples

    # sequential single-chip reference: 16 progressive samples
    accum1 = jnp.zeros((H, W, 3), jnp.float32)
    for i in range(16):
        f = dataclasses.replace(frame0, curr_sample_idx=jnp.uint32(i))
        accum1 = render_sample(scene, bvh, sky, settings, f, W, H, accum1)
    single = np.asarray(accum1)

    # 8-device sample-parallel: 2 steps of 8 samples each
    n_dev = 8
    mesh = make_render_mesh(jax.devices()[:n_dev], axis_name="samples")
    step = make_sample_parallel_step(mesh, settings, W, H)
    accum = shard_accum(mesh, jnp.zeros((n_dev, H, W, 3), jnp.float32),
                        axis_name="samples")
    for i in range(2):
        f = dataclasses.replace(frame0, curr_sample_idx=jnp.uint32(i))
        accum = step(scene, bvh, accum, sky, f)
    parallel = np.asarray(sample_parallel_image(accum))

    assert parallel.shape == single.shape
    assert np.isfinite(parallel).all()
    # identical sample set, different summation order (mean-of-means vs
    # sequential running mean)
    assert np.allclose(parallel, single, rtol=1e-4, atol=1e-4), (
        np.abs(parallel - single).max())


def test_grid_2d_equals_sequential():
    """(2 samples x 4 rows) 2D mesh == 4 sequential single-chip samples."""
    import dataclasses
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from dxrpathtracer_tpu.parallel.mesh import (make_grid_step,
                                                 sample_parallel_image)

    assert len(jax.devices()) >= 8
    scene, preset = load_scene(Scenes.BoxTest)
    bvh = build_bvh_for_scene(scene)
    cam = FirstPersonCamera(aspect=1.0)
    cam.set_position(preset.camera_position)
    W, H = 16, 16
    sun = np.asarray(preset.sun_direction, np.float32)
    sun /= np.linalg.norm(sun)
    frame0 = FrameConstants(
        inv_view_projection=jnp.asarray(cam.inv_view_projection()),
        camera_pos_ws=jnp.asarray(cam.position),
        sun_direction_ws=jnp.asarray(sun),
        sun_irradiance=jnp.asarray(np.asarray([90, 75, 56], np.float32)),
        sun_render_color=jnp.asarray(np.asarray([65000, 53437, 39919], np.float32)),
        cos_sun_angular_radius=jnp.float32(np.cos(np.deg2rad(1.0))),
        sin_sun_angular_radius=jnp.float32(np.sin(np.deg2rad(1.0))),
        curr_sample_idx=jnp.uint32(0),
    )
    sky = jnp.full((6, 8, 8, 3), 2.0, jnp.float32)
    settings = AppSettings(sqrt_num_samples=2)  # 4 samples

    accum1 = jnp.zeros((H, W, 3), jnp.float32)
    for i in range(4):
        f = dataclasses.replace(frame0, curr_sample_idx=jnp.uint32(i))
        accum1 = render_sample(scene, bvh, sky, settings, f, W, H, accum1)
    single = np.asarray(accum1)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                axis_names=("samples", "rows"))
    step = make_grid_step(mesh, settings, W, H)
    accum = jax.device_put(jnp.zeros((2, H, W, 3), jnp.float32),
                           NamedSharding(mesh, P("samples", "rows")))
    for i in range(2):
        f = dataclasses.replace(frame0, curr_sample_idx=jnp.uint32(i))
        accum = step(scene, bvh, accum, sky, f)
    parallel = np.asarray(sample_parallel_image(accum))

    assert parallel.shape == single.shape
    assert np.isfinite(parallel).all()
    assert np.allclose(parallel, single, rtol=1e-4, atol=1e-4), (
        np.abs(parallel - single).max())
