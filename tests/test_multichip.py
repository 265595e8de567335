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
