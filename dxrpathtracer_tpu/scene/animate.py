"""Dynamic (animated) geometry: jittable rigid scene transforms.

The reference's DXR pipeline rebuilds its acceleration structures on the
GPU (DXRPathTracer.cpp:2331-2488) — the capability that makes animated
geometry possible on that stack, though the app itself only exercises it on
scene switches. Here the same capability is a first-class flow: a rigid
transform of the Scene pytree runs on device, the LBVH is rebuilt on device
(accel/device_build.py), and because the transformed scene and rebuilt
table have identical shapes/static-metadata, the session's compiled render
step is reused frame-to-frame with ZERO retracing or host round-trips.

Exposed to users as `python -m dxrpathtracer_tpu animate` (a turntable of
the whole scene around its vertical axis, any registered scene).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .types import Scene, SpotLights, TRI_SHADE_VTX


def _rot_y(theta):
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    return c, s


def _rotate_y_points(p, c, s, center):
    """Rotate (N, 3) points about the vertical axis through `center`."""
    x = p[:, 0] - center[0]
    z = p[:, 2] - center[2]
    return jnp.stack([center[0] + c * x + s * z,
                      p[:, 1],
                      center[2] - s * x + c * z], axis=1)


def _rotate_y_dirs(d, c, s):
    return jnp.stack([c * d[:, 0] + s * d[:, 2],
                      d[:, 1],
                      -s * d[:, 0] + c * d[:, 2]], axis=1)


def rotate_scene_y(scene: Scene, theta, center) -> Scene:
    """Jittable turntable transform: rigid rotation of all geometry (and
    spot lights) about the vertical axis through `center` (3-vector).

    Rebuilds the packed tri_shade rows' vertex blocks from the transformed
    attributes IN THE INTEGER DOMAIN: slots [42:64) hold bitcast int32
    material/meta payloads, and TPU float ops canonicalize NaN payloads /
    flush denormals (see accel/device_build.py) — so the row is assembled
    as int32 and bitcast to f32 exactly once.
    """
    c, s = _rot_y(theta)
    center = jnp.asarray(center, jnp.float32)

    pos = _rotate_y_points(scene.positions, c, s, center)
    nrm = _rotate_y_dirs(scene.normals, c, s)
    tan = _rotate_y_dirs(scene.tangents, c, s)
    bit = _rotate_y_dirs(scene.bitangents, c, s)

    tri_shade = scene.tri_shade
    if tri_shade is not None:
        i32 = jnp.int32
        blocks = []
        for vslot in range(3):
            sel = scene.tri_idx[:, vslot]
            blk = jnp.concatenate([pos[sel], nrm[sel], scene.uvs[sel],
                                   tan[sel], bit[sel]], axis=1)
            assert blk.shape[1] == TRI_SHADE_VTX
            blocks.append(jax.lax.bitcast_convert_type(blk, i32))
        tail = jax.lax.bitcast_convert_type(tri_shade, i32)[:, 3 * TRI_SHADE_VTX:]
        tri_shade = jax.lax.bitcast_convert_type(
            jnp.concatenate(blocks + [tail], axis=1), jnp.float32)

    lights = scene.lights
    if lights is not None:
        lights = SpotLights(
            position=_rotate_y_points(lights.position, c, s, center),
            direction=_rotate_y_dirs(lights.direction, c, s),
            intensity=lights.intensity,
            angular_attenuation_x=lights.angular_attenuation_x,
            angular_attenuation_y=lights.angular_attenuation_y,
            range=lights.range,
            num_lights=lights.num_lights)

    return Scene(positions=pos, normals=nrm, uvs=scene.uvs, tangents=tan,
                 bitangents=bit, tri_idx=scene.tri_idx,
                 tri_material=scene.tri_material, materials=scene.materials,
                 textures=scene.textures, lights=lights, tri_shade=tri_shade)
