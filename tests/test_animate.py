"""Dynamic geometry: rigid turntable transform (scene/animate.py) + the
`animate` CLI (per-frame on-device BVH rebuild, cli.cmd_animate)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.scene.animate import rotate_scene_y
from dxrpathtracer_tpu.scene.types import TRI_SHADE_VTX


def _scene():
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.app.settings import Scenes
    scene, _preset = load_scene(Scenes.BoxTest)
    return scene


def test_rotate_identity_and_quarter_turn():
    scene = _scene()
    center = np.array([1.0, 0.0, -2.0], np.float32)

    sc0 = rotate_scene_y(scene, jnp.float32(0.0), center)
    assert np.allclose(np.asarray(sc0.positions), np.asarray(scene.positions),
                       atol=1e-5)
    assert np.allclose(np.asarray(sc0.normals), np.asarray(scene.normals),
                       atol=1e-6)

    # quarter turn about the center: (x,z) -> (cx + (z-cz), cz - (x-cx))
    sc9 = rotate_scene_y(scene, jnp.float32(np.pi / 2), center)
    p = np.asarray(scene.positions)
    q = np.asarray(sc9.positions)
    assert np.allclose(q[:, 0], center[0] + (p[:, 2] - center[2]), atol=1e-4)
    assert np.allclose(q[:, 1], p[:, 1], atol=1e-6)
    assert np.allclose(q[:, 2], center[2] - (p[:, 0] - center[0]), atol=1e-4)
    # directions rotate without the center offset
    n = np.asarray(scene.normals)
    m = np.asarray(sc9.normals)
    assert np.allclose(m[:, 0], n[:, 2], atol=1e-5)
    assert np.allclose(m[:, 2], -n[:, 0], atol=1e-5)


def test_rotate_preserves_tri_shade_integer_payloads():
    """Slots [42:64) of tri_shade are bitcast int32 material/meta payloads;
    the rotation must carry them through BIT-EXACTLY (TPU float ops would
    canonicalize them — the transform stays in the integer domain)."""
    scene = _scene()
    assert scene.tri_shade is not None
    sc = rotate_scene_y(scene, jnp.float32(1.234), np.zeros(3, np.float32))
    old = np.asarray(scene.tri_shade).view(np.int32)
    new = np.asarray(sc.tri_shade).view(np.int32)
    assert (new[:, 3 * TRI_SHADE_VTX:] == old[:, 3 * TRI_SHADE_VTX:]).all()
    # and the vertex blocks track the rotated attribute arrays exactly
    tri = np.asarray(scene.tri_idx)
    pos = np.asarray(sc.positions)
    blk0 = np.asarray(sc.tri_shade)[:, :3]
    assert np.allclose(blk0, pos[tri[:, 0]], atol=0)


def test_animate_cli_renders_distinct_finite_frames(tmp_path):
    from dxrpathtracer_tpu.app.cli import main
    out = tmp_path / "anim"
    gif = tmp_path / "turn.gif"
    rc = main(["animate", "--current-scene", "BoxTest",
               "--width", "48", "--height", "24", "--frames", "2",
               "--spp", "1", "--output", str(out), "--gif", str(gif)])
    assert rc in (0, None)
    from PIL import Image
    f0 = np.asarray(Image.open(out / "frame_000.png")).astype(np.float32)
    f1 = np.asarray(Image.open(out / "frame_001.png")).astype(np.float32)
    assert f0.shape == (24, 48, 3)
    assert np.isfinite(f0).all() and np.isfinite(f1).all()
    assert not np.allclose(f0, f1)   # the scene visibly turned
    assert gif.exists()
