"""Sun-space occlusion grid (accel/sunspace.py): exact equivalence with the
general BVH any-hit on sun-direction rays, plus alpha-test and session
integration coverage."""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.sunspace import build_sun_grid, sun_any_hit
from dxrpathtracer_tpu.accel.traverse import any_hit


def _random_tris(rng, t, scale=10.0):
    base = rng.uniform(-scale, scale, (t, 1, 3)).astype(np.float32)
    tri = base + rng.normal(0, scale * 0.08, (t, 3, 3)).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def _random_rays(rng, n, scale=12.0):
    o = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    return jnp.asarray(o)


@pytest.mark.parametrize("seed,t,grid_size", [
    (0, 37, 512), (1, 500, 512), (2, 4000, 512),
    # Non-power-of-8 sizes: child 7 absorbs the remainder and sub-8 spans
    # emit whole-range chains (1024 silently mis-binned 64k lanes before
    # that guard landed — the on-TPU A/B caught it).
    (3, 1500, 1024), (4, 1500, 96),
])
def test_matches_any_hit_random(seed, t, grid_size):
    """Visibility equals traverse.any_hit EXACTLY (same world-space
    Moller-Trumbore, conservative grid) on random soups at several scales."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_tris(rng, t)
    sun = np.asarray([0.3, 0.9, -0.2], np.float32)
    sun /= np.linalg.norm(sun)
    grid = build_sun_grid(v0, v1, v2, sun, grid_size=grid_size)
    bvh = build_bvh(v0, v1, v2)
    n = 2048
    o = _random_rays(rng, n)
    d = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), 3e37, jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < 0.9)
    ref = np.asarray(any_hit(bvh, o, d, tmin, tmax, act))
    got = np.asarray(sun_any_hit(grid, o, d, tmin, tmax, act))
    assert (ref == got).all(), f"{(ref != got).sum()} mismatches"
    assert (ref[~np.asarray(act)] == 1.0).all()


def test_matches_any_hit_preset_scene():
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import load_scene

    scene, preset = load_scene(Scenes.Stronghold)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    sun = np.asarray(preset.sun_direction, np.float32)
    sun /= np.linalg.norm(sun)
    grid = build_sun_grid(v0, v1, v2, sun)
    bvh = build_bvh(v0, v1, v2)
    n = 4096
    rng = np.random.default_rng(3)
    lo, hi = pos.min(0), pos.max(0)
    o = jnp.asarray((rng.uniform(0, 1, (n, 3)) * (hi - lo) * 1.2
                     + lo - 0.1 * (hi - lo)).astype(np.float32))
    d = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), 3e37, jnp.float32)
    ref = np.asarray(any_hit(bvh, o, d, tmin, tmax))
    got = np.asarray(sun_any_hit(grid, o, d, tmin, tmax))
    assert (ref == got).all(), f"{(ref != got).sum()} mismatches"
    assert (ref == 0).any()   # scene actually occludes something


def test_respects_t_range():
    """Occluder outside [t_min, t_max) does not block."""
    v0 = np.asarray([[-1.0, -1.0, 5.0]], np.float32)
    v1 = np.asarray([[3.0, -1.0, 5.0]], np.float32)
    v2 = np.asarray([[-1.0, 3.0, 5.0]], np.float32)
    sun = np.asarray([0.0, 0.0, 1.0], np.float32)
    grid = build_sun_grid(v0, v1, v2, sun)
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    blocked = sun_any_hit(grid, o, d, jnp.full((1,), 1e-5),
                          jnp.full((1,), 100.0))
    past = sun_any_hit(grid, o, d, jnp.full((1,), 6.0),
                       jnp.full((1,), 100.0))
    short = sun_any_hit(grid, o, d, jnp.full((1,), 1e-5),
                        jnp.full((1,), 4.0))
    assert float(blocked[0]) == 0.0
    assert float(past[0]) == 1.0
    assert float(short[0]) == 1.0


def test_alpha_accept_fn_matches_bvh():
    """In-loop accept_fn (alpha test) sees the same (tri_id, u, v) and
    produces the same visibility as the BVH any-hit with the same fn."""
    rng = np.random.default_rng(7)
    v0, v1, v2 = _random_tris(rng, 300)
    sun = np.asarray([0.1, 0.2, 0.97], np.float32)
    sun /= np.linalg.norm(sun)
    grid = build_sun_grid(v0, v1, v2, sun)
    bvh = build_bvh(v0, v1, v2)

    def accept(tri_id, u, v):
        # deterministic pseudo-opacity: accept ~60% of (tri, uv) lookups
        h = (tri_id.astype(jnp.uint32) * jnp.uint32(2654435761)
             + (u * 255).astype(jnp.uint32) * jnp.uint32(40503)
             + (v * 255).astype(jnp.uint32))
        return (h % jnp.uint32(5)) < jnp.uint32(3)

    n = 2048
    o = _random_rays(rng, n)
    d = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), 3e37, jnp.float32)
    ref = np.asarray(any_hit(bvh, o, d, tmin, tmax, accept_fn=accept))
    got = np.asarray(sun_any_hit(grid, o, d, tmin, tmax, accept_fn=accept))
    assert (ref == got).all(), f"{(ref != got).sum()} mismatches"
    assert (ref == 0).any() and (ref == 1).any()


def test_session_renders_same_image_with_and_without_grid(tmp_path):
    """BoxTest frame with enable_sunspace_shadows on vs off is identical
    (the grid changes which engine answers sun rays, never the answer)."""
    import jax

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    imgs = {}
    for flag in (True, False):
        s = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=2,
                        enable_sunspace_shadows=flag)
        sess = RenderSession(settings=s, width=64, height=48)
        assert (sess.sun_grid is not None) == flag
        sess.render_to_completion()
        imgs[flag] = np.asarray(sess.accum)
    np.testing.assert_array_equal(imgs[True], imgs[False])
