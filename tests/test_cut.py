"""AABB-cut clear screen (accel/proxy.py AABBCut) conservativeness pins.

The cut partitions the triangle set into morton-contiguous chunks and boxes
each one, so a lane whose segment misses EVERY covering box provably hits
nothing. The screen is used purely as an active-mask reduction (cleared
lanes keep the miss record inactive lanes already produce), so the only
property that matters is conservativeness: cut_clear == True must imply the
exact walk misses. Verified here against closest_hit on random soups and
end-to-end on a real session frame.

Cites: RayTrace.hlsl:407-438 (terminal visibility ray — hardware MIMD
traversal exits missing rays in a handful of node tests; this recovers the
same early-exit for lockstep lanes), SURVEY §2d (DispatchRays per-pixel).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.proxy import build_aabb_cut, cut_clear
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit

pytestmark = pytest.mark.quick


def _soup(n_tris=300, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
    scale = np.where(rng.uniform(size=n_tris) < 0.2, 3.0, 0.3)[:, None]
    e1 = (rng.normal(size=(n_tris, 3)) * scale).astype(np.float32)
    e2 = (rng.normal(size=(n_tris, 3)) * scale).astype(np.float32)
    positions = np.concatenate([v0, v0 + e1, v0 + e2], axis=0)
    tri_idx = np.stack([np.arange(n_tris), np.arange(n_tris) + n_tris,
                        np.arange(n_tris) + 2 * n_tris],
                       axis=1).astype(np.int32)
    return positions, tri_idx


def _rays(n=2048, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clear_implies_miss():
    """Every cut_clear lane must genuinely miss the whole scene — checked
    against the exact walk with the cut NOT applied."""
    positions, tri_idx = _soup()
    bvh = build_bvh(positions[tri_idx[:, 0]], positions[tri_idx[:, 1]],
                    positions[tri_idx[:, 2]])
    cut = build_aabb_cut(positions, tri_idx, c=32)
    assert cut is not None and cut.c == 32
    for seed in (1, 2, 3):
        o, d = _rays(seed=seed)
        n = o.shape[0]
        t_min = jnp.zeros((n,))
        t_max = jnp.full((n,), 50.0)
        act = jnp.ones((n,), bool)
        clear = np.asarray(cut_clear(cut, o, d, t_min, t_max, act))
        assert clear.any(), "screen resolved nothing on a wide-spread soup"
        rec = closest_hit(bvh, o, d, t_min, t_max, act)
        hit = np.asarray(rec.tri_id) >= 0
        assert not (clear & hit).any(), "clear verdict on a hitting lane"


def test_masked_walk_equals_plain():
    """Applying the screen as an active-mask reduction leaves every result
    bit-identical (cleared lanes = miss record either way)."""
    positions, tri_idx = _soup(seed=4)
    bvh = build_bvh(positions[tri_idx[:, 0]], positions[tri_idx[:, 1]],
                    positions[tri_idx[:, 2]])
    cut = build_aabb_cut(positions, tri_idx, c=16)
    o, d = _rays(seed=5)
    n = o.shape[0]
    t_min = jnp.zeros((n,))
    t_max = jnp.full((n,), 50.0)
    act = jnp.ones((n,), bool)
    clear = cut_clear(cut, o, d, t_min, t_max, act)
    rec_m = closest_hit(bvh, o, d, t_min, t_max, act & ~clear)
    rec_p = closest_hit(bvh, o, d, t_min, t_max, act)
    np.testing.assert_array_equal(np.asarray(rec_m.tri_id),
                                  np.asarray(rec_p.tri_id))
    np.testing.assert_array_equal(np.asarray(rec_m.t), np.asarray(rec_p.t))
    vis_m = any_hit(bvh, o, d, t_min, t_max, act & ~clear)
    vis_p = any_hit(bvh, o, d, t_min, t_max, act)
    np.testing.assert_array_equal(np.asarray(vis_m), np.asarray(vis_p))


def test_segment_bounds_respected():
    """A short segment that stops before the geometry must be clear; the
    same ray extended must not be."""
    positions, tri_idx = _soup(seed=6)
    cut = build_aabb_cut(positions, tri_idx, c=16)
    # rays aimed at the soup from far away
    o = jnp.asarray(np.tile(np.array([[30.0, 0.0, 0.0]], np.float32),
                            (8, 1)))
    d = jnp.asarray(np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32),
                            (8, 1)))
    act = jnp.ones((8,), bool)
    short = np.asarray(cut_clear(cut, o, d, jnp.zeros((8,)),
                                 jnp.full((8,), 5.0), act))
    long = np.asarray(cut_clear(cut, o, d, jnp.zeros((8,)),
                                jnp.full((8,), 100.0), act))
    assert short.all(), "segment ending 25 units short of the soup is clear"
    assert not long.any(), "segment through the soup must stay ambiguous"


def test_cut_none_on_tiny_scenes():
    positions, tri_idx = _soup(n_tris=4)
    assert build_aabb_cut(positions, tri_idx) is None


def test_session_image_invariant():
    """End-to-end: a BoxTest frame with the screen on equals the frame with
    DXRPT_NO_CUT=1 (the A/B knob) bit-for-bit."""
    import os

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    s = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=1)
    sess = RenderSession(settings=s, width=32, height=32)
    assert sess.cut is not None
    sess.render_frame()
    a = np.asarray(sess.accum)
    os.environ["DXRPT_NO_CUT"] = "1"
    try:
        sess2 = RenderSession(settings=s, width=32, height=32)
        sess2.render_frame()
        b = np.asarray(sess2.accum)
    finally:
        del os.environ["DXRPT_NO_CUT"]
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
