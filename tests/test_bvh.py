"""LBVH build + traversal vs brute-force oracle (SURVEY.md §4(a))."""

import numpy as np
import jax
import jax.numpy as jnp

from dxrpathtracer_tpu.accel.brute import brute_force_closest_hit
from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit


def _soup(rng, t, spread=1.0, size=0.3):
    v0 = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(rng, n, spread=3.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d.astype(np.float32)


def test_bvh_structure():
    rng = np.random.default_rng(3)
    v0, v1, v2 = _soup(rng, 300)
    bvh = build_bvh(v0, v1, v2)
    n = bvh.num_nodes
    skip = np.asarray(bvh.skip)
    left = np.asarray(bvh.left)
    cnt = np.asarray(bvh.tri_count)
    start = np.asarray(bvh.tri_start)
    # Every triangle appears in exactly one leaf
    covered = np.zeros(300, bool)
    for i in range(n):
        if cnt[i] > 0:
            covered[start[i]:start[i] + cnt[i]] = True
    assert covered.all()
    assert set(np.asarray(bvh.tri_id).tolist()) == set(range(300))
    # Skip-link walk visits every node exactly once
    node, steps = 0, 0
    visited = np.zeros(n, bool)
    while node < n and steps <= n:
        visited[node] = True
        node = left[node] if cnt[node] == 0 else skip[node]
        steps += 1
    assert visited.all() and steps == n
    # Parent AABBs contain children
    lo = np.asarray(bvh.bounds_lo)
    hi = np.asarray(bvh.bounds_hi)
    for i in range(n):
        if cnt[i] == 0:
            for c in (left[i], left[i] + 1):
                assert (lo[i] <= lo[c] + 1e-6).all()
                assert (hi[i] >= hi[c] - 1e-6).all()


def test_closest_hit_matches_brute_force():
    rng = np.random.default_rng(0)
    v0, v1, v2 = _soup(rng, 500)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 500)

    fn = jax.jit(lambda b, oo, dd: closest_hit(b, oo, dd, 0.0, 1e30))
    rec = fn(bvh, jnp.asarray(o), jnp.asarray(d))
    bt, btri, bu, bv = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)

    t = np.asarray(rec.t)
    tri = np.asarray(rec.tri_id)
    assert ((tri >= 0) == (btri >= 0)).all()
    m = tri >= 0
    assert m.mean() > 0.5  # rays aimed at the soup actually hit
    assert np.allclose(t[m], bt[m], rtol=1e-4, atol=1e-5)
    # Same triangle except exact-tie cases
    assert (tri[m] == btri[m]).mean() > 0.999
    assert np.allclose(np.asarray(rec.u)[m], bu[m], rtol=1e-3, atol=1e-4)


def test_any_hit_matches_brute_force():
    rng = np.random.default_rng(1)
    v0, v1, v2 = _soup(rng, 300)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 400)
    fn = jax.jit(lambda b, oo, dd: any_hit(b, oo, dd, 0.0, 1e30))
    vis = np.asarray(fn(bvh, jnp.asarray(o), jnp.asarray(d)))
    bt, btri, _, _ = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)
    assert ((vis == 0.0) == (btri >= 0)).all()


def test_t_range_respected():
    rng = np.random.default_rng(2)
    v0, v1, v2 = _soup(rng, 200)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 200)
    bt, btri, _, _ = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)
    m = btri >= 0
    # Set t_max just below each brute-force hit: traversal must miss them all
    t_max = np.where(m, bt * 0.99, 1e30).astype(np.float32)
    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), 0.0, jnp.asarray(t_max))
    assert (np.asarray(rec.tri_id)[m] != btri[m]).all() or (
        np.asarray(rec.t)[m] < bt[m] * 0.99).all()
    # t_min beyond the hit skips it
    t_min = np.where(m, bt * 1.01, 0.0).astype(np.float32)
    rec2 = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min), 1e30)
    t2 = np.asarray(rec2.t)
    assert (t2[m] >= bt[m] * 1.005).all()


def test_alpha_test_accept_fn():
    """accept_fn=False for even triangles must make them invisible."""
    rng = np.random.default_rng(4)
    v0, v1, v2 = _soup(rng, 100)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 300)

    def accept(tid, u, v):
        return (tid % 2) == 1

    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), 0.0, 1e30,
                      accept_fn=accept)
    tri = np.asarray(rec.tri_id)
    assert ((tri < 0) | (tri % 2 == 1)).all()
    # Oracle: brute force over odd triangles only
    odd = np.arange(100) % 2 == 1
    bt, btri_odd, _, _ = brute_force_closest_hit(
        v0[odd], v1[odd], v2[odd], o, d, 0.0, 1e30)
    mapped = np.where(btri_odd >= 0, btri_odd * 2 + 1, -1)
    assert (tri == mapped).mean() > 0.999


def test_boxtest_scene_hits():
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene
    from dxrpathtracer_tpu.app.settings import Scenes
    scene, preset = load_scene(Scenes.BoxTest)
    assert scene.num_triangles == 24  # two boxes x 12 tris (Model.cpp:761-780)
    bvh = build_bvh_for_scene(scene)
    # Ray straight down from above the floating box: hits its top face at y=2.5
    o = jnp.asarray([[0.0, 10.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    rec = closest_hit(bvh, o, d, 0.0, 1e30)
    assert int(rec.tri_id[0]) >= 0
    assert abs(float(rec.t[0]) - 7.5) < 1e-4  # 10 - 2.5
