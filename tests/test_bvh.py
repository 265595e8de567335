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
    t_count = 300
    v0, v1, v2 = _soup(rng, t_count)
    bvh = build_bvh(v0, v1, v2)
    n = bvh.num_nodes
    nodes = np.asarray(bvh.nodes)
    lo, hi = nodes[:, 0:3], nodes[:, 3:6]
    def as_i32(col):
        return np.ascontiguousarray(col).view(np.int32)

    next_if_hit = as_i32(nodes[:, 6])
    skip = as_i32(nodes[:, 7])
    leaves = np.asarray(bvh.leaves).reshape(bvh.num_leaves, bvh.leaf_size, -1)
    tri_ids = as_i32(leaves[:, :, 9])

    # Every triangle appears in exactly one packed leaf slot
    valid = tri_ids[tri_ids >= 0]
    assert sorted(valid.tolist()) == list(range(t_count))
    # Padded slots are degenerate (zero edges)
    pad = tri_ids < 0
    assert (leaves[pad][:, 3:9] == 0).all()

    # Skip-link walk visits every node exactly once
    node, steps = 0, 0
    visited = np.zeros(n, bool)
    while node < n and steps <= n:
        visited[node] = True
        node = next_if_hit[node] if next_if_hit[node] >= 0 else skip[node]
        steps += 1
    assert visited.all() and steps == n

    # Parent AABBs contain children; leaf AABBs contain their triangles
    for i in range(n):
        c = next_if_hit[i]
        if c >= 0:
            for ch in (c, c + 1):
                assert (lo[i] <= lo[ch] + 1e-6).all()
                assert (hi[i] >= hi[ch] - 1e-6).all()
        else:
            leaf = leaves[~c]
            for k in range(bvh.leaf_size):
                if tri_ids[~c, k] >= 0:
                    p0 = leaf[k, 0:3]
                    p1 = p0 + leaf[k, 3:6]
                    p2 = p0 + leaf[k, 6:9]
                    for p in (p0, p1, p2):
                        assert (p >= lo[i] - 1e-5).all()
                        assert (p <= hi[i] + 1e-5).all()


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
