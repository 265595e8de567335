"""Dense-proxy pre-pass (accel/proxy.py) equivalence pins.

The proxy set is a SUBSET of the scene, so:
  - screened any-hit visibility must equal the plain walk EXACTLY (a
    proxy-blocked verdict is a real occluder; unresolved lanes run the
    full walk unchanged);
  - proxy-seeded closest hit must equal the plain walk up to equal-t tie
    order (the proxy triangle wins bit-equal ties; the unseeded walk takes
    first-found) — same divergence class as the software raster, pinned
    the same way.
Cites: RayTrace.hlsl:407-438 (the terminal visibility ray this
accelerates), AppSettings.cs:146 (MaxAnyHitPathLength=1 — depth>=2 rays
are FORCE_OPAQUE, so an opaque-only proxy is semantics-preserving).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.proxy import (build_dense_proxy, proxy_blocked,
                                           proxy_closest, screened_any,
                                           seeded_closest)
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit

pytestmark = pytest.mark.quick


def _soup(n_tris=300, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-4, 4, (n_tris, 3)).astype(np.float32)
    # mix of large and small triangles so the proxy set is meaningful
    scale = np.where(rng.uniform(size=n_tris) < 0.2, 3.0, 0.3)[:, None]
    e1 = (rng.normal(size=(n_tris, 3)) * scale).astype(np.float32)
    e2 = (rng.normal(size=(n_tris, 3)) * scale).astype(np.float32)
    positions = np.concatenate([v0, v0 + e1, v0 + e2], axis=0)
    tri_idx = np.stack([np.arange(n_tris), np.arange(n_tris) + n_tris,
                        np.arange(n_tris) + 2 * n_tris], axis=1).astype(np.int32)
    return positions, tri_idx


def _rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _build(positions, tri_idx):
    return build_bvh(positions[tri_idx[:, 0]], positions[tri_idx[:, 1]],
                     positions[tri_idx[:, 2]])


def test_screened_any_equals_plain():
    positions, tri_idx = _soup()
    bvh = _build(positions, tri_idx)
    proxy = build_dense_proxy(positions, tri_idx, k=64)
    o, d = _rays()
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 30.0, jnp.float32)
    act = jnp.asarray(np.random.default_rng(2).uniform(size=n) < 0.9)

    plain = np.asarray(any_hit(bvh, o, d, tmin, tmax, act))
    screened = np.asarray(screened_any(
        lambda *a: any_hit(bvh, *a), proxy, o, d, tmin, tmax, act))
    assert (plain == screened).all()
    # the pre-pass must actually resolve something on this soup
    blocked = np.asarray(proxy_blocked(proxy, o, d, tmin, tmax, act))
    assert blocked.sum() > 0


def test_seeded_closest_equals_plain():
    positions, tri_idx = _soup(seed=3)
    bvh = _build(positions, tri_idx)
    proxy = build_dense_proxy(positions, tri_idx, k=64)
    o, d = _rays(seed=4)
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 30.0, jnp.float32)
    act = jnp.ones((n,), bool)

    plain = closest_hit(bvh, o, d, tmin, tmax, act)
    seeded = seeded_closest(
        lambda o_, d_, tn_, tx_, a_: closest_hit(bvh, o_, d_, tn_, tx_, a_),
        proxy, o, d, tmin, tmax, act)
    tp, ts = np.asarray(plain.t), np.asarray(seeded.t)
    # t agreement is exact: both ends evaluate the same MT expression on the
    # same winning triangle (random soup => no bit-equal ties in practice)
    assert (tp == ts).all(), np.abs(tp - ts).max()
    assert (np.asarray(plain.tri_id) == np.asarray(seeded.tri_id)).all()
    assert (np.asarray(plain.u) == np.asarray(seeded.u)).all()
    # the seed must engage (some lanes carry a finite proxy bound)
    _pt, ptri, _u, _v = proxy_closest(proxy, o, d, tmin, tmax, act)
    assert (np.asarray(ptri) >= 0).sum() > 0


def test_proxy_excludes_alpha_triangles():
    positions, tri_idx = _soup(seed=5)
    n_tris = tri_idx.shape[0]
    alpha = np.zeros(n_tris, bool)
    alpha[: n_tris // 2] = True
    proxy = build_dense_proxy(positions, tri_idx, tri_alpha=alpha, k=64)
    assert proxy is not None
    assert not alpha[np.asarray(proxy.tri_id)[0]].any()


def test_proxy_none_on_tiny_scenes():
    positions, tri_idx = _soup(n_tris=4, seed=6)
    assert build_dense_proxy(positions, tri_idx, k=64) is None


def test_inactive_lanes_untouched():
    positions, tri_idx = _soup(seed=7)
    proxy = build_dense_proxy(positions, tri_idx, k=32)
    o, d = _rays(n=64, seed=8)
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 30.0, jnp.float32)
    act = jnp.zeros((n,), bool)
    blocked = np.asarray(proxy_blocked(proxy, o, d, tmin, tmax, act))
    assert not blocked.any()
    t, tri, _u, _v = proxy_closest(proxy, o, d, tmin, tmax, act)
    assert (np.asarray(tri) == -1).all()
    assert (np.asarray(t) == np.asarray(tmax)).all()
