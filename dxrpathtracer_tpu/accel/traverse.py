"""Vectorized stackless BVH traversal — the TPU replacement for DXR TraceRay.

The reference's per-ray MIMD hardware traversal (RayTrace.hlsl:138,258,407
`TraceRay`, max recursion 8) becomes a wavefront: every ray in a flat batch steps
through the threaded BVH in lockstep inside one `lax.while_loop`. Per step, each
lane gathers one node's AABB + skip links from HBM, slab-tests it, and either
descends (`left`) or follows the skip link; leaf lanes intersect a statically
unrolled block of `leaf_size` triangles (Möller–Trumbore). Control flow is
uniform — divergence is data (masks), which is exactly what the VPU wants.

Two entry points mirror the reference's two hit groups:
  closest_hit — radiance rays (ClosestHitShader path)
  any_hit     — shadow/visibility rays with RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH
                semantics (RayTrace.hlsl:249,296,416)

Alpha-testing (AnyHitShader's `IgnoreHit` when opacity < 0.35,
RayTrace.hlsl:485-507) plugs in via `accept_fn(tri_id, u, v) -> bool`; passing
None is RAY_FLAG_FORCE_OPAQUE.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .lbvh import FlatBVH

_BIG = 3.0e38


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class HitRecord:
    t: jax.Array        # (N,) f32 hit distance (t_max where missed)
    tri_id: jax.Array   # (N,) i32 original triangle index, -1 on miss
    u: jax.Array        # (N,) f32 barycentric u (of v1)
    v: jax.Array        # (N,) f32 barycentric v (of v2)

    @property
    def hit(self):
        return self.tri_id >= 0


def _safe_inv(d):
    """1/d with zero components nudged to ±eps (avoids 0*inf = NaN in slab tests)."""
    eps = 1e-12
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0.0, -eps, eps), d)


def _gather(arr, idx):
    return jnp.take(arr, idx, axis=0, mode="clip")


def _intersect_leaf(bvh: FlatBVH, o, d, t_min, cur_t, leaf_mask, tri_start, tri_count,
                    accept_fn):
    """Intersect up to leaf_size triangles; returns (t, local_tri, u, v) best."""
    best_t = cur_t
    best_tri = jnp.full(cur_t.shape, -1, jnp.int32)
    best_u = jnp.zeros_like(cur_t)
    best_v = jnp.zeros_like(cur_t)
    for k in range(bvh.leaf_size):
        lane = leaf_mask & (k < tri_count)
        ti = jnp.where(lane, tri_start + k, 0)
        v0 = _gather(bvh.tri_v0, ti)
        e1 = _gather(bvh.tri_e1, ti)
        e2 = _gather(bvh.tri_e2, ti)
        # Möller–Trumbore, no backface culling (the reference disables culling:
        # Timing.txt:3 "No back-face cull" is the shipped configuration).
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvec = o - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        ok = (lane & (jnp.abs(det) > 1e-12)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t < best_t))
        if accept_fn is not None:
            tid = _gather(bvh.tri_id, ti)
            ok = ok & accept_fn(tid, u, v)
        best_tri = jnp.where(ok, ti, best_tri)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_t = jnp.where(ok, t, best_t)
    return best_t, best_tri, best_u, best_v


def _traverse(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active, accept_fn,
              first_hit: bool):
    n_end = bvh.end_sentinel
    inv_d = _safe_inv(ray_d)
    n = ray_o.shape[0]

    node0 = jnp.where(active, 0, n_end).astype(jnp.int32)
    state = (
        node0,
        t_max.astype(jnp.float32),                 # best t so far
        jnp.full((n,), -1, jnp.int32),             # best local tri
        jnp.zeros((n,), jnp.float32),              # u
        jnp.zeros((n,), jnp.float32),              # v
    )

    def cond(s):
        return jnp.any(s[0] < n_end)

    def body(s):
        node, best_t, best_tri, best_u, best_v = s
        live = node < n_end
        nidx = jnp.where(live, node, 0)

        lo = _gather(bvh.bounds_lo, nidx)
        hi = _gather(bvh.bounds_hi, nidx)
        t0 = (lo - ray_o) * inv_d
        t1 = (hi - ray_o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        aabb_hit = live & (jnp.maximum(tn, t_min) <= jnp.minimum(tf, best_t))

        count = _gather(bvh.tri_count, nidx)
        is_leaf = count > 0
        start = _gather(bvh.tri_start, nidx)

        leaf_mask = aabb_hit & is_leaf
        lt, ltri, lu, lv = _intersect_leaf(
            bvh, ray_o, ray_d, t_min, best_t, leaf_mask, start, count, accept_fn)
        improved = ltri >= 0
        best_t = jnp.where(improved, lt, best_t)
        best_tri = jnp.where(improved, ltri, best_tri)
        best_u = jnp.where(improved, lu, best_u)
        best_v = jnp.where(improved, lv, best_v)

        descend = aabb_hit & ~is_leaf
        nxt = jnp.where(descend, _gather(bvh.left, nidx), _gather(bvh.skip, nidx))
        nxt = jnp.where(live, nxt, n_end)
        if first_hit:
            # ACCEPT_FIRST_HIT_AND_END_SEARCH: stop the lane once anything hit.
            nxt = jnp.where(best_tri >= 0, n_end, nxt)
        return (nxt.astype(jnp.int32), best_t, best_tri, best_u, best_v)

    _, t, tri, u, v = jax.lax.while_loop(cond, body, state)
    tri_global = jnp.where(tri >= 0, _gather(bvh.tri_id, jnp.maximum(tri, 0)), -1)
    return HitRecord(t=t, tri_id=tri_global.astype(jnp.int32), u=u, v=v)


def closest_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None, accept_fn=None):
    """Closest-hit traversal over a flat ray batch.

    ray_o/ray_d: (N, 3); t_min/t_max: scalar or (N,); active: (N,) bool or None.
    Returns HitRecord with t==t_max and tri_id==-1 for misses.
    """
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    return _traverse(bvh, ray_o, ray_d, t_min, t_max, active, accept_fn, first_hit=False)


def any_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None, accept_fn=None):
    """Any-hit (shadow) traversal; returns visibility (N,) f32 in {0, 1}.

    Mirrors ShadowPayload semantics (RayTrace.hlsl:73-76,533-541): 1 when
    unoccluded. Lanes terminate at the first accepted hit.
    """
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    rec = _traverse(bvh, ray_o, ray_d, t_min, t_max, active, accept_fn, first_hit=True)
    return jnp.where(rec.hit, 0.0, 1.0)
