"""Vectorized stackless BVH traversal — the TPU replacement for DXR TraceRay.

The reference's per-ray MIMD hardware traversal (RayTrace.hlsl:138,258,407
`TraceRay`, max recursion 8) becomes a wavefront: every ray in a flat batch steps
through the threaded BVH in lockstep inside one `lax.while_loop`. Control flow is
uniform — divergence is data (masks), which is exactly what the VPU wants.

TPU performance structure (kernel-launch overhead dominates on this platform,
so the loop body is organized to minimize kernel count per node visited):
  - one packed (N, 8) gather per node step fetches AABB + both links
    (see accel/lbvh.py layout);
  - `UNROLL` node steps run per while-loop iteration, amortizing the loop's
    fixed overhead;
  - leaf intersection is *deferred*: a lane that enters a leaf parks its leaf
    index and stops stepping; once per iteration all parked lanes intersect
    their whole leaf with ONE (N, leaf_size*12) gather and a statically
    unrolled Möller–Trumbore over slices (no per-triangle gathers).

Two entry points mirror the reference's two hit groups:
  closest_hit — radiance rays (ClosestHitShader path)
  any_hit     — shadow/visibility rays with RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH
                semantics (RayTrace.hlsl:249,296,416)

Alpha-testing (AnyHitShader's `IgnoreHit` when opacity < 0.35,
RayTrace.hlsl:485-507) plugs in via `accept_fn(tri_id, u, v) -> bool`; passing
None is RAY_FLAG_FORCE_OPAQUE.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .lbvh import FlatBVH, TRI_STRIDE

UNROLL = 4  # node steps per while-loop iteration


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


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _intersect_pending_leaf(bvh: FlatBVH, o, d, t_min, state, accept_fn, first_hit):
    """Intersect every parked lane's whole leaf; clears `pending`."""
    node, pending, best_t, best_tri, best_u, best_v = state
    has_leaf = pending >= 0
    leaf = _gather(bvh.leaves, jnp.maximum(pending, 0))  # (N, leaf_size*12)

    for k in range(bvh.leaf_size):
        base = k * TRI_STRIDE
        v0 = leaf[:, base:base + 3]
        e1 = leaf[:, base + 3:base + 6]
        e2 = leaf[:, base + 6:base + 9]
        tid = _bitcast_i32(leaf[:, base + 9])
        # Möller–Trumbore, no backface culling (the reference disables culling:
        # Timing.txt:3 "No back-face cull" is the shipped configuration).
        pvec = jnp.cross(d, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tvec = o - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        ok = (has_leaf & (tid >= 0) & (jnp.abs(det) > 1e-12)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t < best_t))
        if accept_fn is not None:
            ok = ok & accept_fn(tid, u, v)
        best_tri = jnp.where(ok, tid, best_tri)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_t = jnp.where(ok, t, best_t)

    pending = jnp.full_like(pending, -1)
    if first_hit:
        # ACCEPT_FIRST_HIT_AND_END_SEARCH: stop the lane once anything hit.
        node = jnp.where(best_tri >= 0, bvh.end_sentinel, node)
    return (node, pending, best_t, best_tri, best_u, best_v)


def _traverse(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active, accept_fn,
              first_hit: bool):
    n_end = bvh.end_sentinel
    inv_d = _safe_inv(ray_d)
    n = ray_o.shape[0]

    state = (
        jnp.where(active, 0, n_end).astype(jnp.int32),  # node cursor
        jnp.full((n,), -1, jnp.int32),                  # parked leaf index
        t_max.astype(jnp.float32),                      # best t so far
        jnp.full((n,), -1, jnp.int32),                  # best triangle
        jnp.zeros((n,), jnp.float32),                   # u
        jnp.zeros((n,), jnp.float32),                   # v
        jnp.zeros((), jnp.int32),                       # iteration counter
    )

    # Hard safety bound: a ray visits each node at most once, and each leaf
    # visit stalls one loop iteration (stepping pauses while a leaf is parked),
    # so num_nodes + num_leaves iterations always suffice. The cap only exists
    # to turn a link-corruption bug into a wrong image instead of a hung TPU.
    max_iters = n_end + bvh.num_leaves + 2

    def cond(s):
        return jnp.any((s[0] < n_end) | (s[1] >= 0)) & (s[6] < max_iters)

    def body(s):
        node, pending, best_t, best_tri, best_u, best_v, it = s

        for _ in range(UNROLL):
            can = (pending < 0) & (node < n_end)
            rec = _gather(bvh.nodes, jnp.where(can, node, 0))  # (N, 8)
            t0 = (rec[:, 0:3] - ray_o) * inv_d
            t1 = (rec[:, 3:6] - ray_o) * inv_d
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            aabb_hit = can & (jnp.maximum(tn, t_min) <= jnp.minimum(tf, best_t))

            next_if_hit = _bitcast_i32(rec[:, 6])
            skip = _bitcast_i32(rec[:, 7])
            is_leaf = next_if_hit < 0

            take_leaf = aabb_hit & is_leaf
            pending = jnp.where(take_leaf, ~next_if_hit, pending)
            nxt = jnp.where(aabb_hit & ~is_leaf, next_if_hit, skip)
            node = jnp.where(can, nxt, node)

        out = _intersect_pending_leaf(
            bvh, ray_o, ray_d, t_min,
            (node, pending, best_t, best_tri, best_u, best_v),
            accept_fn, first_hit)
        return out + (it + 1,)

    _, _, t, tri, u, v, _ = jax.lax.while_loop(cond, body, state)
    return HitRecord(t=t, tri_id=tri, u=u, v=v)


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
