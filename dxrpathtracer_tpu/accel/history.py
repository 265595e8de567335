"""History-seeded depth-1 traversal — temporal hit reuse with EXACT revalidation.

A progressive render re-traces nearly identical depth-1 rays every sample:
primaries move by subpixel jitter, and sun-NEE rays start from those hits
with a fixed direction. "Hash-Based Ray Path Prediction" (Liu et al.,
arXiv:1910.01304) skips BVH traversal by predicting the hit from ray
locality; hardware can only validate heuristically, but a wavefront
renderer can make the idea EXACT:

  - primary closest: intersect last sample's per-pixel hit TRIANGLE with
    this sample's ray. A hit at t_p is a true upper bound, so traversal
    runs with t_max=t_p — ordered descent + t-pruning then skips every
    subtree beyond the known surface — and a miss in [t_min, t_p) means
    the predicted hit IS the closest (merge it back). Same hit set as the
    unseeded traversal; only exact-t ties between DIFFERENT triangles can
    pick the other candidate (tie-checked in tests).
  - sun any-hit: retest last sample's per-pixel OCCLUDER triangle. If it
    still blocks, visibility is 0 with no traversal at all (any-hit is
    order-free, so this is exact, not approximate); only unresolved lanes
    traverse. Shadowed regions are temporally stable, so whole packets
    drop out.

History arrays are per-pixel i32 triangle ids in TILE lane order (opaque to
callers), reset on any restart (camera/settings change) exactly like the
accumulation image. Seeding is skipped for alpha-tested scenes (an occluder
retest would need the opacity evaluation; the punch-through path keeps its
own routing). The reference has no analog — RTX hardware traversal is
opaque (RayTrace.hlsl:138) — this is TPU-side work the fixed-function unit
does for free.
"""

import jax.numpy as jnp

from .traverse import HitRecord


def build_tri_table(positions, tri_idx):
    """(T, 9) f32 packed (v0, e1, e2) per triangle — ONE row gather
    revalidates a predicted triangle. Edges are precomputed in host f32
    exactly like the BVH leaf records (accel/lbvh.py), so the device MT
    below reproduces the traversal's t/u/v bits."""
    import numpy as np
    pos = np.asarray(positions, np.float32)
    tri = np.asarray(tri_idx)
    v0 = pos[tri[:, 0]]
    return np.concatenate([v0, pos[tri[:, 1]] - v0, pos[tri[:, 2]] - v0],
                          axis=1)


def _intersect_pred(tri_table, pred_tri, ray_o, ray_d, t_min, t_max):
    """Moller-Trumbore of each lane's predicted triangle (tri id or -1).
    Returns (valid, t, u, v). Expression order matches accel/traverse.py's
    leaf block so a revalidated hit reproduces the traversal's t bits."""
    f32 = jnp.float32
    del f32
    idx = jnp.maximum(pred_tri, 0)
    rows = jnp.take(tri_table, idx, axis=0)          # (N, 9) = v0, e1, e2
    v0x, v0y, v0z = rows[:, 0], rows[:, 1], rows[:, 2]
    e1x, e1y, e1z = rows[:, 3], rows[:, 4], rows[:, 5]
    e2x, e2y, e2z = rows[:, 6], rows[:, 7], rows[:, 8]
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((pred_tri >= 0) & (jnp.abs(det) > 1e-12)
          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t < t_max))
    return ok, t, u, v


def seeded_closest(base_fn, tri_table, pred_tri,
                   ray_o, ray_d, t_min, t_max, active):
    """Closest-hit with last sample's per-lane hit triangle as the t seed.

    base_fn(ray_o, ray_d, t_min, t_max, active) is any closest engine
    (packet or per-ray). Returns (HitRecord, new_pred_tri)."""
    ok, t_p, u_p, v_p = _intersect_pred(tri_table, pred_tri,
                                        ray_o, ray_d, t_min, t_max)
    ok = ok & active
    seeded_tmax = jnp.where(ok, t_p, t_max)
    rec = base_fn(ray_o, ray_d, t_min, seeded_tmax, active)
    # traversal misses (t == its t_max) where the prediction held -> the
    # predicted hit is the closest
    take_pred = ok & (rec.tri_id < 0)
    merged = HitRecord(
        t=jnp.where(take_pred, t_p, rec.t),
        tri_id=jnp.where(take_pred, pred_tri, rec.tri_id),
        u=jnp.where(take_pred, u_p, rec.u),
        v=jnp.where(take_pred, v_p, rec.v))
    return merged, jnp.where(active, merged.tri_id, -1)


def seeded_any(base_rec_fn, tri_table, pred_tri,
               ray_o, ray_d, t_min, t_max, active):
    """Sun visibility with last sample's per-lane occluder retested first.

    base_rec_fn(ray_o, ray_d, t_min, t_max, active) -> (visibility, occ_tri)
    is any *_any_hit_rec engine. Returns (visibility, new_pred_tri)."""
    ok, _, _, _ = _intersect_pred(tri_table, pred_tri,
                                  ray_o, ray_d, t_min, t_max)
    resolved = ok & active
    vis, occ = base_rec_fn(ray_o, ray_d, t_min, t_max, active & ~resolved)
    vis = jnp.where(resolved, 0.0, vis)
    new_pred = jnp.where(resolved, pred_tri,
                         jnp.where(active, occ, -1))
    return vis, new_pred
