"""Brute-force ray/triangle-soup intersection — the correctness oracle.

The reference has no software fallback to validate its hardware BVH against; we
add one (SURVEY.md §4 test plan): O(N_rays x N_tris) Möller–Trumbore, evaluated
in triangle blocks so memory stays bounded. Used by tests to verify LBVH
traversal produces identical hits on random triangle soups and real scenes.
"""

import jax.numpy as jnp
import numpy as np


def brute_force_closest_hit(v0, v1, v2, ray_o, ray_d, t_min, t_max, block=512):
    """Host/numpy closest hit. Returns (t, tri_id, u, v) arrays (N,)."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    o = np.asarray(ray_o, np.float32)
    d = np.asarray(ray_d, np.float32)
    n = o.shape[0]
    t_min = np.broadcast_to(np.asarray(t_min, np.float32), (n,))
    best_t = np.broadcast_to(np.asarray(t_max, np.float32), (n,)).copy()
    best_tri = np.full(n, -1, np.int32)
    best_u = np.zeros(n, np.float32)
    best_v = np.zeros(n, np.float32)

    for s in range(0, v0.shape[0], block):
        bv0 = v0[s:s + block][None]   # (1, B, 3)
        be1 = e1[s:s + block][None]
        be2 = e2[s:s + block][None]
        do = d[:, None]               # (N, 1, 3)
        oo = o[:, None]
        pvec = np.cross(do, be2)
        det = np.sum(be1 * pvec, -1)
        safe = np.abs(det) > 1e-12
        inv_det = np.where(safe, 1.0 / np.where(det == 0, 1.0, det), 0.0)
        tvec = oo - bv0
        u = np.sum(tvec * pvec, -1) * inv_det
        qvec = np.cross(tvec, be1)
        v = np.sum(do * qvec, -1) * inv_det
        t = np.sum(be2 * qvec, -1) * inv_det
        ok = safe & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= t_min[:, None]) & (t < best_t[:, None])
        t_masked = np.where(ok, t, np.inf)
        j = np.argmin(t_masked, axis=1)
        row = np.arange(n)
        better = t_masked[row, j] < best_t
        best_t = np.where(better, t_masked[row, j], best_t)
        best_tri = np.where(better, (s + j).astype(np.int32), best_tri)
        best_u = np.where(better, u[row, j], best_u)
        best_v = np.where(better, v[row, j], best_v)
    return best_t, best_tri, best_u, best_v
