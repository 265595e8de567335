#!/usr/bin/env python3
"""Simulate gathered rows/ray for candidate wide-record BVH configs.

tools/microbench_gather_width.py measured the dependent-chain gather rate
nearly FLAT in row width on the v5e (512 B -> 1 KB costs ~1.18x per row,
-> 2 KB ~1.49x), so fatter records that cut rows-per-ray are a direct win.
This tool answers "which (WIDTH, LEAF_SIZE, RECORD) minimizes expected
traversal time" by counting exact per-ray row visits (internal + leaf +
pop revisits — each is one gather in the lockstep engine) over the real
bench scene with the real SAH topology (_sah_topology, width param).

Ray populations: bench-camera primaries (packet engine feeds excluded —
the per-ray engine serves bounce rays) and cosine-hemisphere bounce rays
from primary hit points, matching trace_paths' per-ray workload.

Usage: python tools/sim_record_width.py [NUM_RAYS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measured ms/iter at n=262144 (microbench_gather_width, v5e 2026-08-18),
# keyed by record f32 slots
WIDTH_COST = {128: 5.503, 192: 6.517, 256: 6.508, 384: 7.301, 512: 8.212}

CONFIGS = [
    # (width, leaf_size, record_slots) — record_slots reflects the ROW COST:
    # bf16 internal AABBs let W=16 (192B+64B codes) and W=32 (384B+128B)
    # stay inside the 512B row, so leaf size sets the row width.
    (8, 12, 128),    # current production (f32 AABBs)
    (16, 12, 128),   # bf16 internal, f32 12-tri leaves — same 512B row
    (32, 12, 128),   # bf16 internal at the 512B ceiling
    (16, 24, 256),   # 1KB rows (24-tri leaves)
    (32, 24, 256),
    # Round-4 candidates (VERDICT #1a): FAT f32 leaves in 1 KB rows — exact,
    # no bf16-leaf retest machinery. Internal stays bf16 W32 (512 B used) or
    # widens to bf16 W64 (768 B AABBs + 256 B codes = 1 KB exactly).
    (32, 25, 256),   # 25 tris * 10 slots = 250 <= 256
    (64, 25, 256),
    (32, 18, 192),   # 768 B rows: 18-tri leaves, W32 internals
]


def build_topology(v0, v1, v2, leaf_size, width):
    from dxrpathtracer_tpu.accel.lbvh import _sah_topology
    return _sah_topology(v0, v1, v2, leaf_size, width=width)


class SimTree:
    def __init__(self, v0, v1, v2, topo, width):
        order, is_leaf, rng, child, box, depth = topo
        self.width = width
        self.is_leaf = np.asarray(is_leaf)
        n = len(is_leaf)
        self.depth = depth
        W = width
        self.child_lo = np.full((n, W, 3), 3e38, np.float32)
        self.child_hi = np.full((n, W, 3), -3e38, np.float32)
        self.child_id = np.full((n, W), -1, np.int64)
        for rid in range(n):
            if self.is_leaf[rid]:
                continue
            for k, ch in enumerate(child[rid]):
                if ch < 0:
                    continue
                self.child_lo[rid, k] = box[ch][0]
                self.child_hi[rid, k] = box[ch][1]
                self.child_id[rid, k] = ch
        # leaf triangle data per row
        self.leaf_v0 = {}
        self.leaf_e1 = {}
        self.leaf_e2 = {}
        for rid in range(n):
            if not self.is_leaf[rid]:
                continue
            lo, hi = rng[rid]
            sel = order[lo:hi]
            self.leaf_v0[rid] = v0[sel]
            self.leaf_e1[rid] = v1[sel] - v0[sel]
            self.leaf_e2[rid] = v2[sel] - v0[sel]
        self.root = 0

    def trace(self, o, d, t_max=3e38, count_only=True):
        """Ordered short-stack traversal of one ray; returns
        (internal_visits, leaf_visits, t_best). Pop revisits count as
        internal visits (they re-gather the parent row)."""
        inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
        t_best = t_max
        iv = lv = 0
        W = self.width
        full_mask = (1 << W) - 1
        stack = []
        cur, mask = self.root, full_mask
        while True:
            if self.is_leaf[cur]:
                lv += 1
                tv0 = self.leaf_v0[cur]
                e1 = self.leaf_e1[cur]
                e2 = self.leaf_e2[cur]
                p = np.cross(d[None, :], e2)
                det = np.einsum('ij,ij->i', e1, p)
                okd = np.abs(det) > 1e-12
                invd = np.where(okd, 1.0 / np.where(det == 0, 1.0, det), 0.0)
                tvec = o[None, :] - tv0
                u = np.einsum('ij,ij->i', tvec, p) * invd
                q = np.cross(tvec, e1)
                v = np.dot(q, d) * invd
                t = np.einsum('ij,ij->i', e2, q) * invd
                ok = okd & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 1e-4) & (t < t_best)
                if ok.any():
                    t_best = float(t[ok].min())
            else:
                iv += 1
                lo = self.child_lo[cur]
                hi = self.child_hi[cur]
                t0 = (lo - o[None, :]) * inv[None, :]
                t1 = (hi - o[None, :]) * inv[None, :]
                tn = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-4)
                tf = np.minimum(np.maximum(t0, t1).min(axis=1), t_best)
                valid = (lo[:, 0] <= hi[:, 0]) & (tn <= tf)
                # python-int shifts: W=64 masks overflow numpy int64
                gate = np.array([(mask >> j) & 1 for j in range(W)],
                                dtype=bool)
                hitm = valid & gate
                if hitm.any():
                    keys = np.where(hitm, tn, 3e38)
                    k = int(np.argmin(keys))
                    rest = 0
                    for j in np.nonzero(hitm)[0]:
                        if j != k:
                            rest |= 1 << int(j)
                    if rest:
                        stack.append((cur, rest))
                    cur, mask = int(self.child_id[cur, k]), full_mask
                    continue
            # pop
            if not stack:
                break
            cur, mask = stack.pop()
        return iv, lv, t_best


def main():
    num_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    # host-only tool: never bind the tunneled TPU (env alone is ignored on
    # this host — PERF_NOTES.md "JAX_PLATFORMS env is DEAD")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import PRESETS
    scene, preset = load_scene(Scenes.Sponza)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    print(f"tris={len(v0)}", flush=True)

    # bench camera primaries
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    cam = FirstPersonCamera(position=np.array(preset.camera_position, np.float32),
                            x_rot=preset.camera_rotation[0],
                            y_rot=preset.camera_rotation[1])
    wpx, hpx = 160, 90
    cam.aspect = wpx / hpx
    ivp = np.asarray(cam.inv_view_projection(), np.float32)
    rng = np.random.default_rng(0)
    js = rng.integers(0, hpx, num_rays)
    is_ = rng.integers(0, wpx, num_rays)
    ndc = np.stack([(is_ + 0.5) / wpx * 2 - 1, 1 - (js + 0.5) / hpx * 2,
                    np.zeros(num_rays), np.ones(num_rays)], axis=1).astype(np.float64)
    world = ndc @ ivp.astype(np.float64)
    world = world[:, :3] / world[:, 3:4]
    cam_o = np.asarray(cam.position, np.float64)
    prim_d = world - cam_o
    prim_d /= np.linalg.norm(prim_d, axis=1, keepdims=True)
    prim_o = np.broadcast_to(cam_o, prim_d.shape)

    # topology builds are shared per leaf_size
    topo_cache = {}
    results = {}
    for (W, L, REC) in CONFIGS:
        t0 = time.time()
        key = L
        if key not in topo_cache:
            # binary SAH is width-independent; only collapse differs, and
            # _sah_topology does both — cache on (L, W) instead
            pass
        topo = build_topology(v0, v1, v2, L, W)
        tree = SimTree(v0, v1, v2, topo, W)
        n_leaves = int(tree.is_leaf.sum())
        n_rows = len(tree.is_leaf)
        print(f"W={W} L={L} rec={REC*4}B: rows={n_rows} leaves={n_leaves} "
              f"depth={tree.depth} build {time.time()-t0:.0f}s", flush=True)

        # primaries: trace + record hits for bounce generation
        t0 = time.time()
        stats_p = np.zeros((num_rays, 2), np.int64)
        tbest = np.full(num_rays, 3e38)
        for i in range(num_rays):
            ivv, lvv, tb = tree.trace(prim_o[i], prim_d[i])
            stats_p[i] = (ivv, lvv)
            tbest[i] = tb
        # bounce rays: cosine hemisphere at hit points (geometric normal of
        # an arbitrary up vector — direction scatter is what matters)
        hitm = tbest < 3e37
        ho = prim_o[hitm] + prim_d[hitm] * (tbest[hitm, None] * 0.999)
        nb = hitm.sum()
        zv = rng.random(nb)
        phi = rng.random(nb) * 2 * np.pi
        r = np.sqrt(zv)
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - zv)], 1)
        # random orthonormal frame per ray
        up = rng.normal(size=(nb, 3))
        up /= np.linalg.norm(up, axis=1, keepdims=True)
        bd = local[:, 2:3] * up + 0.3 * rng.normal(size=(nb, 3))
        bd /= np.linalg.norm(bd, axis=1, keepdims=True)
        stats_b = np.zeros((nb, 2), np.int64)
        for i in range(nb):
            ivv, lvv, _ = tree.trace(ho[i], bd[i])
            stats_b[i] = (ivv, lvv)
        dt = time.time() - t0

        cost = WIDTH_COST[REC] / WIDTH_COST[128]
        for label, st in (("primary", stats_p), ("bounce", stats_b)):
            rows = st.sum(axis=1)
            mean = rows.mean()
            print(f"  {label:8s} rows/ray mean {mean:6.1f} "
                  f"(int {st[:,0].mean():5.1f} leaf {st[:,1].mean():5.1f}) "
                  f"p50 {np.percentile(rows,50):5.0f} p99 {np.percentile(rows,99):5.0f} "
                  f"max {rows.max():4d}  est-rel-time {mean*cost:7.1f}", flush=True)
        results[(W, L, REC)] = (stats_p, stats_b)
        print(f"  traced in {dt:.0f}s", flush=True)


if __name__ == "__main__":
    main()
