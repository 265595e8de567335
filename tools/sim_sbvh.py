#!/usr/bin/env python3
"""Quantify SBVH (spatial-split) headroom in rows/ray BEFORE building it.

The traversal engines are row-fetch bound (PERF_NOTES.md), so tree quality
converts ~1:1 into frame time on the per-ray paths. Binned object-SAH is in
production; SBVH (Stich et al. 2009) additionally chops references that
straddle a spatial plane when the object split's children overlap — the
classic fix for architectural scenes with long/large triangles. This tool
builds a prototype spatial-split topology host-side and counts exact row
visits with tools/sim_record_width.py's SimTree on the REAL bench scene and
ray populations, vs the production object-SAH topology at the same
(width, leaf_size).

Bin bounds for candidate spatial splits use AABB-slab clipping (vectorized,
slightly loose); the COMMITTED straddler split clips the actual triangle
polygon (exact). Reference analog: the driver's opaque AS build
(DXRPathTracer.cpp:2331-2488) — quality knobs the reference cannot reach.

Usage: python tools/sim_sbvh.py [NUM_RAYS] [ALPHA]
  ALPHA: try a spatial split when overlap(BL,BR) half-area
         > ALPHA * root half-area (paper default 1e-5).
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

f32 = np.float32


def _clip_tri_slab(tv, axis, lo, hi):
    """AABB of triangle `tv` (3,3) clipped to lo <= x[axis] <= hi.
    Sutherland-Hodgman on the single axis (two planes), exact."""
    poly = [tv[0], tv[1], tv[2]]
    for plane, keep_ge in ((lo, True), (hi, False)):
        out = []
        m = len(poly)
        for i in range(m):
            a, b = poly[i], poly[(i + 1) % m]
            da = (a[axis] - plane) if keep_ge else (plane - a[axis])
            db = (b[axis] - plane) if keep_ge else (plane - b[axis])
            if da >= 0:
                out.append(a)
                if db < 0:
                    t = da / (da - db)
                    out.append(a + t * (b - a))
            elif db >= 0:
                t = da / (da - db)
                out.append(a + t * (b - a))
        poly = out
        if not poly:
            return None
    q = np.asarray(poly, np.float64)
    return q.min(axis=0).astype(f32), q.max(axis=0).astype(f32)


def _half_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def sbvh_topology(v0, v1, v2, leaf_size, width, bins=16, alpha=1e-5,
                  max_ref_factor=2.0):
    """Prototype spatial-split topology. Same return shape as _sah_topology
    but `order` holds TRIANGLE ids per reference (duplicates allowed)."""
    num_tris = v0.shape[0]
    tv = np.stack([v0, v1, v2], axis=1).astype(f32)  # (T, 3, 3)
    max_refs = int(num_tris * max_ref_factor) + 64
    ref_tri = np.empty(max_refs, np.int64)
    ref_lo = np.empty((max_refs, 3), f32)
    ref_hi = np.empty((max_refs, 3), f32)
    ref_tri[:num_tris] = np.arange(num_tris)
    ref_lo[:num_tris] = np.minimum(np.minimum(v0, v1), v2)
    ref_hi[:num_tris] = np.maximum(np.maximum(v0, v1), v2)
    n_refs = [num_tris]

    root_ha = _half_area(ref_lo[:num_tris].min(axis=0),
                         ref_hi[:num_tris].max(axis=0))

    b_leaf_tris, b_left, b_right = [], [], []
    boxes_lo, boxes_hi = [], []
    spatial_splits = [0]
    sys.setrecursionlimit(100000)

    def build(ids):
        lo_a = ref_lo[ids]
        hi_a = ref_hi[ids]
        node_lo = lo_a.min(axis=0)
        node_hi = hi_a.max(axis=0)
        idx = len(b_left)
        b_left.append(-1)
        b_right.append(-1)
        b_leaf_tris.append(None)
        boxes_lo.append(node_lo)
        boxes_hi.append(node_hi)
        count = ids.size
        if count <= leaf_size:
            b_leaf_tris[idx] = ref_tri[ids].copy()
            return idx

        cent = 0.5 * (lo_a + hi_a)
        clo_v = cent.min(axis=0)
        ext3 = cent.max(axis=0) - clo_v

        # --- object split (binned SAH over ref centroids/boxes) ---
        best = (math.inf, -1, -1, None)
        for axis in range(3):
            ext = float(ext3[axis])
            if not ext > 0:
                continue
            scale = bins / ext
            bidx = np.clip(((cent[:, axis] - clo_v[axis]) * scale)
                           .astype(np.int64), 0, bins - 1)
            counts = np.bincount(bidx, minlength=bins)
            bl = np.full((bins, 3), np.inf)
            bh = np.full((bins, 3), -np.inf)
            np.minimum.at(bl, bidx, lo_a)
            np.maximum.at(bh, bidx, hi_a)
            rl = np.minimum.accumulate(bl[::-1], axis=0)[::-1]
            rh = np.maximum.accumulate(bh[::-1], axis=0)[::-1]
            ll = np.minimum.accumulate(bl, axis=0)
            lh = np.maximum.accumulate(bh, axis=0)
            lcnt = np.cumsum(counts)
            for bb in range(bins - 1):
                lc, rc = int(lcnt[bb]), count - int(lcnt[bb])
                if lc == 0 or rc == 0:
                    continue
                cost = (_half_area(ll[bb], lh[bb]) * lc
                        + _half_area(rl[bb + 1], rh[bb + 1]) * rc)
                if cost < best[0]:
                    best = (cost, axis, bb, bidx)
        obj_cost, obj_axis, obj_split, obj_bidx = best

        # child overlap -> spatial-split trigger
        do_spatial = False
        if obj_axis >= 0:
            keep = obj_bidx <= obj_split
            ol = np.maximum(lo_a[keep].min(axis=0), lo_a[~keep].min(axis=0))
            oh = np.minimum(hi_a[keep].max(axis=0), hi_a[~keep].max(axis=0))
            if (oh > ol).all() and _half_area(ol, oh) > alpha * root_ha:
                do_spatial = True

        sp = None  # (cost, axis, plane)
        if do_spatial and n_refs[0] < max_refs - count:
            for axis in range(3):
                ext = float(node_hi[axis] - node_lo[axis])
                if not ext > 0:
                    continue
                scale = bins / ext
                e0 = np.clip(((lo_a[:, axis] - node_lo[axis]) * scale)
                             .astype(np.int64), 0, bins - 1)
                e1b = np.clip(((hi_a[:, axis] - node_lo[axis]) * scale)
                              .astype(np.int64), 0, bins - 1)
                e1b = np.maximum(e1b, e0)
                enter = np.bincount(e0, minlength=bins)
                leave = np.bincount(e1b, minlength=bins)
                # expanded (ref, spanned-bin) pairs; AABB-slab-clipped boxes
                cnt = e1b - e0 + 1
                tot = int(cnt.sum())
                ridx = np.repeat(np.arange(count), cnt)
                start = np.cumsum(cnt) - cnt
                bb_of = e0[ridx] + (np.arange(tot) - start[ridx])
                s0 = node_lo[axis] + bb_of / scale
                s1 = node_lo[axis] + (bb_of + 1) / scale
                clo = lo_a[ridx].copy()
                chi = hi_a[ridx].copy()
                clo[:, axis] = np.maximum(clo[:, axis], s0)
                chi[:, axis] = np.minimum(chi[:, axis], s1)
                bl = np.full((bins, 3), np.inf)
                bh = np.full((bins, 3), -np.inf)
                np.minimum.at(bl, bb_of, clo)
                np.maximum.at(bh, bb_of, chi)
                rl = np.minimum.accumulate(bl[::-1], axis=0)[::-1]
                rh = np.maximum.accumulate(bh[::-1], axis=0)[::-1]
                ll = np.minimum.accumulate(bl, axis=0)
                lh = np.maximum.accumulate(bh, axis=0)
                lc = np.cumsum(enter)
                rcum = np.cumsum(leave[::-1])[::-1]
                for bb in range(bins - 1):
                    nl, nr = int(lc[bb]), int(rcum[bb + 1])
                    if nl == 0 or nr == 0:
                        continue
                    cost = (_half_area(ll[bb], lh[bb]) * nl
                            + _half_area(rl[bb + 1], rh[bb + 1]) * nr)
                    if sp is None or cost < sp[0]:
                        sp = (cost, axis, node_lo[axis] + (bb + 1) / scale)

        if sp is not None and (obj_axis < 0 or sp[0] < obj_cost):
            _, axis, plane = sp
            plane = f32(plane)
            all_left = hi_a[:, axis] <= plane
            all_right = lo_a[:, axis] >= plane
            strad = ~(all_left | all_right)
            left_ids = [ids[all_left]]
            right_ids = [ids[all_right]]
            new_r = []
            for r in ids[strad]:
                olo = ref_lo[r].copy()
                ohi = ref_hi[r].copy()
                cl = _clip_tri_slab(tv[ref_tri[r]], axis,
                                    float(olo[axis]), float(plane))
                cr = _clip_tri_slab(tv[ref_tri[r]], axis,
                                    float(plane), float(ohi[axis]))
                if cl is not None:
                    llo = np.maximum(cl[0], olo)
                    lhi = np.minimum(cl[1], ohi)
                    lhi[axis] = min(lhi[axis], plane)
                    ref_lo[r] = llo
                    ref_hi[r] = lhi
                    left_ids.append(np.asarray([r]))
                if cr is not None:
                    rlo = np.maximum(cr[0], olo)
                    rhi = np.minimum(cr[1], ohi)
                    rlo[axis] = max(rlo[axis], plane)
                    if cl is None:
                        ref_lo[r] = rlo
                        ref_hi[r] = rhi
                        right_ids.append(np.asarray([r]))
                    else:
                        nid = n_refs[0]
                        n_refs[0] += 1
                        ref_tri[nid] = ref_tri[r]
                        ref_lo[nid] = rlo
                        ref_hi[nid] = rhi
                        new_r.append(nid)
                if cl is None and cr is None:
                    left_ids.append(np.asarray([r]))  # degenerate
            if new_r:
                right_ids.append(np.asarray(new_r))
            left_arr = np.concatenate(left_ids) if left_ids else np.empty(0, np.int64)
            right_arr = np.concatenate(right_ids) if right_ids else np.empty(0, np.int64)
            if left_arr.size and right_arr.size:
                spatial_splits[0] += 1
                li = build(left_arr.astype(np.int64))
                ri = build(right_arr.astype(np.int64))
                b_left[idx] = li
                b_right[idx] = ri
                return idx
            # degenerate: fall through to object split

        if obj_axis < 0:
            mid = count // 2
            left_arr, right_arr = ids[:mid], ids[mid:]
        else:
            keep = obj_bidx <= obj_split
            left_arr, right_arr = ids[keep], ids[~keep]
        li = build(left_arr)
        ri = build(right_arr)
        b_left[idx] = li
        b_right[idx] = ri
        return idx

    root = build(np.arange(num_tris, dtype=np.int64))

    # flatten leaf tri lists + ranges
    order_list = []
    rng_of = {}
    for i in range(len(b_left)):
        if b_left[i] < 0:
            lo = len(order_list)
            order_list.extend(b_leaf_tris[i].tolist())
            rng_of[i] = (lo, len(order_list))

    # --- collapse binary -> wide, BFS (mirrors _sah_topology) ---
    rows_is_leaf, rows_range, rows_child, rows_box = [], [], [], []

    def make_row(bn):
        rid = len(rows_is_leaf)
        rows_is_leaf.append(b_left[bn] < 0)
        rows_range.append(rng_of.get(bn, (0, 0)))
        rows_child.append([-1] * width)
        rows_box.append((boxes_lo[bn], boxes_hi[bn]))
        return rid

    queue = [(root, 0)]
    row_of = [make_row(root)]
    depth = 0
    qi = 0
    while qi < len(queue):
        bn, level = queue[qi]
        rid = row_of[qi]
        depth = max(depth, level + 1)
        if b_left[bn] >= 0:
            roots = [b_left[bn], b_right[bn]]
            while len(roots) < width:
                pick, best_area = -1, -1.0
                for i, r in enumerate(roots):
                    if b_left[r] < 0:
                        continue
                    a = _half_area(boxes_lo[r], boxes_hi[r])
                    if a > best_area:
                        best_area, pick = a, i
                if pick < 0:
                    break
                ex = roots[pick]
                roots[pick] = b_left[ex]
                roots.insert(pick + 1, b_right[ex])
            for k, r in enumerate(roots):
                queue.append((r, level + 1))
                crid = make_row(r)
                row_of.append(crid)
                rows_child[rid][k] = crid
        qi += 1

    dup = n_refs[0] - num_tris
    print(f"  sbvh: refs={n_refs[0]} (+{dup} dup, {100.0*dup/num_tris:.1f}%), "
          f"spatial_splits={spatial_splits[0]}", flush=True)
    return (np.asarray(order_list, np.int64), rows_is_leaf, rows_range,
            rows_child, rows_box, depth)


def main():
    num_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-5
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.app.settings import Scenes
    from sim_record_width import SimTree

    scene, preset = load_scene(Scenes.Sponza)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    print(f"tris={len(v0)}", flush=True)

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
                    np.zeros(num_rays), np.ones(num_rays)], axis=1)
    world = ndc @ ivp.astype(np.float64)
    world = world[:, :3] / world[:, 3:4]
    cam_o = np.asarray(cam.position, np.float64)
    prim_d = world - cam_o
    prim_d /= np.linalg.norm(prim_d, axis=1, keepdims=True)
    prim_o = np.broadcast_to(cam_o, prim_d.shape)

    W, L = 32, 12
    from dxrpathtracer_tpu.accel.lbvh import _sah_topology

    def run(label, topo):
        tree = SimTree(v0, v1, v2, topo, W)
        n_rows = len(tree.is_leaf)
        stats = np.zeros((num_rays, 2), np.int64)
        tb = np.full(num_rays, 3e38)
        for i in range(num_rays):
            ivv, lvv, t = tree.trace(prim_o[i], prim_d[i])
            stats[i] = (ivv, lvv)
            tb[i] = t
        hit = tb < 3e38
        hp = prim_o[hit] + prim_d[hit] * (tb[hit, None] * 0.999)
        r2 = np.random.default_rng(1)
        bd = r2.normal(size=hp.shape)
        bd /= np.linalg.norm(bd, axis=1, keepdims=True)
        stats_b = np.zeros((hp.shape[0], 2), np.int64)
        for i in range(hp.shape[0]):
            ivv, lvv, _ = tree.trace(hp[i], bd[i])
            stats_b[i] = (ivv, lvv)
        p_iv, p_lv = stats.mean(axis=0)
        b_iv, b_lv = stats_b.mean(axis=0)
        print(f"{label}: rows={n_rows} depth={tree.depth} | primary "
              f"iv={p_iv:.2f} lv={p_lv:.2f} tot={p_iv+p_lv:.2f} | bounce "
              f"iv={b_iv:.2f} lv={b_lv:.2f} tot={b_iv+b_lv:.2f}", flush=True)
        return tb

    t0 = time.time()
    topo0 = _sah_topology(v0, v1, v2, L, width=W)
    print(f"object-SAH build {time.time()-t0:.0f}s", flush=True)
    tb0 = run("object-SAH W32/L12", topo0)

    t0 = time.time()
    topo1 = sbvh_topology(v0, v1, v2, L, W, alpha=alpha)
    print(f"SBVH build {time.time()-t0:.0f}s", flush=True)
    tb1 = run(f"SBVH(a={alpha}) W32/L12", topo1)

    both = (tb0 < 3e38) & (tb1 < 3e38)
    if both.any():
        rel = np.abs(tb0[both] - tb1[both]) / np.maximum(tb0[both], 1e-6)
        print(f"t-hit agreement: max rel diff {rel.max():.2e} "
              f"(hit sets equal: {bool(((tb0 < 3e38) == (tb1 < 3e38)).all())})")


if __name__ == "__main__":
    main()
