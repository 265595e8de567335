"""Charted lightmap atlas — the xatlas-equivalent chart segmentation/packing.

The reference unwraps lightmap UVs with xatlas (Model.cpp:608-719,
Externals/xatlas) before baking; round 1/2 shipped an analytic per-triangle
pair packer (bake/lightmap_uv.py) whose uniform texel density covered only
~69% of the atlas and under-sampled large triangles. This module is the real
replacement:

  1. charts grow by BFS over edge-connected triangles whose normals stay
     within a cone of the seed normal (planar projection stays injective for
     near-planar surfaces; a per-chart area-vs-union check catches folds and
     demotes offending charts to per-triangle fallbacks),
  2. each chart is projected onto its seed plane, so chart UVs are in WORLD
     units — one global scale makes texel density proportional to world area
     by construction (fixing the pair packer's uniform-density flaw),
  3. charts pack into shelves (sorted by height, rotated to landscape,
     several candidate atlas widths, best coverage wins) with a world-space
     gutter derived from the requested texel gutter.

The texel -> (triangle, barycentric) inverse map — which the analytic atlas
got in closed form — becomes a host-side rasterization over chart triangles
(the reference's SurfaceMap.hlsl:35-94 raster pass, done in numpy), followed
by N-ring dilation that copies edge texels into the gutter so bilinear
lightmap sampling never bleeds background into seams (Mesh.hlsl:155-162).
"""

import dataclasses
import math

import numpy as np


@dataclasses.dataclass(frozen=True)
class ChartedAtlas:
    """Charted lightmap UV layout for T triangles."""

    num_tris: int
    tri_uv: np.ndarray      # (T, 3, 2) f32 atlas UVs per corner (v0, v1, v2)
    num_charts: int
    coverage: float         # fraction of atlas texels covered by triangles
    gutter_texels: float
    ref_resolution: int

    def triangle_uvs(self) -> np.ndarray:
        return self.tri_uv


def _weld_indices(positions: np.ndarray, tri_idx: np.ndarray,
                  tol: float = 1e-5):
    """Remap triangle indices so vertices at the same position share one id.
    FBX exports split vertices at every normal/UV seam, which would otherwise
    make every triangle its own connectivity island (xatlas welds the same
    way before charting)."""
    q = np.round(positions / tol).astype(np.int64)
    _, first = np.unique(q, axis=0, return_inverse=True)
    return first[tri_idx]


def _triangle_adjacency(positions: np.ndarray, tri_idx: np.ndarray):
    """(E, 2) pairs of triangles sharing a (position-welded) edge."""
    t = tri_idx.shape[0]
    tri_idx = _weld_indices(positions, tri_idx)
    edges = np.concatenate([tri_idx[:, [0, 1]], tri_idx[:, [1, 2]],
                            tri_idx[:, [2, 0]]], axis=0)
    edges = np.sort(edges, axis=1)
    owner = np.tile(np.arange(t, dtype=np.int64), 3)
    key = edges[:, 0].astype(np.int64) * (tri_idx.max() + 1) + edges[:, 1]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    own_s = owner[order]
    same = key_s[1:] == key_s[:-1]
    return np.stack([own_s[:-1][same], own_s[1:][same]], axis=1)


def _grow_charts(positions, tri_idx, normals, areas, max_angle_deg=40.0,
                 max_chart_tris=4000):
    """Greedy BFS chart growth; returns (T,) chart id per triangle."""
    t = tri_idx.shape[0]
    pairs = _triangle_adjacency(positions, tri_idx)
    # CSR adjacency
    deg = np.zeros(t + 1, np.int64)
    np.add.at(deg, pairs[:, 0] + 1, 1)
    np.add.at(deg, pairs[:, 1] + 1, 1)
    ptr = np.cumsum(deg)
    # fill adjacency via one stable argsort over both edge directions
    src = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]])
    order = np.argsort(src, kind="stable")
    adj = dst[order]

    cos_max = math.cos(math.radians(max_angle_deg))
    chart = np.full(t, -1, np.int64)
    seed_order = np.argsort(-areas, kind="stable")
    next_chart = 0
    from collections import deque
    for seed in seed_order:
        if chart[seed] >= 0:
            continue
        cid = next_chart
        next_chart += 1
        n0 = normals[seed]
        chart[seed] = cid
        queue = deque([seed])
        size = 1
        while queue and size < max_chart_tris:
            cur = queue.popleft()
            for nb in adj[ptr[cur]:ptr[cur + 1]]:
                if chart[nb] >= 0:
                    continue
                if normals[nb] @ n0 >= cos_max:
                    chart[nb] = cid
                    queue.append(nb)
                    size += 1
                    if size >= max_chart_tris:
                        break
    return chart, next_chart


def _plane_basis(n):
    up = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    t1 = np.cross(up, n)
    t1 /= max(np.linalg.norm(t1), 1e-20)
    t2 = np.cross(n, t1)
    return t1, t2


def _chart_overlap_frac(uv2, res=64):
    """Fraction of a chart's rasterized texels covered by >= 2 triangles
    (shared edges contribute ~0; folds contribute a lot). uv2: (C, 3, 2)."""
    lo = uv2.min(axis=(0, 1))
    hi = uv2.max(axis=(0, 1))
    ext = np.maximum(hi - lo, 1e-12)
    q = (uv2 - lo) / ext * (res - 1)
    count = np.zeros((res, res), np.int32)
    for tri in q:
        bb_lo = np.floor(tri.min(axis=0)).astype(int)
        bb_hi = np.ceil(tri.max(axis=0)).astype(int) + 1
        xs = np.arange(bb_lo[0], min(bb_hi[0], res))
        ys = np.arange(bb_lo[1], min(bb_hi[1], res))
        if xs.size == 0 or ys.size == 0:
            continue
        px, py = np.meshgrid(xs + 0.5, ys + 0.5, indexing="ij")
        d = np.stack([px, py], -1) - tri[0]
        e1 = tri[1] - tri[0]
        e2 = tri[2] - tri[0]
        det = e1[0] * e2[1] - e1[1] * e2[0]
        if abs(det) < 1e-12:
            continue
        u = (d[..., 0] * e2[1] - d[..., 1] * e2[0]) / det
        v = (e1[0] * d[..., 1] - e1[1] * d[..., 0]) / det
        inside = (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6)
        count[bb_lo[0]:bb_lo[0] + xs.size,
              bb_lo[1]:bb_lo[1] + ys.size] += inside
    covered = count > 0
    multi = count > 1
    return multi.sum() / max(covered.sum(), 1)


def _shelf_pack(sizes, atlas_w):
    """Shelf packing: sizes (N, 2) [w, h], sorted by h desc by the caller.
    Returns (positions (N, 2), used_w, used_h)."""
    pos = np.zeros_like(sizes)
    x = y = shelf_h = 0.0
    used_w = 0.0
    for i, (w, h) in enumerate(sizes):
        if x + w > atlas_w and x > 0.0:
            y += shelf_h
            x = 0.0
            shelf_h = 0.0
        pos[i] = (x, y)
        x += w
        shelf_h = max(shelf_h, h)
        used_w = max(used_w, x)
    return pos, used_w, y + shelf_h


def _chart_profiles(uvs, w_cols, cell, pad):
    """Exact per-column (bottom, top) y-profiles of a chart's triangle
    EDGES, inflated by `pad` (the gutter) on every side.

    uvs: (C, 3, 2) chart-local shifted so the padded chart starts at 0;
    columns cover [0, w_cols*cell). Within a column strip [xa, xb], a
    triangle's y-extremes occur at vertices inside the strip or at edge
    crossings of xa/xb — both are computed, so sloped charts (roofs, lone
    triangles) get true slanted profiles instead of bbox rectangles and can
    nest into each other's slack."""
    bottom = np.full(w_cols, np.inf)
    top = np.full(w_cols, -np.inf)
    # edges (E, 2 endpoints, 2 xy)
    e = np.concatenate([uvs[:, [0, 1]], uvs[:, [1, 2]], uvs[:, [2, 0]]],
                       axis=0)
    px, py = e[:, 0, 0], e[:, 0, 1]
    qx, qy = e[:, 1, 0], e[:, 1, 1]

    # vertex contributions: each endpoint lands in its own column
    cols_v = np.clip((px / cell).astype(np.int64), 0, w_cols - 1)
    np.minimum.at(bottom, cols_v, py)
    np.maximum.at(top, cols_v, py)

    # crossing contributions: where an edge crosses a column boundary x=b,
    # add the interpolated y to both adjacent columns
    lo = np.minimum(px, qx)
    hi = np.maximum(px, qx)
    b0 = np.ceil(lo / cell).astype(np.int64)
    b1 = np.floor(hi / cell).astype(np.int64)
    for i in range(e.shape[0]):
        if b1[i] < b0[i] or hi[i] - lo[i] < 1e-20:
            continue
        bs = np.arange(b0[i], b1[i] + 1)
        xb = bs * cell
        t = np.clip((xb - px[i]) / (qx[i] - px[i] + 1e-30), 0.0, 1.0)
        yb = py[i] + t * (qy[i] - py[i])
        cl = np.clip(bs - 1, 0, w_cols - 1)
        cr = np.clip(bs, 0, w_cols - 1)
        np.minimum.at(bottom, cl, yb)
        np.minimum.at(bottom, cr, yb)
        np.maximum.at(top, cl, yb)
        np.maximum.at(top, cr, yb)

    covered = np.isfinite(bottom)
    bottom = np.where(covered, bottom - pad, np.inf)
    top = np.where(np.isfinite(top), top + pad, -np.inf)
    # inflate horizontally by pad: min/max over the neighbor window
    r = max(int(math.ceil(pad / cell)), 0)
    if r > 0:
        padded_b = np.pad(bottom, r, constant_values=np.inf)
        padded_t = np.pad(top, r, constant_values=-np.inf)
        from numpy.lib.stride_tricks import sliding_window_view
        bottom = sliding_window_view(padded_b, 2 * r + 1).min(axis=1)
        top = sliding_window_view(padded_t, 2 * r + 1).max(axis=1)
    bottom[~np.isfinite(bottom)] = 0.0
    top[~np.isfinite(top)] = 0.0
    return bottom, top


def _skyline_pack(chart_uvs, widths, heights, atlas_w, cell, pad):
    """Skyline packing with per-column profiles: charts nest vertically into
    the gaps bbox shelves would waste (sloped roofs, triangles, L-shapes).

    chart_uvs: list of (C_i, 3, 2) chart-local uvs shifted by +pad; widths/
    heights are the padded extents. Returns (origins of the PADDED box
    (N, 2), used_w, used_h). Charts processed in the caller's order (sort by
    height desc)."""
    from numpy.lib.stride_tricks import sliding_window_view

    g_cols = max(int(math.ceil(atlas_w / cell)), 1)
    sky = np.zeros(g_cols + 1)
    origins = np.zeros((len(chart_uvs), 2))
    used_w = used_h = 0.0
    for i, uvs in enumerate(chart_uvs):
        w = widths[i]
        h = heights[i]
        w_cols = max(int(math.ceil(w / cell)), 1)
        if w_cols > g_cols:
            w_cols = g_cols
        bottom, top = _chart_profiles(uvs, w_cols, cell, pad)
        windows = sliding_window_view(sky[:g_cols], w_cols)  # (P, w_cols)
        lift = windows - bottom[None, :]
        y_place = np.maximum(lift.max(axis=1), 0.0)
        # waste-aware placement: trapped air under this placement is
        # sum_i (y_place - lift_i); minimize (trapped, y) — plain
        # bottom-left skyline measured 0.56 packing efficiency on theInn,
        # waste-aware recovers most of it
        trapped = y_place * w_cols - lift.sum(axis=1)
        pick = np.lexsort((np.arange(y_place.size), trapped, y_place))
        x_best = int(pick[0])
        y_best = float(y_place[x_best])
        origins[i] = (x_best * cell, y_best)
        new_cols = y_best + top
        seg = sky[x_best:x_best + w_cols]
        sky[x_best:x_best + w_cols] = np.maximum(seg, new_cols)
        used_w = max(used_w, x_best * cell + w)
        used_h = max(used_h, y_best + h)
    return origins, used_w, used_h


def _grid_fill(occ, spans_list, heights_cells):
    """Place small charts into ANY free pocket of the occupancy grid (the
    skyline can only stack on top; this recovers the trapped air under and
    between the big charts). occ: (R, C) bool; spans_list[i] = (b, t) cell
    spans per column of chart i (len w_i). Returns (placements (N, 2) cell
    coords or -1, occ updated in place)."""
    r, c = occ.shape
    out = np.full((len(spans_list), 2), -1, np.int64)
    cum = None
    dirty = True
    for i, (b, t) in enumerate(spans_list):
        w = b.shape[0]
        h = heights_cells[i]
        if w > c or h >= r:
            continue
        if dirty:
            cum = np.zeros((r + 1, c), np.int64)
            np.cumsum(occ, axis=0, out=cum[1:])
            dirty = False
        ymax = r - h
        xmax = c - w + 1
        if ymax <= 0 or xmax <= 0:
            continue
        ok = np.ones((ymax, xmax), bool)
        for k in range(w):
            ok &= (cum[t[k]:t[k] + ymax, k:k + xmax]
                   - cum[b[k]:b[k] + ymax, k:k + xmax]) == 0
        ys, xs = np.nonzero(ok)
        if ys.size == 0:
            continue
        j = np.lexsort((xs, ys))[0]
        y, x = int(ys[j]), int(xs[j])
        out[i] = (x, y)
        for k in range(w):
            occ[y + b[k]:y + t[k], x + k] = True
        dirty = True
    return out


def build_charted_atlas(positions, tri_idx, gutter_texels: float = 2.0,
                        ref_resolution: int = 1024, max_angle_deg: float = 60.0,
                        max_chart_tris: int = 4000,
                        overlap_tolerance: float = 0.02) -> ChartedAtlas:
    """Chart, project, and pack lightmap UVs for the given mesh."""
    positions = np.asarray(positions, np.float64)
    tri_idx = np.asarray(tri_idx, np.int64)
    t = tri_idx.shape[0]
    v0 = positions[tri_idx[:, 0]]
    v1 = positions[tri_idx[:, 1]]
    v2 = positions[tri_idx[:, 2]]
    n_raw = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(n_raw, axis=1)
    normals = n_raw / np.maximum(np.linalg.norm(n_raw, axis=1, keepdims=True),
                                 1e-20)

    chart, n_charts = _grow_charts(positions, tri_idx, normals, areas,
                                   max_angle_deg, max_chart_tris)

    # --- project each chart; split folded charts into per-tri fallbacks ---
    chart_uv = np.zeros((t, 3, 2), np.float64)   # world-unit chart-local UVs
    chart_of = chart.copy()
    next_chart = n_charts
    for cid in range(n_charts):
        sel = np.nonzero(chart == cid)[0]
        n0 = normals[sel[np.argmax(areas[sel])]]
        t1, t2 = _plane_basis(n0)
        verts = positions[tri_idx[sel]]                       # (C, 3, 3)
        uv2 = np.stack([verts @ t1, verts @ t2], axis=-1)     # (C, 3, 2)
        if sel.size > 1 and _chart_overlap_frac(uv2) > overlap_tolerance:
            # folded/self-overlapping: demote to one chart per triangle,
            # each projected onto its own plane (always injective)
            for j, ti in enumerate(sel):
                tb1, tb2 = _plane_basis(normals[ti])
                vv = positions[tri_idx[ti]]
                chart_uv[ti] = np.stack([vv @ tb1, vv @ tb2], axis=-1)
                chart_of[ti] = cid if j == 0 else next_chart
                if j > 0:
                    next_chart += 1
        else:
            chart_uv[sel] = uv2
    n_charts = next_chart

    # --- rotate each chart to its minimum-area bbox; land in landscape ---
    ids = np.unique(chart_of)
    bbox_w = np.zeros(n_charts)
    bbox_h = np.zeros(n_charts)
    angles = np.linspace(0.0, math.pi / 2.0, 16, endpoint=False)
    cs, sn = np.cos(angles), np.sin(angles)
    # chart_of sorted grouping (vectorized per-chart loops over index lists)
    group_order = np.argsort(chart_of, kind="stable")
    bounds = np.searchsorted(chart_of[group_order], np.arange(n_charts + 1))
    for cid in ids:
        sel = group_order[bounds[cid]:bounds[cid + 1]]
        uv = chart_uv[sel].reshape(-1, 2)
        # minimal-area bbox over 16 candidate rotations
        xr = uv[:, 0:1] * cs[None, :] - uv[:, 1:2] * sn[None, :]
        yr = uv[:, 0:1] * sn[None, :] + uv[:, 1:2] * cs[None, :]
        wz = xr.max(axis=0) - xr.min(axis=0)
        hz = yr.max(axis=0) - yr.min(axis=0)
        k = int(np.argmin(wz * hz))
        uv = np.stack([xr[:, k] - xr[:, k].min(),
                       yr[:, k] - yr[:, k].min()], axis=-1)
        ext = uv.max(axis=0)
        if ext[1] > ext[0]:  # rotate 90 deg to landscape (shelves like wide)
            uv = np.stack([uv[:, 1], ext[0] - uv[:, 0]], axis=-1)
            ext = ext[::-1]
        chart_uv[sel] = uv.reshape(-1, 3, 2)
        bbox_w[cid], bbox_h[cid] = ext[0], ext[1]

    # --- world-space gutter from the requested texel gutter ---
    area_sum = float(((bbox_w + 1e-12) * (bbox_h + 1e-12)).sum())
    scale0 = 1.0 / max(math.sqrt(area_sum), 1e-20)   # rough atlas-per-world
    g = gutter_texels / (ref_resolution * scale0)
    pad_w = bbox_w + 2.0 * g
    pad_h = bbox_h + 2.0 * g

    # --- pack: skyline for big charts, grid hole-filling for small ones ---
    # (pure skyline measured 0.72 packing efficiency on theInn — the trapped
    # air under big placements is only reachable by a true 2D fill)
    total = float((pad_w * pad_h).sum())
    grid_cols = 1024
    small_cols = 16

    uvs_of = [None] * n_charts
    for c in range(n_charts):
        uvs_of[c] = chart_uv[group_order[bounds[c]:bounds[c + 1]]] + g

    # choose the atlas width with the big charts only (fast)
    cell_probe = math.sqrt(total) / grid_cols
    is_small = pad_w <= small_cols * cell_probe
    big = np.nonzero(~is_small)[0]
    small = np.nonzero(is_small)[0]
    big_order = big[np.argsort(-pad_h[big], kind="stable")]
    big_lists = [uvs_of[c] for c in big_order]
    best = None
    for f in (1.0, 1.12, 1.3, 0.9):
        atlas_w = max(math.sqrt(total) * f, pad_w.max())
        cell = atlas_w / grid_cols
        pos_b, uw, uh = _skyline_pack(big_lists, pad_w[big_order],
                                      pad_h[big_order], atlas_w, cell, g)
        score = max(uw, uh)
        if best is None or score < best[0]:
            best = (score, pos_b, atlas_w, cell, uh)
    _, pos_b, atlas_w, cell, big_h = best

    origin = np.zeros((n_charts, 2))
    origin[big_order] = pos_b + g

    # occupancy of the big placements (per-column exact profiles)
    rows = int(math.ceil(big_h / cell * 1.25)) + 64
    occ = np.zeros((rows, grid_cols), bool)
    for j, c in enumerate(big_order):
        w_cols = max(int(math.ceil(pad_w[c] / cell)), 1)
        prof_b, prof_t = _chart_profiles(uvs_of[c],
                                         min(w_cols, grid_cols), cell, g)
        x0 = min(int(round(pos_b[j][0] / cell)), grid_cols - prof_b.shape[0])
        y0 = pos_b[j][1]
        bc = np.clip(np.floor((y0 + prof_b) / cell).astype(int), 0, rows)
        tc = np.clip(np.ceil((y0 + prof_t) / cell).astype(int), 0, rows)
        for k in range(prof_b.shape[0]):
            occ[bc[k]:tc[k], x0 + k] = True

    # grid-fill the small charts, biggest first
    small_order = small[np.argsort(-(pad_w[small] * pad_h[small]),
                                   kind="stable")]
    spans = []
    hcells = []
    for c in small_order:
        w_cols = max(int(math.ceil(pad_w[c] / cell)), 1)
        prof_b, prof_t = _chart_profiles(uvs_of[c],
                                         min(w_cols, grid_cols), cell, g)
        spans.append((np.clip(np.floor(prof_b / cell).astype(int), 0, rows),
                      np.clip(np.ceil(prof_t / cell).astype(int), 0, rows)))
        hcells.append(int(math.ceil(pad_h[c] / cell)) + 1)
    placed = _grid_fill(occ, spans, hcells)
    overflow = []
    for j, c in enumerate(small_order):
        if placed[j][0] >= 0:
            origin[c] = (placed[j][0] * cell + g, placed[j][1] * cell + g)
        else:
            overflow.append(c)
    # anything the grid could not fit goes on a shelf above everything
    if overflow:
        ys, xs = np.nonzero(occ.any(axis=1)[:, None])
        top_y = (int(ys.max()) + 1) * cell if ys.size else big_h
        x = 0.0
        shelf_h = 0.0
        for c in overflow:
            if x + pad_w[c] > atlas_w and x > 0.0:
                top_y += shelf_h
                x = 0.0
                shelf_h = 0.0
            origin[c] = (x + g, top_y + g)
            x += pad_w[c]
            shelf_h = max(shelf_h, pad_h[c])

    final_raw = chart_uv + origin[chart_of][:, None, :]
    ext = final_raw.reshape(-1, 2).max(axis=0) + g
    side = float(max(ext[0], ext[1]))
    final = final_raw / side
    # expected texel coverage = projected world triangle area / atlas area
    # (both in world units since `side` is the atlas edge in world units)
    coverage = float(areas.sum() / (side * side))

    return ChartedAtlas(num_tris=t, tri_uv=final.astype(np.float32),
                        num_charts=int(n_charts), coverage=coverage,
                        gutter_texels=gutter_texels,
                        ref_resolution=ref_resolution)


def rasterize_texel_map(tri_uv: np.ndarray, resolution: int,
                        dilate: int = 2):
    """Rasterize the atlas: per texel (tri_id, bary_u, bary_v), -1 outside,
    then dilate `dilate` rings so gutter texels copy their nearest edge texel
    (bilinear lightmap sampling then never bleeds background; the dilated
    texels bake the same surface point as the edge they copy).

    Returns (tri (S,S) i32, bu (S,S) f32, bv (S,S) f32, coverage_frac)."""
    s = resolution
    tri_map = np.full((s, s), -1, np.int32)
    bu = np.zeros((s, s), np.float32)
    bv = np.zeros((s, s), np.float32)
    q = np.asarray(tri_uv, np.float64) * s  # texel coords; texel centers +0.5
    for ti in range(q.shape[0]):
        tri = q[ti]
        lo = np.floor(tri.min(axis=0) - 0.5).astype(int)
        hi = np.ceil(tri.max(axis=0) + 0.5).astype(int)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, s - 1)
        if (hi < lo).any():
            continue
        xs = np.arange(lo[0], hi[0] + 1)
        ys = np.arange(lo[1], hi[1] + 1)
        px, py = np.meshgrid(xs + 0.5, ys + 0.5, indexing="ij")
        e1 = tri[1] - tri[0]
        e2 = tri[2] - tri[0]
        det = e1[0] * e2[1] - e1[1] * e2[0]
        if abs(det) < 1e-12:
            continue
        dx = px - tri[0][0]
        dy = py - tri[0][1]
        u = (dx * e2[1] - dy * e2[0]) / det
        v = (e1[0] * dy - e1[1] * dx) / det
        inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        if not inside.any():
            continue
        # u weights v1, v2 (HitAttributes convention); atlas u axis is
        # texel COLUMN, so tri_map is indexed [col, row] here -> transpose
        # at the end to match the (row, col) image convention.
        sub = tri_map[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1]
        take = inside & (sub < 0)
        sub[take] = ti
        bu[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1][take] = u[take]
        bv[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1][take] = v[take]

    coverage = float((tri_map >= 0).mean())

    # --- gutter dilation (copy nearest covered texel's mapping) ---
    for _ in range(dilate):
        empty = tri_map < 0
        for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            shifted = np.roll(np.roll(tri_map, sx, 0), sy, 1)
            sbu = np.roll(np.roll(bu, sx, 0), sy, 1)
            sbv = np.roll(np.roll(bv, sx, 0), sy, 1)
            adopt = empty & (tri_map < 0) & (shifted >= 0)
            tri_map = np.where(adopt, shifted, tri_map)
            bu = np.where(adopt, sbu, bu)
            bv = np.where(adopt, sbv, bv)

    # stored [col(x=u), row(y=v)] -> image convention [row, col]
    return tri_map.T.copy(), bu.T.copy(), bv.T.copy(), coverage
