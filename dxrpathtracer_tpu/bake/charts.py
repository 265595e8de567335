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
  3. every chart packs through one occupancy grid by bottom-left-fill
     against exact per-column edge profiles (biggest first, first-fit
     lowest-(y, x)), with the pack width iterated toward a square layout
     and a world-space gutter derived from the requested texel gutter
     (measured 0.94 packing efficiency on theInn vs 0.795 for the earlier
     skyline+hole-fill hybrid — PERF_NOTES.md round 3).

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


def _grid_fill(occ, spans_list, heights_cells, band: int = 128):
    """Place charts into ANY free pocket of the occupancy grid (the skyline
    can only stack on top; this recovers the trapped air under and between
    the big charts). occ: (R, C) bool; spans_list[i] = (b, t) cell spans
    per column of chart i (len w_i). Returns (placements (N, 2) cell coords
    or -1, occ updated in place).

    First-fit lowest-(y, x), searched in row bands from the bottom so the
    cost scales with where the chart lands, not the grid height; the
    column-prefix-sum table is patched incrementally per placement (a full
    rebuild per chart measured 50 s of a 141 s theInn build)."""
    r, c = occ.shape
    out = np.full((len(spans_list), 2), -1, np.int64)
    cum = np.zeros((r + 1, c), np.int64)
    np.cumsum(occ, axis=0, out=cum[1:])
    for i, (b, t) in enumerate(spans_list):
        w = b.shape[0]
        h = heights_cells[i]
        if w > c or h >= r:
            continue
        ymax = r - h
        xmax = c - w + 1
        if ymax <= 0 or xmax <= 0:
            continue
        found = None
        for y0 in range(0, ymax, band):
            yb = min(band, ymax - y0)
            ok = np.ones((yb, xmax), bool)
            for k in range(w):
                ok &= (cum[t[k] + y0:t[k] + y0 + yb, k:k + xmax]
                       - cum[b[k] + y0:b[k] + y0 + yb, k:k + xmax]) == 0
            ys, xs = np.nonzero(ok)
            if ys.size:
                j = np.lexsort((xs, ys))[0]
                found = (int(ys[j]) + y0, int(xs[j]))
                break
        if found is None:
            continue
        y, x = found
        out[i] = (x, y)
        for k in range(w):
            occ[y + b[k]:y + t[k], x + k] = True
            np.cumsum(occ[:, x + k], out=cum[1:, x + k])
    return out


def _blf_pack(uvs_of, chart_uv, chart_of, pad_w, pad_h, g, total,
              grid_cols, f):
    """One bottom-left-fill pass at width factor `f`.

    Returns (origin (N, 2) world-unit chart origins, side, balance) where
    side is the final square edge and balance = used_h / atlas_w (the
    caller's width-iteration signal)."""
    n_charts = pad_w.shape[0]
    atlas_w = max(math.sqrt(total) * f, pad_w.max() + 1e-12)
    cell = atlas_w / grid_cols
    order = np.argsort(-(pad_w * pad_h), kind="stable")
    rows = grid_cols * 3  # generous: narrow passes stack high
    spans = []
    hcells = []
    for c in order:
        w_cols = max(int(math.ceil(pad_w[c] / cell)), 1)
        prof_b, prof_t = _chart_profiles(uvs_of[c],
                                         min(w_cols, grid_cols), cell, g)
        spans.append((np.clip(np.floor(prof_b / cell).astype(int), 0, rows),
                      np.clip(np.ceil(prof_t / cell).astype(int), 0, rows)))
        hcells.append(int(math.ceil(pad_h[c] / cell)) + 1)
    occ = np.zeros((rows, grid_cols), bool)
    placed = _grid_fill(occ, spans, hcells)

    origin = np.zeros((n_charts, 2))
    # anything the grid could not fit goes on a shelf above everything
    # (only reachable at extreme width factors)
    ys = np.nonzero(occ.any(axis=1))[0]
    top_y = (int(ys.max()) + 1) * cell if ys.size else 0.0
    x = 0.0
    shelf_h = 0.0
    for j, c in enumerate(order):
        if placed[j][0] >= 0:
            origin[c] = (placed[j][0] * cell + g, placed[j][1] * cell + g)
            continue
        if x + pad_w[c] > atlas_w and x > 0.0:
            top_y += shelf_h
            x = 0.0
            shelf_h = 0.0
        origin[c] = (x + g, top_y + g)
        x += pad_w[c]
        shelf_h = max(shelf_h, pad_h[c])

    final = chart_uv + origin[chart_of][:, None, :]
    ext = final.reshape(-1, 2).max(axis=0) + g
    side = float(max(ext[0], ext[1]))
    return origin, side, float(ext[1]) / atlas_w


def build_charted_atlas(positions, tri_idx, gutter_texels: float = 2.0,
                        ref_resolution: int = 1024, max_angle_deg: float = 60.0,
                        max_chart_tris: int = 4000,
                        overlap_tolerance: float = 0.02,
                        grid_cols: int = 1024,
                        pack_iters: int = 4) -> ChartedAtlas:
    """Chart, project, and pack lightmap UVs for the given mesh.

    grid_cols: packing-grid resolution (cost ~ grid_cols²; 512 is ~4x
    faster within ~1-2 coverage points — tests use it).
    pack_iters: width-iteration passes of the BLF packer."""
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

    # --- pack: bottom-left-fill EVERY chart through the occupancy grid ---
    # All charts, biggest first, first-fit lowest-(y, x) against exact
    # per-column profiles, so small charts nest into the trapped air under
    # and between big placements as they are packed (skyline-for-big +
    # grid-fill-for-small measured 0.795 packing efficiency on theInn; full
    # BLF at the balanced width measures ~0.94 — PERF_NOTES.md round 3).
    #
    # The atlas is square (side = max extent), so a tall-and-narrow or
    # short-and-wide layout wastes the envelope: iterate the pack width by
    # the measured height/width imbalance, keeping the best final side.
    total = float((pad_w * pad_h).sum())

    uvs_of = [None] * n_charts
    for c in range(n_charts):
        uvs_of[c] = chart_uv[group_order[bounds[c]:bounds[c + 1]]] + g

    # The coverage peak in f is sharp (±0.01 moves it several points) and
    # does NOT transfer across grid resolutions, so the iteration runs at
    # the full grid resolution.
    best = None
    f = 1.0
    seen = set()
    for _ in range(max(pack_iters, 1)):
        key = round(f, 3)
        if key in seen:
            break
        seen.add(key)
        origin_f, side_f, balance = _blf_pack(
            uvs_of, chart_uv, chart_of, pad_w, pad_h, g, total, grid_cols, f)
        if best is None or side_f < best[0]:
            best = (side_f, origin_f)
        # move toward used_h == atlas_w (area is ~conserved, so the
        # balanced width is ~ sqrt(atlas_w * used_h))
        f *= math.sqrt(min(max(balance, 0.25), 4.0))
    _, origin = best

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
