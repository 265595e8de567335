#!/usr/bin/env python3
"""Decompose the charted-atlas coverage loss on theInn.

coverage = tri_area / side^2. The lost fraction splits into
  - span overhead: cells CLAIMED by placed charts beyond their triangles'
    true area (gutter pad + outward cell quantization + air inside the
    per-column interval unions, e.g. slanted profiles), and
  - packing air: envelope side^2 minus all claimed cells.
This tells us whether finer grid cells / thinner pads (span overhead) or a
better packer (packing air) buys the 0.861 -> 0.90 gap (PERF_NOTES.md).

Usage: python tools/atlas_loss_probe.py [grid_cols] [pack_iters] [gutter]
"""

import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

from dxrpathtracer_tpu.bake import charts as C


def probe(grid_cols=512, pack_iters=3, gutter_texels=2.0, ref_resolution=4096):
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.app.settings import Scenes

    scene, _ = load_scene(Scenes.Stronghold)
    positions = np.asarray(scene.positions, np.float64)
    tri_idx = np.asarray(scene.tri_idx, np.int64)
    t = tri_idx.shape[0]
    print(f"theInn: {t} tris, grid_cols={grid_cols} iters={pack_iters} "
          f"gutter={gutter_texels} ref={ref_resolution}")

    v0, v1, v2 = (positions[tri_idx[:, k]] for k in range(3))
    n_raw = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(n_raw, axis=1)
    normals = n_raw / np.maximum(np.linalg.norm(n_raw, axis=1, keepdims=True), 1e-20)

    t0 = time.time()
    chart, n_charts = C._grow_charts(positions, tri_idx, normals, areas, 60.0, 4000)
    print(f"grow: {n_charts} charts in {time.time()-t0:.1f}s")

    chart_uv = np.zeros((t, 3, 2), np.float64)
    chart_of = chart.copy()
    next_chart = n_charts
    for cid in range(n_charts):
        sel = np.nonzero(chart == cid)[0]
        n0 = normals[sel[np.argmax(areas[sel])]]
        t1, t2 = C._plane_basis(n0)
        verts = positions[tri_idx[sel]]
        uv2 = np.stack([verts @ t1, verts @ t2], axis=-1)
        if sel.size > 1 and C._chart_overlap_frac(uv2) > 0.02:
            for j, ti in enumerate(sel):
                tb1, tb2 = C._plane_basis(normals[ti])
                vv = positions[tri_idx[ti]]
                chart_uv[ti] = np.stack([vv @ tb1, vv @ tb2], axis=-1)
                chart_of[ti] = cid if j == 0 else next_chart
                if j > 0:
                    next_chart += 1
        else:
            chart_uv[sel] = uv2
    n_charts = next_chart

    g_est = gutter_texels * math.sqrt(max(2.0 * float(areas.sum()), 1e-20)) / ref_resolution
    t0 = time.time()
    C._merge_charts(positions, tri_idx, chart_of, chart_uv, n_charts, g_est, 4000, 0.02)
    live = np.unique(chart_of).size
    print(f"merge: {live} charts in {time.time()-t0:.1f}s")

    ids = np.unique(chart_of)
    bbox_w = np.zeros(n_charts)
    bbox_h = np.zeros(n_charts)
    angles = np.linspace(0.0, math.pi / 2.0, 16, endpoint=False)
    cs, sn = np.cos(angles), np.sin(angles)
    group_order = np.argsort(chart_of, kind="stable")
    bounds = np.searchsorted(chart_of[group_order], np.arange(n_charts + 1))
    for cid in ids:
        sel = group_order[bounds[cid]:bounds[cid + 1]]
        uv = chart_uv[sel].reshape(-1, 2)
        xr = uv[:, 0:1] * cs[None, :] - uv[:, 1:2] * sn[None, :]
        yr = uv[:, 0:1] * sn[None, :] + uv[:, 1:2] * cs[None, :]
        wz = xr.max(axis=0) - xr.min(axis=0)
        hz = yr.max(axis=0) - yr.min(axis=0)
        k = int(np.argmin(wz * hz))
        uv = np.stack([xr[:, k] - xr[:, k].min(), yr[:, k] - yr[:, k].min()], axis=-1)
        ext = uv.max(axis=0)
        if ext[1] > ext[0]:
            uv = np.stack([uv[:, 1], ext[0] - uv[:, 0]], axis=-1)
            ext = ext[::-1]
        chart_uv[sel] = uv.reshape(-1, 3, 2)
        bbox_w[cid], bbox_h[cid] = ext[0], ext[1]

    area_sum = float(((bbox_w + 1e-12) * (bbox_h + 1e-12)).sum())
    scale0 = 1.0 / max(math.sqrt(area_sum), 1e-20)
    g = gutter_texels / (ref_resolution * scale0)
    pad = 0.5 * g
    pos_stride = max(1, grid_cols // 1024)
    pad_w = bbox_w + 2.0 * pad
    pad_h = bbox_h + 2.0 * pad
    total = float((pad_w * pad_h).sum())

    uvs_of = [None] * n_charts
    for c in range(n_charts):
        uvs_of[c] = chart_uv[group_order[bounds[c]:bounds[c + 1]]] + pad

    best = None
    f = 1.0
    seen = set()
    for _ in range(max(pack_iters, 1)):
        key = round(f, 3)
        if key in seen:
            break
        seen.add(key)
        t0 = time.time()
        # instrumented _blf_pack: also capture claimed cells at this f
        atlas_w = max(math.sqrt(total) * f, pad_w.max() + 1e-12)
        cell = atlas_w / grid_cols
        order = np.argsort(-(pad_w * pad_h), kind="stable")
        rows = grid_cols * 3
        spans = []
        hcells = []
        for c in order:
            w_cols = max(int(math.ceil(pad_w[c] / cell)), 1)
            sp = C._chart_spans(uvs_of[c], min(w_cols, grid_cols), cell, pad,
                                rows)
            spans.append(sp)
            hcells.append(int(sp[2].max()) if sp[2].size else 1)
        occ = np.zeros((rows, grid_cols), bool)
        placed = C._grid_fill(occ, spans, hcells, stride=pos_stride)

        origin = np.zeros((n_charts, 2))
        ys = np.nonzero(occ.any(axis=1))[0]
        top_y = (int(ys.max()) + 1) * cell if ys.size else 0.0
        x = 0.0
        shelf_h = 0.0
        n_shelf = 0
        for j, c in enumerate(order):
            if uvs_of[c].shape[0] == 0:
                continue
            if placed[j][0] >= 0:
                origin[c] = (placed[j][0] * cell + pad,
                             placed[j][1] * cell + pad)
                continue
            n_shelf += 1
            if x + pad_w[c] > atlas_w and x > 0.0:
                top_y += shelf_h
                x = 0.0
                shelf_h = 0.0
            origin[c] = (x + pad, top_y + pad)
            x += pad_w[c]
            shelf_h = max(shelf_h, pad_h[c])

        final = chart_uv + origin[chart_of][:, None, :]
        ext = final.reshape(-1, 2).max(axis=0) + pad
        side = float(max(ext[0], ext[1]))
        cov = float(areas.sum() / (side * side))
        claimed = float(occ.sum()) * cell * cell
        span_overhead = (claimed - float(areas.sum())) / (side * side)
        pack_air = (side * side - claimed) / (side * side)
        print(f"  f={f:.3f}: side={side:.3f} cov={cov:.3f} "
              f"span_overhead={span_overhead:.3f} pack_air={pack_air:.3f} "
              f"shelf={n_shelf} ({time.time()-t0:.0f}s)")
        if best is None or side < best[0]:
            best = (side, cov, span_overhead, pack_air)
        bal = float(ext[1]) / atlas_w
        f *= math.sqrt(min(max(bal, 0.25), 4.0))

    side, cov, span_overhead, pack_air = best
    print(f"BEST: coverage={cov:.4f}  span_overhead={span_overhead:.4f} "
          f"pack_air={pack_air:.4f}")
    # per-chart overhead estimate: perimeter * effective pad width
    print(f"charts={live}  cell_texels={side and ref_resolution * 0 or 0}")


if __name__ == "__main__":
    args = sys.argv[1:]
    probe(grid_cols=int(args[0]) if len(args) > 0 else 512,
          pack_iters=int(args[1]) if len(args) > 1 else 3,
          gutter_texels=float(args[2]) if len(args) > 2 else 2.0)
