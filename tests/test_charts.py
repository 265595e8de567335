"""Charted lightmap atlas tests (bake/charts.py — the xatlas equivalent)."""

import os
import numpy as np
import pytest

from dxrpathtracer_tpu.app.settings import Scenes
from dxrpathtracer_tpu.bake.charts import (build_charted_atlas,
                                           rasterize_texel_map)
from dxrpathtracer_tpu.scene.registry import load_scene


@pytest.fixture(scope="module")
def boxtest_atlas():
    scene, _ = load_scene(Scenes.BoxTest)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    return scene, pos, tri, build_charted_atlas(pos, tri)


def test_uvs_in_unit_square(boxtest_atlas):
    _, _, _, atlas = boxtest_atlas
    assert atlas.tri_uv.shape == (atlas.num_tris, 3, 2)
    assert atlas.tri_uv.min() >= 0.0 and atlas.tri_uv.max() <= 1.0


def test_no_chart_overlap(boxtest_atlas):
    """No texel may be claimed by triangles of two different charts: the
    rasterizer takes first-claim, so verify by rasterizing twice in opposite
    triangle order and comparing claimed-vs-unclaimed sets."""
    _, _, _, atlas = boxtest_atlas
    tm_f, _, _, _ = rasterize_texel_map(atlas.tri_uv, 256, dilate=0)
    tm_r, _, _, _ = rasterize_texel_map(atlas.tri_uv[::-1], 256, dilate=0)
    # coverage masks must agree; double-claimed interiors would differ by
    # more than the one-texel edge raster jitter
    disagree = ((tm_f >= 0) != (tm_r >= 0)).mean()
    assert disagree < 1e-3, f"chart overlap suspected: {disagree}"


def test_area_proportional_density(boxtest_atlas):
    """Texel density must scale with world area (the pair packer's flaw):
    each triangle's atlas area / world area should be near-constant."""
    _, pos, tri, atlas = boxtest_atlas
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    wa = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    uv = atlas.tri_uv.astype(np.float64)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    aa = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    ratio = aa / np.maximum(wa, 1e-12)
    big = wa > wa.max() * 1e-3
    spread = ratio[big].max() / ratio[big].min()
    assert spread < 1.2, f"texel density varies {spread:.2f}x across triangles"


def test_gutter_dilation_no_bleed(boxtest_atlas):
    """Every uncovered texel adjacent to a covered one must adopt a valid
    mapping after dilation (so bilinear lightmap taps at chart borders never
    mix in background zeros — the seam/gutter bleed test)."""
    _, _, _, atlas = boxtest_atlas
    tm0, _, _, _ = rasterize_texel_map(atlas.tri_uv, 256, dilate=0)
    tm2, bu2, bv2, _ = rasterize_texel_map(atlas.tri_uv, 256, dilate=2)
    covered0 = tm0 >= 0
    # texels within 1 ring of original coverage
    near = np.zeros_like(covered0)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            near |= np.roll(np.roll(covered0, sx, 0), sy, 1)
    ring = near & ~covered0
    assert (tm2[ring] >= 0).all(), "gutter ring texels missing a mapping"
    # adopted barycentrics stay inside the triangle
    u, v = bu2[ring], bv2[ring]
    assert (u >= -1e-5).all() and (v >= -1e-5).all() \
        and (u + v <= 1.0 + 1e-4).all()


def test_reconstruction_on_surface(boxtest_atlas):
    """(tri, bary) from the texel map reconstructs points on the tri plane."""
    scene, pos, tri, atlas = boxtest_atlas
    tm, bu, bv, _ = rasterize_texel_map(atlas.tri_uv, 128)
    sel = tm >= 0
    ti = tm[sel]
    u = bu[sel][:, None]
    v = bv[sel][:, None]
    p = pos[tri[ti, 0]] * (1 - u - v) + pos[tri[ti, 1]] * u + pos[tri[ti, 2]] * v
    n = np.cross(pos[tri[ti, 1]] - pos[tri[ti, 0]],
                 pos[tri[ti, 2]] - pos[tri[ti, 0]])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    d = np.abs(np.sum((p - pos[tri[ti, 0]]) * n, axis=1))
    assert d.max() < 1e-4


def _quad(verts, tris, x0, y0, x1, y1, z=0.0):
    """Append a quad (two triangles) in the z=const plane."""
    base = len(verts)
    verts += [(x0, y0, z), (x1, y0, z), (x1, y1, z), (x0, y1, z)]
    tris += [(base, base + 1, base + 2), (base, base + 2, base + 3)]


def test_small_chart_nests_inside_ring_hole():
    """The multi-span packer's reason to exist: a chart's interior HOLES must
    stay free for later charts. A square ring (outer 10x10, hole 4x4) and a
    separate 3x3 square: the square must land INSIDE the ring's hole, so the
    atlas side stays ~the ring's outer edge (a single-span [bottom, top]
    profile would claim the hole and push the square outside)."""
    # one edge-connected ring: 4 outer + 4 inner corners, 8 triangles
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    inner = [(3, 3), (7, 3), (7, 7), (3, 7)]
    verts = [(x, y, 0.0) for x, y in outer + inner]
    tris = []
    for k in range(4):
        o0, o1 = k, (k + 1) % 4
        i0, i1 = 4 + k, 4 + (k + 1) % 4
        tris += [(o0, o1, i1), (o0, i1, i0)]
    # disconnected small square (same plane, elsewhere in space)
    _quad(verts, tris, 20, 20, 23, 23)
    pos = np.asarray(verts, np.float64)
    tri = np.asarray(tris, np.int64)
    atlas = build_charted_atlas(pos, tri, grid_cols=512, pack_iters=2)

    uv = atlas.tri_uv.astype(np.float64)
    ring_uv = uv[:8].reshape(-1, 2)
    sq_uv = uv[8:].reshape(-1, 2)
    ring_lo, ring_hi = ring_uv.min(axis=0), ring_uv.max(axis=0)
    sq_lo, sq_hi = sq_uv.min(axis=0), sq_uv.max(axis=0)
    # the square sits strictly inside the ring's bbox (i.e., in its hole) …
    assert (sq_lo > ring_lo - 1e-9).all() and (sq_hi < ring_hi + 1e-9).all(), \
        f"square not nested: ring {ring_lo}-{ring_hi} square {sq_lo}-{sq_hi}"
    # … and does not overlap any ring triangle (rasterize both, no texel
    # claimed twice)
    tm_f, _, _, _ = rasterize_texel_map(atlas.tri_uv, 256, dilate=0)
    tm_r, _, _, _ = rasterize_texel_map(atlas.tri_uv[::-1], 256, dilate=0)
    assert (((tm_f >= 0) != (tm_r >= 0)).mean()) < 1e-3
    # nesting keeps the layout tight: ~93 world-area in a ~(10+gutters)^2 atlas
    assert atlas.coverage > 0.7, f"coverage {atlas.coverage:.3f}"


def test_theinn_coverage_beats_pair_packer():
    """The headline metric: texel coverage on theInn must beat the analytic
    pair packer's 69.3% uniform-density layout is replaced by
    area-proportional density; coverage is logged for PERF_NOTES."""
    scene, _ = load_scene(Scenes.Stronghold)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    if tri.shape[0] < 10000:
        pytest.skip("theInn FBX not available (stand-in scene)")
    # With half-gutter claims + the multi-span packer + bbox-guarded
    # hinge-unfold merging the cheap grid_cols=512/pack_iters=3
    # configuration measures 0.849 (history: 0.779 single-span, 0.820
    # multi-span+merge, 0.849 half-pad; unguarded merge regressed to
    # 0.678 — sprawling chain unfolds, see _merge_charts). Production
    # (grid_cols=2048, stride 2, pack_iters=4) measures 0.9063 — PERF_NOTES.
    atlas = build_charted_atlas(pos, tri, ref_resolution=4096,
                                grid_cols=512, pack_iters=3)
    assert atlas.coverage > 0.82, f"coverage {atlas.coverage:.3f}"
    # density check on the real scene too
    v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    wa = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    uv = atlas.tri_uv.astype(np.float64)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    aa = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    big = wa > np.percentile(wa, 90)
    ratio = aa[big] / wa[big]
    # planar chart projection compresses triangles tilted up to the 60-deg
    # growth cone by cos(60) = 0.5 worst case — ratio stays bounded by ~2
    # (the pair packer's uniform-cell density varied by ORDERS of magnitude
    # with 1/area)
    assert ratio.max() / ratio.min() < 2.2


@pytest.mark.skipif(not os.environ.get("DXRPT_SLOW_TESTS"),
                    reason="production-config pack takes ~3 min "
                           "(DXRPT_SLOW_TESTS=1 to run)")
def test_theinn_coverage_production_config():
    """Pin the headline >= 0.90 VERDICT criterion near the production
    config (grid_cols=2048, stride 2): measured 0.9063 on theInn @4096
    (tools/atlas_loss_probe.py; pack_iters=2 reaches the same best f)."""
    scene, _ = load_scene(Scenes.Stronghold)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    if tri.shape[0] < 10000:
        pytest.skip("theInn FBX not available (stand-in scene)")
    atlas = build_charted_atlas(pos, tri, ref_resolution=4096,
                                grid_cols=2048, pack_iters=2)
    assert atlas.coverage > 0.88, f"coverage {atlas.coverage:.3f}"
