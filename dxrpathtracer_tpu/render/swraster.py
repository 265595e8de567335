"""Software-raster primary visibility — dense-math replacement for the
depth-1 closest-hit traversal on camera rays.

The reference rasterizes this exact workload in its forward path
(MeshRenderer::RenderMainPass, MeshRenderer.cpp:369-485); in the path tracer
the same visibility comes from DispatchRays (RayTrace.hlsl:92-127). On TPU
the packet BVH traversal for primaries costs ~200 ms of a 1080p frame in
serialized row gathers (PERF_NOTES.md round-3 decomposition) — but camera
rays are STRUCTURED: every primary ray passes through a known screen tile,
so visibility can be computed as "binned ray casting":

  host, once per camera restart (the camera is fixed across progressive
  samples — the same amortization the sun-space grid uses):
    project all triangles with the view-projection matrix, clip against the
    near plane (primary rays START on the near plane — raygen unprojects
    z=0 — so clip-w < near is exactly unhittable), compute conservative
    screen bboxes, and emit (tile, triangle) pairs sorted by tile.

  device, per sample:
    one Moller-Trumbore test of each pair's triangle against all K pixels
    of its tile — dense VPU blocks fed by TWO row gathers (triangle row +
    tile pixel-block row) per PAIR instead of ~7 gathered BVH rows per RAY
    (~350k pairs vs 2.07M rays at 1080p); a segmented min-scan along the
    tile-sorted pair axis reduces candidates to the closest hit per pixel,
    and one exact re-test of each pixel's winner recovers (t, u, v) with
    the traversal's own arithmetic.

Exactness: the inner test is the SAME Moller-Trumbore expression over the
SAME (v0, e1, e2) triangle rows (accel/history.build_tri_table) and the same
per-pixel rays the traversal would use, and the binning is conservative
(every triangle a ray can hit at t in [t_min, t_max) has clip-w >= near at
the hit and projects into that ray's sample position, hence its tile), so
the candidate set is a superset of the traversal's hit set and the min-t
winner matches the BVH traversal result. The only permitted divergence is
tie-breaking between two triangles with bit-equal t (the scan takes the
lower triangle id; ordered descent takes the first found) — pinned by
tests/test_swraster.py.

Cites: RayTrace.hlsl:92-149 (the replaced dispatch), Timing.txt:1 (the
hardware-RT baseline this chases), VERDICT.md round-3 next-round #1b.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3e38)
_PAD_QUANTUM = 8192  # pair-count bucket: stabilizes shapes across cameras


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data),
                                     meta_fields=list(meta))
    return cls


@dataclasses.dataclass(frozen=True)
class RasterBins:
    """Binned (tile, triangle) work lists for one row slab + the shared
    exact triangle table. Host-built per (camera, slab); pair counts are
    bucketed to _PAD_QUANTUM so every slab of a frame shares one
    executable.

    Three device representations of the same pair set, by tile depth
    (every number from honest enqueued timing on the v5e, 2026-08-20):
      dense_tbl — the first K_DENSE triangles of every tile as a
        (n_tiles, K_DENSE) table: ONE batched gather + one fused
        (n_tiles, K_DENSE, K) broadcast MT + a level-axis min. ~4-5 ms at
        1080p-slab scale. (Per-level unrolled ops serialized on the TPU at
        ~1 ms of fixed overhead each; the pair-major layout's per-pair
        pixel-block gathers cost 13+ ms — both measured and rejected.)
      deep_* — tiles deeper than K_DENSE get a second dense table of
        K_DEEP more levels; only THEIR pixel blocks are gathered (a few
        hundred 4.6 KB rows, vs the pair-major phase gathering one per
        PAIR), then the same batched MT + min shape.
      pair_* — the remaining tail (tiles deeper than K_DENSE + K_DEEP),
        tile-sorted for the segmented min-scan. A handful of pairs for
        real cameras; empty pair arrays skip the phase at trace time.
    """

    dense_tbl: jax.Array   # (n_tiles, K_DENSE) i32 tri ids, -1 pad
    deep_tiles: jax.Array  # (D,) i32 tile id of each deep slot, -1 pad
    deep_tbl: jax.Array    # (D, K_DEEP) i32 tri ids, -1 pad
    deep_slot: jax.Array   # (n_tiles,) i32 deep slot of tile, -1 if shallow
    pair_tri: jax.Array    # (P,) i32 tail tri ids, -1 on padding
    pair_tile: jax.Array   # (P,) i32 tile index (clipped in-range)
    pair_first: jax.Array  # (P, 1) f32 1.0 at each tile-segment start
    seg_last: jax.Array    # (n_tiles,) i32 index of tile's last pair, -1 empty
    tri_table: jax.Array   # (T, 9) f32 v0/e1/e2 rows (accel/history layout)
    ty: int = 8            # packet tile dims (static)
    tx: int = 16
    # True when alpha-material triangles were masked OUT of the bins (the
    # split-table alpha design's opaque-only step). False bins hold EVERY
    # triangle and may serve FORCE_OPAQUE dispatches — including the
    # punch-through loop's resumed rounds (per-lane t_min is honored).
    opaque_only: bool = False


_register(RasterBins, meta=("ty", "tx", "opaque_only"))

K_DENSE = 64   # dense levels per tile (>= p90 of per-tile counts at 1080p)
K_DEEP = 256   # extra levels for deep tiles
_DEEP_QUANTUM = 128


def project_tri_bboxes(positions, tri_idx, view_proj, near, width,
                       total_height):
    """Host projection phase, shared by every slab of a frame: conservative
    continuous-pixel bboxes (global coords) + on-screen-possible mask.
    Returns (ok, pxmin, pxmax, pymin, pymax)."""
    f64 = np.float64
    v = positions[tri_idx]                      # (T, 3, 3)
    vp = np.asarray(view_proj, f64)
    hom = v.astype(f64) @ vp[:3, :] + vp[3, :]  # (T, 3, 4) row-vector
    w = hom[..., 3]

    # Candidate projected points: vertices with w >= near + near-plane edge
    # crossings (6 masked slots). Clipping at w = near is exact, not
    # heuristic: primary rays start on the near plane, so no hit can have
    # clip-w below it.
    T = len(v)
    pts_x = np.zeros((T, 6), f64)
    pts_y = np.zeros((T, 6), f64)
    valid = np.zeros((T, 6), bool)
    for i in range(3):
        j = (i + 1) % 3
        wi, wj = w[:, i], w[:, j]
        ok = wi >= near
        safe_w = np.maximum(wi, near)
        valid[:, 2 * i] = ok
        pts_x[:, 2 * i] = np.where(ok, hom[:, i, 0] / safe_w, 0.0)
        pts_y[:, 2 * i] = np.where(ok, hom[:, i, 1] / safe_w, 0.0)
        cross = ok != (wj >= near)
        denom = np.where(wi == wj, 1.0, wi - wj)
        tpar = np.where(cross, (wi - near) / denom, 0.0)
        cx = hom[:, i, 0] + (hom[:, j, 0] - hom[:, i, 0]) * tpar
        cy = hom[:, i, 1] + (hom[:, j, 1] - hom[:, i, 1]) * tpar
        valid[:, 2 * i + 1] = cross
        pts_x[:, 2 * i + 1] = np.where(cross, cx / near, 0.0)
        pts_y[:, 2 * i + 1] = np.where(cross, cy / near, 0.0)

    big = 1e30
    xmin = np.where(valid, pts_x, big).min(1)
    xmax = np.where(valid, pts_x, -big).max(1)
    ymin = np.where(valid, pts_y, big).min(1)
    ymax = np.where(valid, pts_y, -big).max(1)

    # NDC -> continuous pixel/sample coords (raygen mapping with the FULL
    # image height: ncd_x = px/(W/2) - 1, ncd_y = -(py/(H/2) - 1)); +-0.5 px
    # conservative pad absorbs f64-projection-vs-f32-ray slack. Jitter needs
    # no extra pad: tiles partition continuous sample coordinates.
    pxmin = (xmin + 1.0) * width * 0.5 - 0.5
    pxmax = (xmax + 1.0) * width * 0.5 + 0.5
    pymin = (1.0 - ymax) * total_height * 0.5 - 0.5   # global rows
    pymax = (1.0 - ymin) * total_height * 0.5 + 0.5
    ok = valid.any(1) & (pxmax >= 0) & (pxmin < width)
    return ok, pxmin, pxmax, pymin, pymax


def bin_pairs_host(bboxes, width, slab_h, row0, ty, tx):
    """Conservative (tile, tri) pair emission for one row slab from the
    shared projection (project_tri_bboxes); host numpy.

    Returns (pair_tri, pair_tile, pair_first, seg_last) with pairs sorted by
    tile. Tile g covers pixels [gy*ty, gy*ty+ty) x [gx*tx, gx*tx+tx) of the
    SLAB-LOCAL image, g = gy * (width // tx) + gx — exactly the packet tile
    of lanes [g*ty*tx, (g+1)*ty*tx) after integrator._tile_order.
    """
    ok, pxmin, pxmax, pymin_g, pymax_g = bboxes
    pymin = pymin_g - row0   # slab-local
    pymax = pymax_g - row0
    T = len(pxmin)

    ntx = width // tx
    nty = slab_h // ty
    n_tiles = ntx * nty
    on = ok & (pymax >= 0) & (pymin < slab_h)
    with np.errstate(invalid="ignore"):
        cx0 = np.clip(np.floor(pxmin / tx), 0, ntx - 1).astype(np.int64)
        cx1 = np.clip(np.floor(pxmax / tx), 0, ntx - 1).astype(np.int64)
        cy0 = np.clip(np.floor(pymin / ty), 0, nty - 1).astype(np.int64)
        cy1 = np.clip(np.floor(pymax / ty), 0, nty - 1).astype(np.int64)
    nx = np.where(on, cx1 - cx0 + 1, 0)
    nyc = np.where(on, cy1 - cy0 + 1, 0)
    counts = nx * nyc
    offsets = np.concatenate([[0], np.cumsum(counts)])
    P = int(offsets[-1])

    # vectorized expansion: pair p of triangle i has k = p - offsets[i]
    tri_of = np.repeat(np.arange(T, dtype=np.int64), counts)
    k = np.arange(P, dtype=np.int64) - np.repeat(offsets[:-1], counts)
    nx_of = nx[tri_of]
    gy = cy0[tri_of] + k // nx_of
    gx = cx0[tri_of] + k % nx_of
    tile = gy * ntx + gx

    order = np.argsort(tile, kind="stable")
    tile_s = tile[order]
    tri_s = tri_of[order]
    first = np.ones(P, bool)
    if P > 1:
        first[1:] = tile_s[1:] != tile_s[:-1]
    seg_last = np.full(n_tiles, -1, np.int64)
    if P:
        starts = np.flatnonzero(first)
        ends = np.concatenate([starts[1:] - 1, [P - 1]])
        seg_last[tile_s[starts]] = ends
    return (tri_s.astype(np.int32), tile_s.astype(np.int32), first,
            seg_last.astype(np.int32))


def build_raster_bins(positions, tri_idx, view_proj, near, width,
                      total_height, slab_h, row0, ty, tx, tri_table,
                      pad_to=None, bboxes=None, opaque_only=False):
    """Host binning -> device RasterBins for one slab. pad_to (optional)
    forces the padded pair count (use max over slabs so one executable
    serves all); bboxes (optional) reuses a project_tri_bboxes result
    across slabs; opaque_only marks bins whose bboxes were pre-masked to
    opaque materials (see RasterBins.opaque_only)."""
    if bboxes is None:
        bboxes = project_tri_bboxes(positions, tri_idx, view_proj, near,
                                    width, total_height)
    tri_s, tile_s, first, seg_last = bin_pairs_host(
        bboxes, width, slab_h, row0, ty, tx)
    n_tiles = (width // tx) * (slab_h // ty)

    # split by rank-within-tile: [0, K_DENSE) -> dense table;
    # [K_DENSE, K_DENSE + K_DEEP) -> per-deep-tile table; the tail stays
    # pair-major for the scan path.
    P_all = len(tri_s)
    dense = np.full((n_tiles, K_DENSE), -1, np.int32)
    deep_slot = np.full(n_tiles, -1, np.int64)
    deep_tiles = np.zeros(0, np.int64)
    deep = np.zeros((0, K_DEEP), np.int32)
    if P_all:
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.concatenate([starts, [P_all]]))
        rank = np.arange(P_all) - np.repeat(starts, seg_len)
        in_dense = rank < K_DENSE
        dense[tile_s[in_dense], rank[in_dense]] = tri_s[in_dense]
        in_deep = ~in_dense & (rank < K_DENSE + K_DEEP)
        deep_tiles = np.unique(tile_s[in_deep])
        deep_slot[deep_tiles] = np.arange(len(deep_tiles))
        deep = np.full((len(deep_tiles), K_DEEP), -1, np.int32)
        deep[deep_slot[tile_s[in_deep]],
             rank[in_deep] - K_DENSE] = tri_s[in_deep]
        tail = ~in_dense & ~in_deep
        tri_s = tri_s[tail]
        tile_s = tile_s[tail]
        # rebuild segment structure for the tail subset
        P_ovf = len(tri_s)
        first = np.ones(P_ovf, bool)
        if P_ovf > 1:
            first[1:] = tile_s[1:] != tile_s[:-1]
        seg_last = np.full(n_tiles, -1, np.int64)
        if P_ovf:
            o_starts = np.flatnonzero(first)
            o_ends = np.concatenate([o_starts[1:] - 1, [P_ovf - 1]])
            seg_last[tile_s[o_starts]] = o_ends

    # bucket the deep-tile count so slabs/cameras share executables
    d = len(deep_tiles)
    d_pad = 0 if d == 0 else -(-d // _DEEP_QUANTUM) * _DEEP_QUANTUM
    if pad_to is not None and isinstance(pad_to, tuple):
        pad_to, d_pad_req = pad_to
        d_pad = max(d_pad, d_pad_req)
    if d_pad > d:
        deep_tiles = np.concatenate(
            [deep_tiles, np.full(d_pad - d, -1, np.int64)])
        deep = np.concatenate(
            [deep, np.full((d_pad - d, K_DEEP), -1, np.int32)], axis=0)

    P = len(tri_s)
    P_pad = pad_to if pad_to is not None else pad_quantum(P)
    assert P_pad >= P
    pad = P_pad - P
    if pad:
        # padded pairs: own segment (first=True at the boundary), tri = -1,
        # tile clipped in-range so the pixel-block gather stays valid
        tri_s = np.concatenate([tri_s, np.full(pad, -1, np.int32)])
        tile_s = np.concatenate(
            [tile_s, np.zeros(pad, np.int32)])
        first = np.concatenate([first, np.zeros(pad, bool)])
        first[P] = True
    return RasterBins(
        dense_tbl=jnp.asarray(dense),
        deep_tiles=jnp.asarray(deep_tiles.astype(np.int32)),
        deep_tbl=jnp.asarray(deep),
        deep_slot=jnp.asarray(deep_slot.astype(np.int32)),
        pair_tri=jnp.asarray(tri_s.astype(np.int32)),
        pair_tile=jnp.asarray(tile_s.astype(np.int32)),
        pair_first=jnp.asarray(first.astype(np.float32)[:, None]),
        seg_last=jnp.asarray(seg_last.astype(np.int32)),
        tri_table=tri_table, ty=int(ty), tx=int(tx),
        opaque_only=bool(opaque_only)), P


def pad_quantum(p):
    """Pair-count bucket; 0 stays 0 (no overflow -> the pair-major phase is
    skipped entirely at trace time)."""
    if p == 0:
        return 0
    return max(_PAD_QUANTUM, -(-p // _PAD_QUANTUM) * _PAD_QUANTUM)


def _mt_blocks(tt, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Moller-Trumbore with the EXACT expression order of
    accel/traverse._intersect_leaf (bit-parity requirement). tt: (P, 9)
    triangle rows broadcast against (P, K) pixel blocks. Returns
    (t, accept)."""
    v0x, v0y, v0z = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    e1x, e1y, e1z = tt[:, 3:4], tt[:, 4:5], tt[:, 5:6]
    e2x, e2y, e2z = tt[:, 6:7], tt[:, 7:8], tt[:, 8:9]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx_ = ox - v0x
    ty_ = oy - v0y
    tz_ = oz - v0z
    u = (tx_ * px + ty_ * py + tz_ * pz) * inv_det
    qx = ty_ * e1z - tz_ * e1y
    qy = tz_ * e1x - tx_ * e1z
    qz = tx_ * e1y - ty_ * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t >= tmin) & (t < tmax))
    return t, u, v, ok


def _levels_min(tri_table, tbl, comps, act, K):
    """Batched level-table visibility: MT of tbl[r, k] against row r's K
    pixels for all (r, k) at once, min-reduced over k with lowest-id
    tie-break. tbl: (R, KD) i32 tri ids (-1 pad); comps: 8 (R, K) pixel
    component arrays; act: (R, K) bool. Returns (best_t, best_id)."""
    R, kd = tbl.shape
    tt = jnp.take(tri_table, jnp.maximum(tbl.reshape(-1), 0), axis=0)
    t3, _u3, _v3, ok3 = _mt_blocks(
        tt,
        *(jnp.broadcast_to(c[:, None, :], (R, kd, K)).reshape(-1, K)
          for c in comps))
    t3 = t3.reshape(R, kd, K)
    ok3 = (ok3.reshape(R, kd, K) & act[:, None, :]
           & (tbl >= 0)[:, :, None])
    key3 = jnp.where(ok3, t3, _BIG)
    best_t = jnp.min(key3, axis=1)                          # (R, K)
    id_big = jnp.int32(2**31 - 1)
    ids3 = jnp.where(ok3, tbl[:, :, None], id_big)
    id_min = jnp.min(jnp.where(key3 <= best_t[:, None, :], ids3, id_big),
                     axis=1)
    return best_t, jnp.where(best_t < _BIG, id_min, -1)


def raster_closest_hit(bins: RasterBins, ray_o, ray_d, t_min, t_max,
                       active=None):
    """Closest-hit over packet-tiled primary rays via the binned pair lists.

    ray_o/ray_d/t_min/t_max/active: (N, ...) lane arrays in PACKET-TILE
    order (each K = ty*tx consecutive lanes = one tile, matching the bins).
    Returns a HitRecord bit-matching accel/traverse.closest_hit up to
    equal-t tie order (see module docstring).
    """
    from ..accel.traverse import HitRecord
    K = bins.ty * bins.tx
    n = ray_o.shape[0]
    assert n % K == 0
    n_tiles = n // K
    f32 = jnp.float32
    t_min = jnp.broadcast_to(jnp.asarray(t_min, f32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, f32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)

    # Per-tile pixel blocks — reshapes of the lane arrays, NEVER gathered.
    ox, oy, oz = (ray_o[:, c].reshape(n_tiles, K) for c in range(3))
    dx, dy, dz = (ray_d[:, c].reshape(n_tiles, K) for c in range(3))
    tmn = t_min.reshape(n_tiles, K)
    tmx = t_max.reshape(n_tiles, K)
    act = active.reshape(n_tiles, K)

    # ---- dense phase: ALL K_DENSE levels of every tile in ONE batched
    # broadcast MT + a min-reduce over the level axis. One big gather
    # (n_tiles * K_DENSE rows) + fused (n_tiles, KD, K) elementwise math:
    # a per-level unrolled loop was 64 tiny serialized ops' worth of fixed
    # overhead on the TPU (measured ~1 ms/level — ops execute one at a
    # time; there is no cross-op overlap to hide small gathers in).
    comps = (ox, oy, oz, dx, dy, dz, tmn, tmx)
    best_t, best_id = _levels_min(bins.tri_table, bins.dense_tbl, comps,
                                  act, K)

    # ---- deep phase: tiles deeper than K_DENSE get K_DEEP more levels;
    # ONLY their pixel blocks are gathered (a few hundred rows) and the
    # same batched MT + min runs at (D, K_DEEP, K).
    if bins.deep_tiles.shape[0]:
        dt = jnp.maximum(bins.deep_tiles, 0)
        comps_d = tuple(jnp.take(c, dt, axis=0) for c in comps)
        act_d = (jnp.take(act, dt, axis=0)
                 & (bins.deep_tiles >= 0)[:, None])
        deep_t, deep_id = _levels_min(bins.tri_table, bins.deep_tbl,
                                      comps_d, act_d, K)
        # merge back per tile (scatter-free: each tile gathers its slot)
        ds = bins.deep_slot                                 # (n_tiles,)
        mt_ = jnp.take(deep_t, jnp.maximum(ds, 0), axis=0)
        mid_ = jnp.take(deep_id, jnp.maximum(ds, 0), axis=0)
        has = (ds >= 0)[:, None]
        mt_ = jnp.where(has, mt_, _BIG)
        mid_ = jnp.where(has, mid_, -1)
        take_d = ((mid_ >= 0)
                  & ((mt_ < best_t) | ((mt_ == best_t) & (mid_ < best_id))))
        best_t = jnp.where(take_d, mt_, best_t)
        best_id = jnp.where(take_d, mid_, best_id)

    # ---- overflow phase: pair-major + segmented min-scan ----
    if bins.pair_tri.shape[0]:
        blk9 = jnp.concatenate(
            [ox, oy, oz, dx, dy, dz, tmn, tmx, act.astype(f32)], axis=1)
        blk = jnp.take(blk9, bins.pair_tile, axis=0)        # (P, 9K)
        tt = jnp.take(bins.tri_table,
                      jnp.maximum(bins.pair_tri, 0), axis=0)
        t, _u, _v, ok = _mt_blocks(
            tt, blk[:, 0:K], blk[:, K:2 * K], blk[:, 2 * K:3 * K],
            blk[:, 3 * K:4 * K], blk[:, 4 * K:5 * K], blk[:, 5 * K:6 * K],
            blk[:, 6 * K:7 * K], blk[:, 7 * K:8 * K])
        ok = ok & (blk[:, 8 * K:9 * K] > 0.0) & (bins.pair_tri >= 0)[:, None]
        key = jnp.where(ok, t, _BIG)                        # (P, K)
        tid = jnp.where(ok, bins.pair_tri[:, None], -1)

        # Segmented min-scan along the pair axis (segments = tiles); a
        # start flag resets the running min. Associative, so
        # lax.associative_scan's log-depth evaluation is exact. Ties in t
        # take the lower triangle id.
        def comb(a, b):
            fa, ka, ia = a
            fb, kb, ib = b
            b_wins = (kb < ka) | ((kb == ka) & (ib < ia))
            reset = fb > 0.0
            kk = jnp.where(reset, kb, jnp.where(b_wins, kb, ka))
            ii = jnp.where(reset, ib, jnp.where(b_wins, ib, ia))
            return (jnp.maximum(fa, fb), kk, ii)

        _, kf, idf = jax.lax.associative_scan(
            comb, (bins.pair_first, key, tid), axis=0)

        safe_last = jnp.maximum(bins.seg_last, 0)
        ov_t = jnp.take(kf, safe_last, axis=0)              # (n_tiles, K)
        ov_id = jnp.take(idf, safe_last, axis=0)
        has_ovf = (bins.seg_last >= 0)[:, None]
        ov_t = jnp.where(has_ovf, ov_t, _BIG)
        ov_id = jnp.where(has_ovf, ov_id, -1)
        take_ovf = ((ov_id >= 0)
                    & ((ov_t < best_t) | ((ov_t == best_t)
                                          & (ov_id < best_id))))
        best_t = jnp.where(take_ovf, ov_t, best_t)
        best_id = jnp.where(take_ovf, ov_id, best_id)

    tri_id = best_id.reshape(n)
    hit = tri_id >= 0

    # Exact re-test of each pixel's winner with its own ray: one (N,) row
    # gather + the identical MT — recovers (t, u, v) with the traversal's
    # own arithmetic (the scan's t is already the same expression; this
    # re-test exists to produce u/v without carrying them through the scan).
    rows = jnp.take(bins.tri_table, jnp.maximum(tri_id, 0), axis=0)  # (N, 9)
    rt, ru, rv, rok = _mt_blocks(
        rows, ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3],
        ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3],
        t_min[:, None], t_max[:, None])
    rt, ru, rv = rt[:, 0], ru[:, 0], rv[:, 0]

    out_t = jnp.where(hit, rt, t_max)
    return HitRecord(t=out_t,
                     tri_id=jnp.where(hit, tri_id, -1),
                     u=jnp.where(hit, ru, 0.0),
                     v=jnp.where(hit, rv, 0.0))
