"""Sun-space occlusion grid — O(1) cell lookup + chain walk for sun shadows.

The sun direction is FIXED per progressive-render restart (the reference
restarts accumulation when SunDirection changes, DXRPathTracer.cpp:
1416-1461), so every sun-NEE shadow ray in a frame is a translate of the
same ray: in a sun-aligned frame all of them are VERTICAL. A general BVH
answers that with a full 3D traversal (~40-90 lockstep steps after
compaction); this module answers it with ONE flat-grid lookup plus a short
triangle-chain walk (~4 records on Sponza-class scenes).

Design (v2 — measured on the v5e; the v1 hierarchical descent with
per-level internal records spent more on its own record streaming than it
saved in iterations):

  * A fixed S x S (power-of-8) grid over the sun-plane XY. The query is
    closed-form — cell = floor((p - g0) * inv) — so there are NO internal
    records and NO descent loop: a (S*S,) i32 index array maps the cell to
    its chain head. One narrow gather replaces the whole walk down.
  * Triangles are binned by projected XY AABB. An adaptive 8x8 recursion
    (in exact integer index-space, consistent with the closed-form query)
    decides placement: triangles spanning > DUP_MAX child ranges of a node
    become that node's RESIDENT chain; the rest push down. Every leaf
    range's chain links its tail to the parent's resident chain, which
    links to the grandparent's, ... so each cell sees ONE merged chain
    covering everything above it and resident records are SHARED between
    sibling subtrees instead of duplicated.
  * Chain records hold 12 world-space triangles in the exact SoA layout of
    accel/lbvh.py leaves plus [next code, suffix-zmax, own-zmax]: the
    suffix-zmax (max sun-depth over this record AND its whole linked tail)
    lets a lane abandon the rest of the chain the moment no remaining
    triangle can sit between it and the sun; own-zmax skips just this
    record's tests. Within a chain records are sorted by zmax descending
    so the abandon fires as early as possible.

CORRECTNESS IS EXACT, not approximate: records store WORLD-SPACE v0/e1/e2
and the kernel runs the identical Moller-Trumbore block
(`traverse._intersect_leaf`), so an accepted hit here is accepted by
`traverse.any_hit` and vice versa. The grid is only a conservative index:
a vertical ray's sun-XY is constant along the ray (d.ax = d.ay = 0), so
every triangle it intersects has a projected AABB covering the query point
and is reachable through the cell's merged chain. Build inflates projected
AABBs (and zmax) by a scene-diagonal epsilon to absorb f32 basis rounding
in that argument; binning and query use the same monotone f32 expressions.

Reference analog: none (DXR hardware-traverses the one BVH for every ray
class); this is TPU-first specialization of the RayTrace.hlsl:249,296
shadow TraceRay calls for the fixed-direction light.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh import LEAF_SIZE, RECORD
from .traverse import (_bitcast_i32, _intersect_leaf, pad_traversal_args,
                       quarantine_pad_count)

DONE = np.int32(0x7FFFFFFF)   # sentinel: empty / lane finished
_L = LEAF_SIZE                # triangles per chain record (shared layout)
_NEXT_SLOT = 10 * _L          # i32 next code (~row), DONE at chain end
_SUFZ_SLOT = 10 * _L + 1      # f32 max sun-depth of this record + all next
_OWNZ_SLOT = 10 * _L + 2      # f32 max sun-depth of this record alone

# Compaction (same rationale as traverse.py): the chain walk is short on
# average but lockstep pays the longest chain; phases keep paid rows near
# the mean.
MIN_COMPACT_SIZE = 8192
MAX_COMPACT_PHASES = 4
UNROLL = 2


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data),
                                     meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_rows", "grid_size"))
@dataclasses.dataclass(frozen=True)
class SunGrid:
    table: jax.Array   # (R, RECORD) f32 chain records (layout above)
    index: jax.Array   # (S*S,) i32 chain-head code per cell (row-major y*S+x)
    params: jax.Array  # (4,) f32: gx0, gy0, inv_fx, inv_fy (point -> cell)
    basis: jax.Array   # (3, 3) f32 rows: ax, ay, w (w = unit sun dir)
    num_rows: int = 0
    grid_size: int = 512


def sun_basis(sun_dir: np.ndarray) -> np.ndarray:
    """Orthonormal (ax, ay, w) with w = normalized sun_dir, f32."""
    f32 = np.float32
    w = np.asarray(sun_dir, f32)
    w = w / f32(np.linalg.norm(w))
    up = np.asarray([0.0, 0.0, 1.0] if abs(float(w[2])) < 0.9
                    else [1.0, 0.0, 0.0], f32)
    ax = np.cross(up, w).astype(f32)
    ax = ax / f32(np.linalg.norm(ax))
    ay = np.cross(w, ax).astype(f32)
    return np.stack([ax, ay, w]).astype(f32)


def build_sun_grid(v0, v1, v2, sun_dir, leaf_cap: int = 24, dup_max: int = 9,
                   grid_size: int = 512) -> SunGrid:
    """Host build from (T, 3) world-space triangle vertices (numpy).

    grid_size: finest cells per axis (power of 8 recommended; the adaptive
               recursion splits 8x8 per level in index space).
    leaf_cap:  stop subdividing below this many triangles.
    dup_max:   a triangle overlapping more than this many child ranges of a
               node joins the node's shared resident chain instead.
    """
    f32 = np.float32
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    T = v0.shape[0]
    assert T > 0
    S = int(grid_size)
    basis = sun_basis(sun_dir)
    ax, ay, w = basis

    # Projected per-triangle XY AABBs + max sun depth, inflated by a
    # scene-diagonal epsilon (covers f32 basis/projection rounding in the
    # exactness argument above).
    px = np.stack([v0 @ ax, v1 @ ax, v2 @ ax])  # (3, T)
    py = np.stack([v0 @ ay, v1 @ ay, v2 @ ay])
    pz = np.stack([v0 @ w, v1 @ w, v2 @ w])
    lox, hix = px.min(axis=0), px.max(axis=0)
    loy, hiy = py.min(axis=0), py.max(axis=0)
    gx0, gx1 = f32(lox.min()), f32(hix.max())
    gy0, gy1 = f32(loy.min()), f32(hiy.max())
    diag = float(np.hypot(gx1 - gx0, gy1 - gy0))
    pad = f32(1e-5 * diag + 1e-6)
    lox = (lox - pad).astype(f32)
    hix = (hix + pad).astype(f32)
    loy = (loy - pad).astype(f32)
    hiy = (hiy + pad).astype(f32)
    zmax_t = (pz.max(axis=0) + pad).astype(f32)

    # Finest-cell ranges per triangle, with the SAME f32 expressions the
    # kernel uses for query points (monotone => conservative coverage).
    inv_fx = f32(S) / max(f32(gx1) - f32(gx0) + 2 * pad, f32(1e-9))
    inv_fy = f32(S) / max(f32(gy1) - f32(gy0) + 2 * pad, f32(1e-9))
    ox0 = f32(gx0 - pad)
    oy0 = f32(gy0 - pad)
    fcx0 = np.clip(np.floor((lox - ox0) * inv_fx), 0, S - 1).astype(np.int64)
    fcx1 = np.clip(np.floor((hix - ox0) * inv_fx), 0, S - 1).astype(np.int64)
    fcy0 = np.clip(np.floor((loy - oy0) * inv_fy), 0, S - 1).astype(np.int64)
    fcy1 = np.clip(np.floor((hiy - oy0) * inv_fy), 0, S - 1).astype(np.int64)

    e1 = v1 - v0
    e2 = v2 - v0
    neg1 = np.float32(np.int32(-1).view(np.float32))

    rows = []
    suffix_zmax_of = []  # parallel to rows

    def emit_chain(idx, tail_code, tail_zmax):
        """Chain records for `idx` (sorted zmax desc here), tail linked to
        `tail_code`. Returns (head_code, head_suffix_zmax)."""
        if idx.size == 0:
            return tail_code, tail_zmax
        idx = idx[np.argsort(-zmax_t[idx], kind="stable")]
        nxt, sufz = tail_code, tail_zmax
        chunks = [idx[i:i + _L] for i in range(0, idx.size, _L)]
        for chunk in reversed(chunks):
            row = np.zeros(RECORD, f32)
            m = chunk.size
            row[9 * _L:10 * _L] = neg1
            row[0 * _L:0 * _L + m] = v0[chunk, 0]
            row[1 * _L:1 * _L + m] = v0[chunk, 1]
            row[2 * _L:2 * _L + m] = v0[chunk, 2]
            row[3 * _L:3 * _L + m] = e1[chunk, 0]
            row[4 * _L:4 * _L + m] = e1[chunk, 1]
            row[5 * _L:5 * _L + m] = e1[chunk, 2]
            row[6 * _L:6 * _L + m] = e2[chunk, 0]
            row[7 * _L:7 * _L + m] = e2[chunk, 1]
            row[8 * _L:8 * _L + m] = e2[chunk, 2]
            row[9 * _L:9 * _L + m] = chunk.astype(np.int32).view(f32)
            own = zmax_t[chunk].max()
            sufz = max(sufz, own)
            row[_NEXT_SLOT] = np.int32(nxt).view(f32)
            row[_SUFZ_SLOT] = sufz
            row[_OWNZ_SLOT] = own
            rows.append(row)
            nxt = np.int32(~np.int32(len(rows) - 1))
        return nxt, sufz

    index = np.full(S * S, DONE, np.int32)
    NEG_INF = f32(-3e38)

    def fill(ix0, ix1, iy0, iy1, code):
        for yy in range(iy0, iy1):
            index[yy * S + ix0:yy * S + ix1] = code

    def build_node(idx, ix0, ix1, iy0, iy1, suffix_code, suffix_zmax):
        span = ix1 - ix0
        if idx.size <= leaf_cap or span < 8:
            # span < 8 would make step 0 below; emit the whole range as one
            # chain (correct for ANY grid_size, not just powers of 8 — a
            # non-power-of-8 size at 1024 silently mis-binned before this
            # guard: 64k wrong lanes in the A/B)
            code, _ = emit_chain(idx, suffix_code, suffix_zmax)
            fill(ix0, ix1, iy0, iy1, code)
            return
        step = span // 8
        # child-range span per triangle (integer math, exactly the ranges
        # the recursion uses; child 7 absorbs the remainder when span is
        # not divisible by 8, matching the //step binning with clip to 7)
        cx0 = np.clip((fcx0[idx] - ix0) // step, 0, 7)
        cx1 = np.clip((fcx1[idx] - ix0) // step, 0, 7)
        cy0 = np.clip((fcy0[idx] - iy0) // step, 0, 7)
        cy1 = np.clip((fcy1[idx] - iy0) // step, 0, 7)
        nspan = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        resident = nspan > dup_max
        res_code, res_zmax = emit_chain(idx[resident], suffix_code,
                                        suffix_zmax)
        small = idx[~resident]
        scx0, scx1 = cx0[~resident], cx1[~resident]
        scy0, scy1 = cy0[~resident], cy1[~resident]
        for cy in range(8):
            ym = (scy0 <= cy) & (cy <= scy1)
            jy0 = iy0 + cy * step
            jy1 = iy1 if cy == 7 else jy0 + step
            for cx in range(8):
                m = ym & (scx0 <= cx) & (cx <= scx1)
                jx0 = ix0 + cx * step
                jx1 = ix1 if cx == 7 else jx0 + step
                if not m.any():
                    fill(jx0, jx1, jy0, jy1, res_code)
                    continue
                build_node(small[m], jx0, jx1, jy0, jy1,
                           res_code, res_zmax)

    build_node(np.arange(T, dtype=np.int64), 0, S, 0, S, DONE, NEG_INF)
    table = np.stack(rows) if rows else np.zeros((1, RECORD), f32)
    params = np.asarray([ox0, oy0, inv_fx, inv_fy], f32)
    return SunGrid(table=jnp.asarray(table), index=jnp.asarray(index),
                   params=jnp.asarray(params), basis=jnp.asarray(basis),
                   num_rows=int(table.shape[0]), grid_size=S)


def build_sun_grid_for_scene(scene, sun_dir, positions=None, tri_idx=None,
                             **kw) -> SunGrid:
    """Build from a Scene pytree (host numpy positions preferred — device
    readbacks are slow over the TPU tunnel)."""
    pos = positions if positions is not None else np.asarray(scene.positions)
    tri = tri_idx if tri_idx is not None else np.asarray(scene.tri_idx)
    return build_sun_grid(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]],
                          sun_dir, **kw)


def _compact_perm(finished, m):
    unf = (~finished).astype(jnp.int32)
    fin = finished.astype(jnp.int32)
    n_unf = jnp.sum(unf)
    dest = jnp.where(finished, n_unf + jnp.cumsum(fin) - 1,
                     jnp.cumsum(unf) - 1)
    return jnp.zeros((m,), jnp.int32).at[dest].set(
        jnp.arange(m, dtype=jnp.int32))


def sun_any_hit(grid: SunGrid, ray_o, ray_d, t_min, t_max, active=None,
                accept_fn=None):
    """Sun-shadow visibility: (N,) f32 in {0, 1}, 1 = unoccluded.

    ray_d must be the (broadcast) sun direction the grid was built for —
    the triangle test runs in world space with these exact components, so
    results equal `traverse.any_hit(bvh, ...)` on the same rays.
    accept_fn(tri_id, u, v) is the alpha test; the walk is short enough
    (~4 records) that in-loop evaluation is cheap, unlike the 3D BVH where
    it forced the punch-through redesign (render/integrator.py).
    """
    n_out = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_out,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_out,))
    if active is None:
        active = jnp.ones((n_out,), jnp.bool_)
    # lane-count quarantine (traverse.py): this walk is a different loop
    # from the BVH lockstep, but it shares the compiled-shape-sensitive
    # while_loop/compaction structure the axon band bug lives in — pad the
    # same way rather than find out per-scene.
    pad = quarantine_pad_count(n_out)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    n = ray_o.shape[0]
    done = jnp.int32(DONE)
    S = grid.grid_size
    b = grid.basis
    p = grid.params
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    px = ox * b[0, 0] + oy * b[0, 1] + oz * b[0, 2]
    py = ox * b[1, 0] + oy * b[1, 1] + oz * b[1, 2]
    # an occluder needs sun-depth > origin depth + t_min
    thr = (ox * b[2, 0] + oy * b[2, 1] + oz * b[2, 2]) + t_min

    # O(1) descent: closed-form cell + one narrow index gather.
    fcx = jnp.clip(jnp.floor((px - p[0]) * p[2]), 0, S - 1).astype(jnp.int32)
    fcy = jnp.clip(jnp.floor((py - p[1]) * p[3]), 0, S - 1).astype(jnp.int32)
    head = jnp.take(grid.index, fcy * S + fcx, mode="clip")

    max_iters = grid.num_rows + 8
    lane = dict(
        idx=jnp.arange(n, dtype=jnp.int32),
        ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
        thr=thr, tmin=t_min,
        cur=jnp.where(active, head, done).astype(jnp.int32),
        bt=t_max.astype(jnp.float32),
        btri=jnp.full((n,), -1, jnp.int32),
        bu=jnp.zeros((n,), jnp.float32),
        bv=jnp.zeros((n,), jnp.float32),
    )
    keys_order = ("idx", "ox", "oy", "oz", "dx", "dy", "dz", "thr", "tmin",
                  "cur", "bt", "btri", "bu", "bv")
    CUR = keys_order.index("cur")

    def body(s):
        (idx, ox, oy, oz, dx, dy, dz, thr, tmin,
         cur, bt, btri, bu, bv, it) = s
        alive = cur != done
        row = jnp.where(alive, ~cur, 0)
        rec = jnp.take(grid.table, row, axis=0, mode="clip")  # the one gather
        # Narrow columns come off a small block slice (direct scalar slices
        # of `rec` re-stream the full 512 B rows — PERF_NOTES.md).
        tail = rec[:, _NEXT_SLOT:_NEXT_SLOT + 3]
        cut = alive & (tail[:, 1] < thr)    # suffix-zmax: abandon the rest
        test = alive & ~cut & (tail[:, 2] >= thr)   # own-zmax: skip record
        bt, btri, bu, bv = _intersect_leaf(
            None, rec, (ox, oy, oz), (dx, dy, dz), tmin, test,
            (bt, btri, bu, bv), accept_fn)
        nxt = jnp.where(cut, done, _bitcast_i32(tail[:, 0]))
        found = btri >= 0   # ACCEPT_FIRST_HIT_AND_END_SEARCH
        cur = jnp.where(alive & ~found, nxt, done)
        return (idx, ox, oy, oz, dx, dy, dz, thr, tmin,
                cur, bt, btri, bu, bv, it + 1)

    def body_unrolled(s):
        for _ in range(UNROLL):
            s = body(s)
        return s

    from .traverse import compact_knobs
    min_compact, max_phases = compact_knobs()
    sizes = [n]
    while (len(sizes) <= max_phases
           and sizes[-1] // 2 >= min_compact):
        sizes.append(sizes[-1] // 2)

    # Boundary compaction uses the same packed-row scheme as
    # traverse._traverse: separate per-array takes are independent
    # row-count-bound gathers (~5.7 ms each at 518k — they dominated the
    # walk), so the lane state moves as ONE (m, 14) row gather and exiting
    # lanes are delivered once at the end (visibility needs btri only).
    pack_f32 = ("ox", "oy", "oz", "dx", "dy", "dz", "thr", "tmin",
                "bt", "bu", "bv")
    pack_i32 = ("idx", "cur", "btri")

    def pack_lane(ln):
        cols = [ln[k] for k in pack_f32]
        cols += [jax.lax.bitcast_convert_type(ln[k], jnp.float32)
                 for k in pack_i32]
        return jnp.stack(cols, axis=1)

    def unpack_lane(pk):
        ln = {k: pk[:, j] for j, k in enumerate(pack_f32)}
        base = len(pack_f32)
        for j, k in enumerate(pack_i32):
            ln[k] = jax.lax.bitcast_convert_type(pk[:, base + j], jnp.int32)
        return ln

    idx_col = len(pack_f32) + pack_i32.index("idx")
    tri_col = len(pack_f32) + pack_i32.index("btri")

    it = jnp.zeros((), jnp.int32)
    exit_chunks = []
    for pi, size in enumerate(sizes):
        final = pi == len(sizes) - 1
        state = tuple(lane[k] for k in keys_order) + (it,)
        if final:
            def cond(s):
                return jnp.any(s[CUR] != done) & (s[-1] < max_iters)
        else:
            next_size = sizes[pi + 1]

            def cond(s, _ns=next_size):
                n_alive = jnp.sum((s[CUR] != done).astype(jnp.int32))
                return (n_alive > _ns) & (s[-1] < max_iters)
        state = jax.lax.while_loop(cond, body_unrolled, state)
        lane = dict(zip(keys_order, state[:-1]))
        it = state[-1]
        if not final:
            nxt = sizes[pi + 1]
            perm = _compact_perm(lane["cur"] == done, size)
            packed = jnp.take(pack_lane(lane), perm, axis=0)
            exit_chunks.append(packed[nxt:])
            lane = unpack_lane(packed[:nxt])

    if exit_chunks:
        allp = jnp.concatenate(
            exit_chunks + [pack_lane(lane)], axis=0)
        idx_all = jax.lax.bitcast_convert_type(allp[:, idx_col], jnp.int32)
        tri_all = jax.lax.bitcast_convert_type(allp[:, tri_col], jnp.int32)
        out_tri = jnp.zeros((n,), jnp.int32).at[idx_all].set(
            tri_all, unique_indices=True)
    else:
        out_tri = lane["btri"]

    return jnp.where(out_tri >= 0, 0.0, 1.0)[:n_out]
