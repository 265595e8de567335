"""Wide-BVH construction (host-side) with a TPU-tuned unified record layout.

TPU-native replacement for the reference's driver-built DXR acceleration
structures (BuildRTAccelerationStructure, DXRPathTracer.cpp:2331-2488): the
reference hands one BLAS's geometry descs to the D3D12 driver and gets an
opaque hardware BVH; here we own the build.

Design is driven by measured TPU gather behavior: gathers are ROW-count bound
(~constant cost per row up to 512B rows), so traversal wants FEW, WIDE rows.
Hence an 8-ary BVH over the morton-sorted triangle order whose every node —
internal or leaf — is ONE 128-float (512B) record in a single unified table:

  internal record (SoA over the 8 children):
    [0:8)   loX   [8:16)  loY   [16:24) loZ
    [24:32) hiX   [32:40) hiY   [40:48) hiZ
    [48:56) bitcast(child codes)   [56:128) zero
    child code: >= 0 -> internal row index; < 0 -> ~leaf row index;
    empty slots have inverted bounds (never hit) and code 0.
  leaf record (up to LEAF_SIZE=12 packed triangles, SoA over the slots,
  stride L = LEAF_SIZE):
    [0:L) v0x [L:2L) v0y [2L:3L) v0z
    [3L:4L) e1x [4L:5L) e1y [5L:6L) e1z
    [6L:7L) e2x [7L:8L) e2y [8L:9L) e2z
    [9L:10L) bitcast(tri_id)   [10L:128) zero
    padded slots have tri_id == -1 and degenerate zero edges (never hit).
    L=12 fills the 512B row (10*12=120 slots): a leaf VISIT costs one gather
    regardless of how many triangles it tests (the 12-wide Moller-Trumbore
    is a free VPU block op), so bigger leaves = fewer rows per ray.

Both record types are SoA so every field the traversal touches is a CONTIGUOUS
8-wide block slice of the gathered (N, 128) buffer — scalar column slices
re-stream the full 512B row each (measured, PERF_NOTES.md), which is why the
leaf layout matches the internal one instead of packing triangles AoS.

One gather per traversal step fetches everything the step needs; 8-ary
branching keeps the tree ~6 levels deep for Sponza-class scenes, so the
lockstep wavefront loop runs tens of iterations instead of hundreds.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WIDTH = 8          # children per internal node
LEAF_SIZE = 12     # triangles per leaf record (10*L <= RECORD)
RECORD = 128       # f32 slots per unified record (512 B)


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_rows", "num_tris", "num_leaves", "leaf_size",
                          "max_depth", "root_code", "width",
                          "has_alpha_flags"))
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    table: jax.Array  # (num_rows, RECORD) f32 unified records
    num_rows: int = 0
    num_tris: int = 0
    num_leaves: int = 0
    leaf_size: int = LEAF_SIZE
    max_depth: int = 16   # tree depth (stack sizing: (WIDTH-1) * max_depth)
    root_code: int = 0    # >= 0 internal row; < 0 ~leaf row (single-leaf scene)
    # children per internal node. width == 8 is the classic f32-AABB layout;
    # width in (16, 32) uses the bf16 internal layout (conservative directed
    # rounding — see build_table_numpy_sah_wide), leaves unchanged in f32.
    width: int = WIDTH
    # leaf tri-id slots carry bit 30 = "alpha-tested material" (flag_alpha
    # _tris post-pass): the traversal reads the flag from the already-
    # streamed record (zero extra gathers) to collect alpha candidates
    # in-loop; leaf intersectors strip the bit before returning tri ids.
    has_alpha_flags: bool = False


ALPHA_TID_BIT = np.int32(1 << 30)   # flag bit inside leaf tri-id slots


def _leaf_rows(table: np.ndarray, root_code: int, width: int):
    """Host BFS over the packed table: returns the leaf row ids. Child
    codes live at [48:56) (W8) or [3W:4W) (wide bf16 layout); empty child
    slots store code 0, which cannot be a real child (row 0 is the root)."""
    leaves = []
    if root_code < 0:
        return [~root_code]
    if width == 8:
        code_lo, code_hi = 48, 56
    else:
        code_lo, code_hi = 3 * width, 4 * width
    stack = [root_code]
    seen = set()
    while stack:
        rid = stack.pop()
        if rid in seen:
            continue
        seen.add(rid)
        codes = table[rid, code_lo:code_hi].view(np.int32)
        for c in codes:
            c = int(c)
            if c == 0:
                continue  # empty slot
            if c < 0:
                leaves.append(~c)
            else:
                stack.append(c)
    return leaves


def flag_alpha_tris(table: np.ndarray, root_code: int, width: int,
                    tri_alpha: np.ndarray | None,
                    tri_ids: np.ndarray | None = None) -> np.ndarray:
    """Leaf tri-id post-pass on the HOST packed table (works for every
    builder, native included); padded slots (tid == -1) are untouched.

    tri_alpha: OR ALPHA_TID_BIT into slots whose triangle has an
    alpha-tested material. tri_ids: remap local build indices to global
    scene triangle ids FIRST (for sub-geometry tables, e.g. the alpha-only
    table — the builder numbers triangles 0..T_sub, but shading/accept
    lookups need scene ids)."""
    L = LEAF_SIZE
    for rid in _leaf_rows(table, root_code, width):
        tids = table[rid, 9 * L:10 * L].view(np.int32).copy()
        valid = tids >= 0
        if tri_ids is not None:
            tids[valid] = np.asarray(tri_ids, np.int32)[tids[valid]]
        if tri_alpha is not None:
            flag = np.zeros_like(tids, bool)
            flag[valid] = np.asarray(tri_alpha, bool)[tids[valid]]
            tids[flag] |= ALPHA_TID_BIT
        table[rid, 9 * L:10 * L] = tids.view(np.float32)
    return table


def morton_codes_30(centroids: np.ndarray) -> np.ndarray:
    """30-bit morton codes from (T, 3) centroids, 10 bits per axis."""
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    ext = np.maximum(hi - lo, 1e-9)
    q = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)

    def expand_bits(v):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    return (expand_bits(q[:, 0]) * 4 + expand_bits(q[:, 1]) * 2 + expand_bits(q[:, 2])).astype(np.uint32)


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = LEAF_SIZE, use_native: bool = True,
              mode: str = "sah", width: int = WIDTH,
              tri_alpha: np.ndarray | None = None,
              tri_ids: np.ndarray | None = None) -> FlatBVH:
    """Build a FlatBVH from (T, 3) triangle vertices (host numpy -> device).

    mode="sah" (default) is the quality build — binned SAH collapsed wide,
    the analog of the reference's PREFER_FAST_TRACE driver build
    (DXRPathTracer.cpp:2428); mode="morton" is the fast-build analog
    (eighth-splits of the morton order). width=8 is the classic f32-AABB
    layout; width in (16, 32) emits bf16 internal records
    (build_table_numpy_sah_wide). Uses the native C++ builders
    (native/{sah,lbvh}_builder.cpp via ctypes) when available; the numpy
    paths are the bit-identical reference implementations.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    num_tris = v0.shape[0]
    assert num_tris > 0
    assert leaf_size <= LEAF_SIZE
    assert mode in ("sah", "morton")

    packed = None
    if width != WIDTH:
        assert mode == "sah", "wide records are SAH-only"
        from . import native
        if use_native:
            packed = native.build_packed_sah_wide(v0, v1, v2, leaf_size, width)
        if packed is None:
            packed = build_table_numpy_sah_wide(v0, v1, v2, leaf_size, width)
    elif use_native:
        from . import native
        if mode == "sah":
            packed = native.build_packed_sah(v0, v1, v2, leaf_size)
        else:
            packed = native.build_packed(v0, v1, v2, leaf_size)
    if packed is None:
        build = build_table_numpy_sah if mode == "sah" else build_table_numpy
        packed = build(v0, v1, v2, leaf_size)

    table, num_rows, num_leaves, depth, root_code = packed
    has_flags = tri_alpha is not None and bool(np.asarray(tri_alpha).any())
    if has_flags or tri_ids is not None:
        table = np.ascontiguousarray(table)
        flag_alpha_tris(table, int(root_code), int(width),
                        tri_alpha if has_flags else None, tri_ids=tri_ids)
    return FlatBVH(table=jnp.asarray(table), num_rows=int(num_rows),
                   num_tris=int(num_tris), num_leaves=int(num_leaves),
                   leaf_size=int(leaf_size), max_depth=int(depth) + 2,
                   root_code=int(root_code), width=int(width),
                   has_alpha_flags=has_flags)


def build_table_numpy(v0, v1, v2, leaf_size: int = LEAF_SIZE):
    """Reference host build. Returns (table, num_rows, num_leaves, depth,
    root_code)."""
    num_tris = v0.shape[0]
    centroids = (v0 + v1 + v2) / 3.0
    order = np.argsort(morton_codes_30(centroids), kind="stable").astype(np.int64)
    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    tri_lo = np.minimum(np.minimum(sv0, sv1), sv2)
    tri_hi = np.maximum(np.maximum(sv0, sv1), sv2)
    # Prefix min/max over the sorted order enable O(1) range AABBs via
    # cummin arrays (numpy: use np.minimum.accumulate both directions is not
    # enough for arbitrary ranges; we compute per-node AABBs bottom-up below).

    # --- BFS 8-ary construction over contiguous morton ranges ---
    nodes = []         # per row: dict(lo, hi (range), children list or None)
    levels = []
    ranges = [(0, num_tris)]
    rows = [(0, num_tris)]
    # First pass: assign rows in BFS order
    row_ranges = []
    row_is_leaf = []
    level_slices = []
    cur = ranges
    while cur:
        start_row = len(row_ranges)
        nxt = []
        for (lo, hi) in cur:
            row_ranges.append((lo, hi))
            if hi - lo > leaf_size:
                row_is_leaf.append(False)
                cnt = hi - lo
                bounds = [lo + (cnt * k) // WIDTH for k in range(WIDTH + 1)]
                for k in range(WIDTH):
                    nxt.append((bounds[k], bounds[k + 1]))
            else:
                row_is_leaf.append(True)
        level_slices.append((start_row, len(row_ranges)))
        cur = nxt
    depth = len(level_slices)
    n_rows = len(row_ranges)
    row_is_leaf = np.asarray(row_is_leaf)
    row_ranges = np.asarray(row_ranges, np.int64)
    num_leaves = int(row_is_leaf.sum())

    # children row ids: BFS order means each level's children are laid out
    # consecutively after it, WIDTH per internal node in order.
    child_row = np.full((n_rows, WIDTH), -1, np.int64)
    for li, (s, e) in enumerate(level_slices[:-1]):
        base = level_slices[li + 1][0]
        internal_ids = np.arange(s, e)[~row_is_leaf[s:e]]
        for j, rid in enumerate(internal_ids):
            child_row[rid] = base + j * WIDTH + np.arange(WIDTH)

    # AABBs bottom-up
    lo_arr = np.empty((n_rows, 3), np.float32)
    hi_arr = np.empty((n_rows, 3), np.float32)
    for li in range(depth - 1, -1, -1):
        s, e = level_slices[li]
        for rid in range(s, e):
            l, h = row_ranges[rid]
            if row_is_leaf[rid]:
                lo_arr[rid] = tri_lo[l:h].min(axis=0)
                hi_arr[rid] = tri_hi[l:h].max(axis=0)
            else:
                ch = child_row[rid]
                lo_arr[rid] = lo_arr[ch].min(axis=0)
                hi_arr[rid] = hi_arr[ch].max(axis=0)

    # codes: unified row index; leaves encoded as ~row
    code_of = np.where(row_is_leaf, ~np.arange(n_rows), np.arange(n_rows)).astype(np.int32)

    table = np.zeros((n_rows, RECORD), np.float32)
    # leaf records: SoA blocks [v0x v0y v0z e1x e1y e1z e2x e2y e2z tid],
    # each LEAF_SIZE slots wide.
    leaf_ids = np.where(row_is_leaf)[0]
    sorted_tri_id = order.astype(np.int32)
    e1 = sv1 - sv0
    e2 = sv2 - sv0
    neg1 = np.float32(np.int32(-1).view(np.float32))
    table[leaf_ids, 9 * LEAF_SIZE:10 * LEAF_SIZE] = neg1  # pad: tid = -1
    for k in range(min(leaf_size, LEAF_SIZE)):
        sel = (row_ranges[leaf_ids, 1] - row_ranges[leaf_ids, 0]) > k
        rid = leaf_ids[sel]
        src = row_ranges[rid, 0] + k
        for comp, arr in enumerate((sv0, e1, e2)):
            for ax in range(3):
                table[rid, (comp * 3 + ax) * LEAF_SIZE + k] = arr[src, ax]
        table[rid, 9 * LEAF_SIZE + k] = sorted_tri_id[src].view(np.float32)

    # internal records
    int_ids = np.where(~row_is_leaf)[0]
    if int_ids.size:
        ch = child_row[int_ids]  # (I, 8)
        # empty-child handling not needed: count > leaf_size >= 8 guarantees
        # nonempty children; still guard against degenerate leaf_size < 8.
        valid = ch >= 0
        ch_safe = np.maximum(ch, 0)
        inf = np.float32(3e38)
        for ax in range(3):
            lo_c = np.where(valid, lo_arr[ch_safe, ax], inf)
            hi_c = np.where(valid, hi_arr[ch_safe, ax], -inf)
            table[int_ids, 0 + ax * WIDTH + 0:0 + ax * WIDTH + WIDTH] = lo_c
            table[int_ids, 24 + ax * WIDTH + 0:24 + ax * WIDTH + WIDTH] = hi_c
        codes = np.where(valid, code_of[ch_safe], 0).astype(np.int32)
        table[int_ids, 48:56] = codes.view(np.float32)

    root_code = int(code_of[0])
    return table, int(n_rows), num_leaves, depth, root_code


def _sah_topology(v0, v1, v2, leaf_size: int, bins: int = 16,
                  width: int = WIDTH):
    """Binned binary SAH + collapse to `width`-wide: the shared topology phase
    of both the unified-record emitter (build_table_numpy_sah) and the
    split-table MXU emitter (build_split_tables_numpy_sah).

    Returns (order, rows_is_leaf, rows_range, rows_child, rows_box, depth)
    where rows_* are BFS-ordered over the collapsed wide tree. All FP
    decisions in f32 with the same expression order as
    native/sah_builder.cpp (bit-identity requirement)."""
    import sys
    f32 = np.float32
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    num_tris = v0.shape[0]
    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    cent = ((v0 + v1 + v2) / f32(3.0)).astype(f32)
    order = np.arange(num_tris, dtype=np.int64)

    b_lo, b_hi, b_left, b_right = [], [], [], []
    boxes_lo, boxes_hi = [], []

    def half_area(lo, hi):
        d = np.maximum(hi - lo, f32(0.0))
        return f32(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(limit, 10000))

    def build(lo, hi):
        sel = order[lo:hi]
        node_lo = tlo[sel].min(axis=0)
        node_hi = thi[sel].max(axis=0)
        idx = len(b_lo)
        b_lo.append(lo)
        b_hi.append(hi)
        b_left.append(-1)
        b_right.append(-1)
        boxes_lo.append(node_lo)
        boxes_hi.append(node_hi)
        count = hi - lo
        if count <= leaf_size:
            return idx

        clo_v = cent[sel].min(axis=0)
        ext3 = cent[sel].max(axis=0) - clo_v

        # All-axes binned SAH (strict < keeps the lowest axis on ties —
        # matched exactly by native/sah_builder.cpp for bit-identity).
        best_cost = f32(3e38)
        best_axis = -1
        best_split = -1
        best_bidx = None
        for axis in range(3):
            ext = ext3[axis]
            if not ext > 0.0:
                continue
            scale = f32(bins) / ext
            bidx = np.clip(((cent[sel, axis] - clo_v[axis]) * scale).astype(np.int32),
                           0, bins - 1)
            counts = np.bincount(bidx, minlength=bins)
            bin_lo = np.full((bins, 3), 3e38, f32)
            bin_hi = np.full((bins, 3), -3e38, f32)
            for bb in range(bins):
                m = bidx == bb
                if m.any():
                    bin_lo[bb] = tlo[sel[m]].min(axis=0)
                    bin_hi[bb] = thi[sel[m]].max(axis=0)
            racc_lo = np.empty((bins, 3), f32)
            racc_hi = np.empty((bins, 3), f32)
            acc_lo = np.full(3, 3e38, f32)
            acc_hi = np.full(3, -3e38, f32)
            for bb in range(bins - 1, 0, -1):
                acc_lo = np.minimum(acc_lo, bin_lo[bb])
                acc_hi = np.maximum(acc_hi, bin_hi[bb])
                racc_lo[bb] = acc_lo
                racc_hi[bb] = acc_hi
            lacc_lo = np.full(3, 3e38, f32)
            lacc_hi = np.full(3, -3e38, f32)
            lcnt = 0
            for bb in range(bins - 1):
                lacc_lo = np.minimum(lacc_lo, bin_lo[bb])
                lacc_hi = np.maximum(lacc_hi, bin_hi[bb])
                lcnt += int(counts[bb])
                rcnt = count - lcnt
                if lcnt == 0 or rcnt == 0:
                    continue
                cost = f32(half_area(lacc_lo, lacc_hi) * f32(lcnt)
                           + half_area(racc_lo[bb + 1], racc_hi[bb + 1]) * f32(rcnt))
                if cost < best_cost:
                    best_cost = cost
                    best_axis = axis
                    best_split = bb
                    best_bidx = bidx

        if best_axis < 0:
            mid = lo + count // 2
        else:
            keep = best_bidx <= best_split
            order[lo:hi] = np.concatenate([sel[keep], sel[~keep]])
            mid = lo + int(keep.sum())

        li = build(lo, mid)
        ri = build(mid, hi)
        b_left[idx] = li
        b_right[idx] = ri
        return idx

    root = build(0, num_tris)
    sys.setrecursionlimit(limit)

    # --- collapse binary -> 8-wide, BFS row emission (mirrors the C++) ---
    rows_is_leaf, rows_range, rows_child, rows_box = [], [], [], []

    def make_row(bn):
        rid = len(rows_is_leaf)
        rows_is_leaf.append(b_left[bn] < 0)
        rows_range.append((b_lo[bn], b_hi[bn]))
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
                pick = -1
                best_area = f32(-1.0)
                for i, r in enumerate(roots):
                    if b_left[r] < 0:
                        continue
                    a = half_area(boxes_lo[r], boxes_hi[r])
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

    return order, rows_is_leaf, rows_range, rows_child, rows_box, depth


def build_table_numpy_sah(v0, v1, v2, leaf_size: int = LEAF_SIZE, bins: int = 16):
    """Reference host build, SAH mode (see _sah_topology). Emits the unified
    512 B record table. Returns (table, num_rows, num_leaves, depth,
    root_code)."""
    f32 = np.float32
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    order, rows_is_leaf, rows_range, rows_child, rows_box, depth = \
        _sah_topology(v0, v1, v2, leaf_size, bins)

    # --- emit unified records ---
    n_rows = len(rows_is_leaf)
    num_leaves = sum(rows_is_leaf)
    table = np.zeros((n_rows, RECORD), np.float32)
    neg1 = np.float32(np.int32(-1).view(np.float32))
    L = LEAF_SIZE
    for rid in range(n_rows):
        if rows_is_leaf[rid]:
            lo, hi = rows_range[rid]
            sel = order[lo:hi]
            m = len(sel)
            table[rid, 9 * L:10 * L] = neg1
            table[rid, 0 * L:0 * L + m] = v0[sel, 0]
            table[rid, 1 * L:1 * L + m] = v0[sel, 1]
            table[rid, 2 * L:2 * L + m] = v0[sel, 2]
            table[rid, 3 * L:3 * L + m] = v1[sel, 0] - v0[sel, 0]
            table[rid, 4 * L:4 * L + m] = v1[sel, 1] - v0[sel, 1]
            table[rid, 5 * L:5 * L + m] = v1[sel, 2] - v0[sel, 2]
            table[rid, 6 * L:6 * L + m] = v2[sel, 0] - v0[sel, 0]
            table[rid, 7 * L:7 * L + m] = v2[sel, 1] - v0[sel, 1]
            table[rid, 8 * L:8 * L + m] = v2[sel, 2] - v0[sel, 2]
            table[rid, 9 * L:9 * L + m] = sel.astype(np.int32).view(np.float32)
        else:
            for k in range(WIDTH):
                ch = rows_child[rid][k]
                if ch < 0:
                    table[rid, [0 + k, 8 + k, 16 + k]] = 3e38
                    table[rid, [24 + k, 32 + k, 40 + k]] = -3e38
                    continue
                clo, chi = rows_box[ch]
                table[rid, [0 + k, 8 + k, 16 + k]] = clo
                table[rid, [24 + k, 32 + k, 40 + k]] = chi
                code = np.int32(~ch if rows_is_leaf[ch] else ch)
                table[rid, 48 + k] = code.view(np.float32)

    root_code = int(np.int32(~0 if rows_is_leaf[0] else 0))
    return table, n_rows, num_leaves, depth, root_code


def bf16_conservative(x: np.ndarray, up: bool) -> np.ndarray:
    """Directed-rounded bfloat16 of f32 `x`, returned as uint16 bit patterns.

    up=False rounds toward -inf (AABB lo), up=True toward +inf (AABB hi):
    the bf16 box always CONTAINS the f32 box, so a wide-record traversal
    over bf16 internal nodes stays exact — it can only admit spurious
    descents (~2^-9 relative inflation), never miss a hit. Truncating the
    low 16 bits rounds positive values toward -inf and negative values
    toward +inf; the other direction bumps the magnitude one ulp."""
    b = np.ascontiguousarray(x, np.float32).view(np.uint32)
    hi16 = b >> np.uint32(16)
    rem = (b & np.uint32(0xFFFF)) != 0
    neg = (b >> np.uint32(31)).astype(bool)
    bump = rem & (~neg if up else neg)
    return (hi16 + bump.astype(np.uint32)).astype(np.uint16)


def build_table_numpy_sah_wide(v0, v1, v2, leaf_size: int = LEAF_SIZE,
                               width: int = 16, bins: int = 16):
    """SAH build emitting the WIDE unified 512 B record layout: `width`-ary
    internal nodes with conservatively-rounded bfloat16 child AABBs, f32
    leaves identical to the classic layout.

    Motivation (tools/microbench_gather_width.py): the per-row gather cost is
    flat in row width up to 512 B, so the only way to buy a wider fanout
    (fewer internal visits per ray — tools/sim_record_width.py) without
    paying wider rows is to halve the AABB bytes. bf16 with directed
    rounding keeps results exact (leaf Moller-Trumbore stays f32).

    Internal record layout (W = width, H = W/2, slots are f32):
      [0 : 3W)   bf16 pairs, DE-INTERLEAVED: slot j of each field holds
                 child j in its LOW 16 bits and child j+H in its HIGH 16
                 bits, so each half decodes to a contiguous (m, H) block
                 with pure integer ops — no cross-lane relayout in the
                 traversal body (see traverse._child_banks).
      [3W : 4W)  bitcast(int32 child codes), natural child order
      W=16 uses 64 of 128 slots; W=32 exactly fills the 512 B record.
    Returns (table, num_rows, num_leaves, depth, root_code)."""
    f32 = np.float32
    assert width in (16, 32) and width * 4 <= RECORD
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    order, rows_is_leaf, rows_range, rows_child, rows_box, depth = \
        _sah_topology(v0, v1, v2, leaf_size, bins, width=width)

    n_rows = len(rows_is_leaf)
    num_leaves = sum(rows_is_leaf)
    table = np.zeros((n_rows, RECORD), np.float32)
    neg1 = np.float32(np.int32(-1).view(np.float32))
    L = LEAF_SIZE
    W = width
    for rid in range(n_rows):
        if rows_is_leaf[rid]:
            lo, hi = rows_range[rid]
            sel = order[lo:hi]
            m = len(sel)
            table[rid, 9 * L:10 * L] = neg1
            table[rid, 0 * L:0 * L + m] = v0[sel, 0]
            table[rid, 1 * L:1 * L + m] = v0[sel, 1]
            table[rid, 2 * L:2 * L + m] = v0[sel, 2]
            table[rid, 3 * L:3 * L + m] = v1[sel, 0] - v0[sel, 0]
            table[rid, 4 * L:4 * L + m] = v1[sel, 1] - v0[sel, 1]
            table[rid, 5 * L:5 * L + m] = v1[sel, 2] - v0[sel, 2]
            table[rid, 6 * L:6 * L + m] = v2[sel, 0] - v0[sel, 0]
            table[rid, 7 * L:7 * L + m] = v2[sel, 1] - v0[sel, 1]
            table[rid, 8 * L:8 * L + m] = v2[sel, 2] - v0[sel, 2]
            table[rid, 9 * L:9 * L + m] = sel.astype(np.int32).view(np.float32)
        else:
            # gather child boxes/codes (empty slots: inverted bounds, code 0)
            clo = np.full((W, 3), 3e38, f32)
            chi = np.full((W, 3), -3e38, f32)
            codes = np.zeros((W,), np.int32)
            for k in range(W):
                ch = rows_child[rid][k]
                if ch < 0:
                    continue
                clo[k], chi[k] = rows_box[ch]
                codes[k] = np.int32(~ch if rows_is_leaf[ch] else ch)
            # bf16 pack: per axis, W lo values -> W/2 f32 slots (pair-packed)
            vals16 = np.empty((6, W), np.uint16)
            for ax in range(3):
                vals16[ax] = bf16_conservative(clo[:, ax], up=False)
                vals16[3 + ax] = bf16_conservative(chi[:, ax], up=True)
            H = W // 2
            packed = (vals16[:, :H].astype(np.uint32)
                      | (vals16[:, H:].astype(np.uint32) << np.uint32(16)))
            table[rid, 0:3 * W] = packed.reshape(-1).view(np.float32)
            table[rid, 3 * W:4 * W] = codes.view(np.float32)

    root_code = int(np.int32(~0 if rows_is_leaf[0] else 0))
    return table, n_rows, num_leaves, depth, root_code


# ---------------------------------------------------------------------------
# Split-table layout for the MXU (fat-leaf) traversal — accel/mxu.py.
#
# The unified 512 B record caps leaves at 12 triangles because a leaf visit is
# one gather and the Moller-Trumbore runs on the VPU. The MXU traversal
# instead intersects a whole leaf against a 128-ray packet as a batched
# matmul of ray Plucker features x precomputed triangle columns, so leaves
# can be FAT (64 tris): the tree gets ~4x shallower, the walk loop ~5x
# shorter, and the per-pair flops move from the VPU to the MXU (SURVEY.md
# 'MXU: matmuls are where the FLOPs are').

MXU_LEAF = 64                      # triangles per fat leaf
INT_ROW = 64                       # f32 slots per internal record (256 B)
LEAF_ROW = 10 * MXU_LEAF + 8       # v0'/e1/e2 SoA + tid + anchor + pad


@partial(_register, meta=("num_int_rows", "num_leaves", "num_tris",
                          "leaf_size", "max_depth", "root_code"))
@dataclasses.dataclass(frozen=True)
class SplitBVH:
    """Split internal/leaf tables for the MXU traversal.

    int_table rows: [0:8) loX [8:16) loY [16:24) loZ [24:32) hiX [32:40) hiY
    [40:48) hiZ [48:56) bitcast(child codes) [56:64) zero. Child code >= 0 is
    an internal row index; < 0 is ~leaf_id; empty slots have inverted bounds.

    leaf_table rows (L = MXU_LEAF): slots [k*L:(k+1)*L) for k = v0'x v0'y
    v0'z e1x e1y e1z e2x e2y e2z tid; [10L:10L+3) = leaf anchor (AABB center;
    vertices are stored anchor-relative so the matmul's Plucker moments stay
    leaf-local — precision equals classic f32 Moller-Trumbore, validated in
    tests). Padded slots have tid == -1 and zero edges."""

    int_table: jax.Array   # (I, INT_ROW) f32
    leaf_table: jax.Array  # (NL, LEAF_ROW) f32
    num_int_rows: int = 0
    num_leaves: int = 0
    num_tris: int = 0
    leaf_size: int = MXU_LEAF
    max_depth: int = 16
    root_code: int = 0


def build_split_tables_numpy_sah(v0, v1, v2, leaf_size: int = MXU_LEAF,
                                 bins: int = 16):
    """SAH build emitting the split MXU layout. Returns (int_table,
    leaf_table, depth, root_code)."""
    f32 = np.float32
    v0 = np.asarray(v0, f32)
    v1 = np.asarray(v1, f32)
    v2 = np.asarray(v2, f32)
    L = leaf_size
    assert L <= MXU_LEAF
    order, rows_is_leaf, rows_range, rows_child, rows_box, depth = \
        _sah_topology(v0, v1, v2, leaf_size, bins)

    n_rows = len(rows_is_leaf)
    # renumber: internal rows and leaves get separate dense indices
    int_idx = np.full(n_rows, -1, np.int64)
    leaf_idx = np.full(n_rows, -1, np.int64)
    ni = nl = 0
    for rid in range(n_rows):
        if rows_is_leaf[rid]:
            leaf_idx[rid] = nl
            nl += 1
        else:
            int_idx[rid] = ni
            ni += 1

    int_table = np.zeros((max(ni, 1), INT_ROW), f32)
    leaf_table = np.zeros((max(nl, 1), LEAF_ROW), f32)
    neg1 = np.float32(np.int32(-1).view(np.float32))
    leaf_table[:, 9 * L:10 * L] = neg1

    for rid in range(n_rows):
        if rows_is_leaf[rid]:
            li = leaf_idx[rid]
            lo, hi = rows_range[rid]
            sel = order[lo:hi]
            m = len(sel)
            blo, bhi = rows_box[rid]
            anchor = ((blo + bhi) * f32(0.5)).astype(f32)
            leaf_table[li, 10 * L:10 * L + 3] = anchor
            leaf_table[li, 0 * L:0 * L + m] = v0[sel, 0] - anchor[0]
            leaf_table[li, 1 * L:1 * L + m] = v0[sel, 1] - anchor[1]
            leaf_table[li, 2 * L:2 * L + m] = v0[sel, 2] - anchor[2]
            leaf_table[li, 3 * L:3 * L + m] = v1[sel, 0] - v0[sel, 0]
            leaf_table[li, 4 * L:4 * L + m] = v1[sel, 1] - v0[sel, 1]
            leaf_table[li, 5 * L:5 * L + m] = v1[sel, 2] - v0[sel, 2]
            leaf_table[li, 6 * L:6 * L + m] = v2[sel, 0] - v0[sel, 0]
            leaf_table[li, 7 * L:7 * L + m] = v2[sel, 1] - v0[sel, 1]
            leaf_table[li, 8 * L:8 * L + m] = v2[sel, 2] - v0[sel, 2]
            leaf_table[li, 9 * L:9 * L + m] = sel.astype(np.int32).view(f32)
        else:
            ii = int_idx[rid]
            for k in range(WIDTH):
                ch = rows_child[rid][k]
                if ch < 0:
                    int_table[ii, [0 + k, 8 + k, 16 + k]] = 3e38
                    int_table[ii, [24 + k, 32 + k, 40 + k]] = -3e38
                    continue
                clo, chi = rows_box[ch]
                int_table[ii, [0 + k, 8 + k, 16 + k]] = clo
                int_table[ii, [24 + k, 32 + k, 40 + k]] = chi
                code = np.int32(~leaf_idx[ch] if rows_is_leaf[ch]
                                else int_idx[ch])
                int_table[ii, 48 + k] = code.view(f32)

    root_code = int(np.int32(~leaf_idx[0] if rows_is_leaf[0] else int_idx[0]))
    return int_table, leaf_table, depth, root_code


def build_split_bvh(v0, v1, v2, leaf_size: int = MXU_LEAF,
                    bins: int = 16) -> SplitBVH:
    """Build a SplitBVH (host numpy -> device) for the MXU traversal."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    packed = None
    from . import native
    packed = native.build_packed_sah_split(v0, v1, v2, leaf_size)
    if packed is None:
        packed = build_split_tables_numpy_sah(v0, v1, v2, leaf_size)
    int_table, leaf_table, depth, root_code = packed
    return SplitBVH(int_table=jnp.asarray(int_table),
                    leaf_table=jnp.asarray(leaf_table),
                    num_int_rows=int(int_table.shape[0]),
                    num_leaves=int(leaf_table.shape[0]),
                    num_tris=int(v0.shape[0]), leaf_size=int(leaf_size),
                    max_depth=int(depth) + 2, root_code=int(root_code))


def build_bvh_for_scene(scene, positions=None, tri_idx=None,
                        width: int = WIDTH,
                        flag_alpha: bool = False) -> FlatBVH:
    """Build from a Scene pytree. Pass host-numpy `positions`/`tri_idx` when
    available to avoid device->host readbacks (slow over the TPU tunnel).

    flag_alpha=True marks alpha-material triangles in the leaf tri-id slots
    (ALPHA_TID_BIT) so the packet traversal can collect alpha candidates
    in-loop — used by the K-candidate punch replacement."""
    pos = positions if positions is not None else np.asarray(scene.positions)
    tri = tri_idx if tri_idx is not None else np.asarray(scene.tri_idx)
    tri_alpha = None
    if flag_alpha and getattr(scene.materials, "any_opacity", False):
        tri_mat = np.asarray(scene.tri_material)
        has_op = np.asarray(scene.materials.has_opacity, bool)
        tri_alpha = has_op[tri_mat]
    return build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]],
                     width=width, tri_alpha=tri_alpha)
