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
  leaf record (up to LEAF_SIZE=8 packed triangles, SoA over the slots):
    [0:8) v0x [8:16) v0y [16:24) v0z
    [24:32) e1x [32:40) e1y [40:48) e1z
    [48:56) e2x [56:64) e2y [64:72) e2z
    [72:80) bitcast(tri_id)   [80:128) zero
    padded slots have tri_id == -1 and degenerate zero edges (never hit).

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
LEAF_SIZE = 8      # triangles per leaf record (power of 2: tournament reduce)
RECORD = 128       # f32 slots per unified record (512 B)


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_rows", "num_tris", "num_leaves", "leaf_size",
                          "max_depth", "root_code"))
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    table: jax.Array  # (num_rows, RECORD) f32 unified records
    num_rows: int = 0
    num_tris: int = 0
    num_leaves: int = 0
    leaf_size: int = LEAF_SIZE
    max_depth: int = 16   # tree depth (stack sizing: (WIDTH-1) * max_depth)
    root_code: int = 0    # >= 0 internal row; < 0 ~leaf row (single-leaf scene)


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
              leaf_size: int = LEAF_SIZE, use_native: bool = True) -> FlatBVH:
    """Build a FlatBVH from (T, 3) triangle vertices (host numpy -> device).

    Uses the native C++ builder (native/lbvh_builder.cpp via ctypes) when
    available; the numpy path is the bit-identical reference implementation.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    num_tris = v0.shape[0]
    assert num_tris > 0
    assert leaf_size <= LEAF_SIZE

    if use_native:
        from . import native
        packed = native.build_packed(v0, v1, v2, leaf_size)
        if packed is not None:
            table, num_rows, num_leaves, depth, root_code = packed
            return FlatBVH(table=jnp.asarray(table), num_rows=num_rows,
                           num_tris=int(num_tris), num_leaves=num_leaves,
                           leaf_size=int(leaf_size), max_depth=depth + 2,
                           root_code=root_code)

    table, num_rows, num_leaves, depth, root_code = build_table_numpy(
        v0, v1, v2, leaf_size)
    return FlatBVH(table=jnp.asarray(table),
                   num_rows=num_rows,
                   num_tris=int(num_tris), num_leaves=num_leaves,
                   leaf_size=int(leaf_size), max_depth=depth + 2,
                   root_code=root_code)


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


def build_bvh_for_scene(scene, positions=None, tri_idx=None) -> FlatBVH:
    """Build from a Scene pytree. Pass host-numpy `positions`/`tri_idx` when
    available to avoid device->host readbacks (slow over the TPU tunnel)."""
    pos = positions if positions is not None else np.asarray(scene.positions)
    tri = tri_idx if tri_idx is not None else np.asarray(scene.tri_idx)
    return build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]])
