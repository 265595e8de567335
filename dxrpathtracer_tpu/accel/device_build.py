"""On-device (jittable) LBVH build — the TPU-native acceleration-structure
builder the reference delegates to the D3D12 driver.

The reference rebuilds its TLAS/BLAS on the GPU via
``BuildRaytracingAccelerationStructure`` (DXRPathTracer.cpp:2331-2488,
GPU build logged at :1499-1500); geometry never round-trips to the host.
This module is that capability for the TPU engine: the *fast-build* morton
topology (``build_table_numpy``'s equal-count eighth-splits) emitted as one
jitted XLA program, so dynamic geometry can be re-built every frame on
device — deform verts -> build -> trace inside a single compiled step,
zero host synchronization.

Key insight that makes this a *good* TPU program rather than a port of a
GPU builder: the eighth-split topology (row ranges, leaf assignment,
child links, BFS level layout) is a pure function of ``(num_tris,
leaf_size)`` — *static at trace time*. Only the data flows through the
device: morton codes, a stable sort, triangle gathers, and segmented/level
min-max reductions. Everything XLA is good at; no scatter-with-conflicts,
no atomics, no dynamic shapes. The emitted ``(num_rows, 128)`` f32 table is
bit-identical to the host reference build (pinned by tests), so every
traversal engine consumes it unchanged and the FlatBVH static metadata
(row count, depth, root code) is known before tracing.

Why XLA and not a hand-written Pallas sort/build: jnp.argsort lowers to
XLA's tuned multi-pass sort, and the reductions fuse; the measured Pallas
alternatives for this engine's memory patterns (PERF_NOTES.md: manual-DMA
gather, Pallas traversal body) both lost to their XLA counterparts on this
hardware, so the builder intentionally stays on XLA primitives.

The quality path for static scenes remains the native binned-SAH build
(native/sah_builder.cpp, the PREFER_FAST_TRACE analog); this is the
PREFER_FAST_BUILD analog (D3D12_RAYTRACING_ACCELERATION_STRUCTURE_BUILD_FLAG
_PREFER_FAST_BUILD) for geometry that moves.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh import LEAF_SIZE, RECORD, WIDTH, FlatBVH


@dataclasses.dataclass(frozen=True)
class LBVHPlan:
    """Static topology of the equal-count eighth-split LBVH.

    Pure function of (num_tris, leaf_size): trees for two scenes with the
    same triangle count share one plan (and one compiled build program).
    All arrays are host numpy, closed over as constants by the jitted build.
    """
    num_tris: int
    leaf_size: int
    num_rows: int
    num_leaves: int
    depth: int
    root_code: int
    leaf_ids: np.ndarray        # (num_leaves,) row ids of leaves, ascending
    int_ids: np.ndarray         # (num_int,) row ids of internal rows
    leaf_seg: np.ndarray        # (num_tris,) leaf ordinal owning each sorted pos
    leaf_src: np.ndarray        # (num_leaves, LEAF_SIZE) sorted-pos per slot
    leaf_valid: np.ndarray      # (num_leaves, LEAF_SIZE) slot occupancy
    int_child: np.ndarray       # (num_int, WIDTH) child row ids
    int_codes: np.ndarray       # (num_int, WIDTH) i32 child codes (static)
    level_int: tuple            # per level: indices into int_ids (np arrays)


def lbvh_plan(num_tris: int, leaf_size: int = LEAF_SIZE) -> LBVHPlan:
    """Compute the static topology (mirrors build_table_numpy's BFS)."""
    assert num_tris > 0
    assert WIDTH <= leaf_size <= LEAF_SIZE

    row_ranges = []
    row_is_leaf = []
    level_slices = []
    cur = [(0, num_tris)]
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

    child_row = np.full((n_rows, WIDTH), -1, np.int64)
    for li, (s, e) in enumerate(level_slices[:-1]):
        base = level_slices[li + 1][0]
        internal_ids = np.arange(s, e)[~row_is_leaf[s:e]]
        for j, rid in enumerate(internal_ids):
            child_row[rid] = base + j * WIDTH + np.arange(WIDTH)

    leaf_ids = np.where(row_is_leaf)[0]
    int_ids = np.where(~row_is_leaf)[0]
    num_leaves = leaf_ids.size

    # per-sorted-position owning leaf ordinal (contiguous -> sorted segments)
    leaf_seg = np.empty(num_tris, np.int32)
    for ordn, rid in enumerate(leaf_ids):
        lo, hi = row_ranges[rid]
        leaf_seg[lo:hi] = ordn

    # per-leaf slot sources + occupancy
    lo = row_ranges[leaf_ids, 0]
    hi = row_ranges[leaf_ids, 1]
    k = np.arange(LEAF_SIZE)
    leaf_src = np.minimum(lo[:, None] + k[None, :], num_tris - 1)
    leaf_valid = (lo[:, None] + k[None, :]) < hi[:, None]

    code_of = np.where(row_is_leaf, ~np.arange(n_rows),
                       np.arange(n_rows)).astype(np.int32)
    int_child = child_row[int_ids]
    int_codes = code_of[int_child] if int_ids.size else \
        np.zeros((0, WIDTH), np.int32)

    # bottom-up level ordering over internal rows: positions of each level's
    # internal rows within int_ids (int_ids is ascending, levels contiguous)
    level_int = []
    for (s, e) in level_slices:
        sel = np.where((int_ids >= s) & (int_ids < e))[0]
        level_int.append(sel)

    return LBVHPlan(num_tris=num_tris, leaf_size=leaf_size,
                    num_rows=n_rows, num_leaves=int(num_leaves), depth=depth,
                    root_code=int(code_of[0]), leaf_ids=leaf_ids,
                    int_ids=int_ids, leaf_seg=leaf_seg, leaf_src=leaf_src,
                    leaf_valid=leaf_valid, int_child=int_child,
                    int_codes=int_codes, level_int=tuple(level_int))


def morton_codes_30_jnp(centroids: jnp.ndarray) -> jnp.ndarray:
    """30-bit morton codes on device — op-for-op the host morton_codes_30
    (each op rounds identically, so codes and therefore the stable sort
    order are bit-identical to the numpy build)."""
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    ext = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((centroids - lo) / ext * 1023.0, 0, 1023).astype(jnp.uint32)

    def expand_bits(v):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    return expand_bits(q[:, 0]) * 4 + expand_bits(q[:, 1]) * 2 + expand_bits(q[:, 2])


def build_table_device(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                       plan: LBVHPlan) -> jnp.ndarray:
    """Jittable: (T,3)x3 device triangle vertices -> (num_rows, 128) f32
    unified-record table, bit-identical to build_table_numpy's."""
    T = plan.num_tris
    assert v0.shape == (T, 3)
    f32 = jnp.float32
    v0, v1, v2 = (x.astype(f32) for x in (v0, v1, v2))

    centroids = (v0 + v1 + v2) / 3.0
    order = jnp.argsort(morton_codes_30_jnp(centroids), stable=True)
    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    tri_lo = jnp.minimum(jnp.minimum(sv0, sv1), sv2)
    tri_hi = jnp.maximum(jnp.maximum(sv0, sv1), sv2)

    # --- AABBs: leaf segments then bottom-up static level sweeps.
    # Assembly is scatter-free: per-level arrays + static gathers compile
    # far leaner than .at[].set into a (num_rows, 128) buffer (the first
    # version's scatters tripled XLA compile time).
    seg = jnp.asarray(plan.leaf_seg)
    leaf_lo = jax.ops.segment_min(tri_lo, seg, num_segments=plan.num_leaves,
                                  indices_are_sorted=True)
    leaf_hi = jax.ops.segment_max(tri_hi, seg, num_segments=plan.num_leaves,
                                  indices_are_sorted=True)

    # static row-id -> ordinal maps
    is_leaf_row = np.zeros(plan.num_rows, bool)
    is_leaf_row[plan.leaf_ids] = True
    leaf_ord = np.zeros(plan.num_rows, np.int64)
    leaf_ord[plan.leaf_ids] = np.arange(plan.num_leaves)
    int_ord = np.zeros(plan.num_rows, np.int64)
    int_ord[plan.int_ids] = np.arange(plan.int_ids.size)

    # bottom-up: per level keep this level's INTERNAL-row AABBs only; a
    # child is either a leaf (global leaf arrays) or an internal row of the
    # level below (previous sweep iterate). Keep each level's gathered
    # child AABBs — they are exactly the internal records' payload.
    int_lo_lvl = {}
    int_hi_lvl = {}
    child_lo_lvl = {}
    child_hi_lvl = {}
    for li in range(plan.depth - 2, -1, -1):   # deepest level is all leaves
        sel = plan.level_int[li]
        if sel.size == 0:
            continue
        ch = plan.int_child[sel]               # (I, 8) static row ids
        ch_is_leaf = is_leaf_row[ch]
        lf_idx = jnp.asarray(leaf_ord[ch])
        lo_c = leaf_lo[lf_idx]
        hi_c = leaf_hi[lf_idx]
        if (li + 1) in int_lo_lvl:
            sub = plan.level_int[li + 1]
            sub_pos = np.zeros(plan.int_ids.size, np.int64)
            sub_pos[sub] = np.arange(sub.size)
            in_idx = jnp.asarray(sub_pos[int_ord[ch]])
            mask = jnp.asarray(ch_is_leaf)[..., None]
            lo_c = jnp.where(mask, lo_c, int_lo_lvl[li + 1][in_idx])
            hi_c = jnp.where(mask, hi_c, int_hi_lvl[li + 1][in_idx])
        child_lo_lvl[li] = lo_c
        child_hi_lvl[li] = hi_c
        int_lo_lvl[li] = lo_c.min(axis=1)
        int_hi_lvl[li] = hi_c.max(axis=1)

    # --- leaf records: SoA [v0 e1 e2](9*L) + tid(L), slot-padded.
    # The table mixes f32 coordinates with bitcast int32 payloads (tri ids,
    # child codes). Those payloads are NaN/denormal BIT PATTERNS as floats,
    # and TPU float-typed ops canonicalize NaNs and flush denormals —
    # assembling in f32 silently destroyed every tri id on device. So the
    # whole table is assembled in the INTEGER domain (bitcast each payload
    # to i32 first) and bitcast to f32 exactly once at the end.
    i32 = jnp.int32
    e1 = sv1 - sv0
    e2 = sv2 - sv0
    src = jnp.asarray(plan.leaf_src)           # (Lv, 12) static values
    valid = jnp.asarray(plan.leaf_valid)
    tid_i32 = order.astype(i32)

    blocks = []
    for arr in (sv0, e1, e2):
        g = arr[src]                           # (Lv, 12, 3)
        g = jnp.where(valid[..., None], g, 0.0)
        gi = jax.lax.bitcast_convert_type(g, i32)
        # slot layout: (comp*3+ax)*L + k -> for this comp: ax-major
        blocks.append(gi.transpose(0, 2, 1).reshape(plan.num_leaves,
                                                    3 * LEAF_SIZE))
    blocks.append(jnp.where(valid, tid_i32[src], -1))
    pad = jnp.zeros((plan.num_leaves, RECORD - 10 * LEAF_SIZE), i32)
    leaf_block = jnp.concatenate(blocks + [pad], axis=1)

    # --- internal records: [lo_x8 lo_y8 lo_z8 | hi_* | codes8 | pad] ---
    # levels are contiguous and ascending within int_ids, so concatenating
    # the per-level child AABBs top-down lands in int_ids order.
    if plan.int_ids.size:
        levels = sorted(child_lo_lvl)
        lo_c = jnp.concatenate([child_lo_lvl[li] for li in levels], axis=0)
        hi_c = jnp.concatenate([child_hi_lvl[li] for li in levels], axis=0)
        int_block = jnp.concatenate([
            jax.lax.bitcast_convert_type(
                lo_c.transpose(0, 2, 1).reshape(-1, 3 * WIDTH), i32),
            jax.lax.bitcast_convert_type(
                hi_c.transpose(0, 2, 1).reshape(-1, 3 * WIDTH), i32),
            jnp.broadcast_to(jnp.asarray(plan.int_codes),
                             (plan.int_ids.size, WIDTH)),
            jnp.zeros((plan.int_ids.size, RECORD - 56), i32),
        ], axis=1)
        # one static permutation gather instead of two big scatters
        row_src = np.where(is_leaf_row, leaf_ord,
                           plan.num_leaves + int_ord)
        table_i32 = jnp.concatenate([leaf_block, int_block], axis=0)[
            jnp.asarray(row_src)]
    else:
        table_i32 = leaf_block
    return jax.lax.bitcast_convert_type(table_i32, f32)


def build_bvh_device(v0, v1, v2, leaf_size: int = LEAF_SIZE,
                     plan: LBVHPlan | None = None) -> FlatBVH:
    """Device LBVH build -> FlatBVH consumable by every traversal engine.

    The table stays on device end-to-end; the FlatBVH static metadata comes
    from the plan (known without touching the data), so downstream jitted
    traversals do not retrace across rebuilds of same-count geometry.
    """
    if plan is None:
        plan = lbvh_plan(int(np.shape(v0)[0]), leaf_size)
    table = jax.jit(partial(build_table_device, plan=plan))(v0, v1, v2)
    return FlatBVH(table=table, num_rows=plan.num_rows, num_tris=plan.num_tris,
                   num_leaves=plan.num_leaves, leaf_size=plan.leaf_size,
                   max_depth=plan.depth + 2, root_code=plan.root_code,
                   width=WIDTH)
