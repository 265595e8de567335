"""LBVH construction (host-side, vectorized numpy).

TPU-native replacement for the reference's driver-built DXR acceleration
structures (BuildRTAccelerationStructure, DXRPathTracer.cpp:2331-2488): the
reference hands one BLAS's geometry descs to the D3D12 driver and gets an opaque
hardware BVH; here we own the build. Morton-ordered median-split LBVH, built
level-by-level with fully vectorized numpy (np.minimum.reduceat per level), laid
out in BFS order with *skip links* so traversal is stackless and uniform —
the property that matters on TPU, where every ray must execute the same
instruction stream (`hit -> left child, miss/leaf-done -> skip link`).

Triangles are reordered into morton order so each leaf is a contiguous range;
leaves are padded to a static max size so the traversal loop can unroll triangle
intersection without dynamic trip counts.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_nodes", "num_tris", "leaf_size"))
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    bounds_lo: jax.Array   # (n, 3) f32 node AABB min
    bounds_hi: jax.Array   # (n, 3) f32 node AABB max
    left: jax.Array        # (n,) i32 first-child index (internal) / unused (leaf)
    skip: jax.Array        # (n,) i32 next node if AABB missed or leaf done; n = END
    tri_start: jax.Array   # (n,) i32 leaf triangle range start (reordered order)
    tri_count: jax.Array   # (n,) i32 0 for internal nodes
    tri_v0: jax.Array      # (T, 3) f32 reordered triangle vertex 0
    tri_e1: jax.Array      # (T, 3) f32 edge v1 - v0
    tri_e2: jax.Array      # (T, 3) f32 edge v2 - v0
    tri_id: jax.Array      # (T,) i32 original triangle index
    num_nodes: int = 0
    num_tris: int = 0
    leaf_size: int = 4

    @property
    def end_sentinel(self) -> int:
        return self.num_nodes


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


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = 4) -> FlatBVH:
    """Build a FlatBVH from (T, 3) triangle vertices (host numpy, device output)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    num_tris = v0.shape[0]
    assert num_tris > 0

    centroids = (v0 + v1 + v2) / 3.0
    order = np.argsort(morton_codes_30(centroids), kind="stable").astype(np.int64)
    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    tri_lo = np.minimum(np.minimum(sv0, sv1), sv2)
    tri_hi = np.maximum(np.maximum(sv0, sv1), sv2)

    # --- Level-by-level BFS construction over contiguous morton ranges ---
    levels = []  # each: dict(l, r, node_idx) as arrays
    ranges = np.array([[0, num_tris]], np.int64)
    node_base = 0
    all_l, all_r = [], []
    level_slices = []
    while ranges.size:
        k = ranges.shape[0]
        all_l.append(ranges[:, 0])
        all_r.append(ranges[:, 1])
        level_slices.append((node_base, node_base + k))
        counts = ranges[:, 1] - ranges[:, 0]
        internal = counts > leaf_size
        li, ri = ranges[internal, 0], ranges[internal, 1]
        mid = (li + ri) // 2
        child_ranges = np.empty((internal.sum() * 2, 2), np.int64)
        child_ranges[0::2, 0] = li
        child_ranges[0::2, 1] = mid
        child_ranges[1::2, 0] = mid
        child_ranges[1::2, 1] = ri
        levels.append({"l": ranges[:, 0], "r": ranges[:, 1], "internal": internal,
                       "base": node_base})
        node_base += k
        ranges = child_ranges

    n = node_base
    l_arr = np.concatenate(all_l)
    r_arr = np.concatenate(all_r)
    left = np.full(n, -1, np.int64)
    skip = np.full(n, n, np.int64)
    tri_count = np.zeros(n, np.int64)
    tri_start = l_arr.copy()

    # Children/skip wiring, vectorized per level.
    for li_idx, lev in enumerate(levels):
        base = lev["base"]
        internal = lev["internal"]
        k = internal.shape[0]
        node_ids = base + np.arange(k)
        counts = lev["r"] - lev["l"]
        tri_count[node_ids[~internal]] = counts[~internal]
        if internal.any():
            child_base = base + k
            first_child = child_base + np.cumsum(internal) * 2 - 2
            fc = first_child[internal]
            ids = node_ids[internal]
            left[ids] = fc
            # left child's skip = right sibling; right child's skip = parent's skip
            skip[fc] = fc + 1
            # parent skip propagates after we know it: fill below in second pass
    # Second pass for right-child skip (needs parent's final skip): process levels
    # top-down so parents are already final.
    for lev in levels:
        base = lev["base"]
        internal = lev["internal"]
        k = internal.shape[0]
        node_ids = base + np.arange(k)
        ids = node_ids[internal]
        if ids.size:
            fc = left[ids]
            skip[fc + 1] = skip[ids]

    # --- AABBs, bottom-up ---
    lo = np.empty((n, 3), np.float32)
    hi = np.empty((n, 3), np.float32)
    for lev in reversed(levels):
        base = lev["base"]
        internal = lev["internal"]
        k = internal.shape[0]
        node_ids = base + np.arange(k)
        leaf_ids = node_ids[~internal]
        if leaf_ids.size:
            # Exact per-leaf bounds via reduceat over interleaved [l0,r0,l1,r1,...]
            # boundaries (ranges within a level are ascending and non-empty);
            # even-position segments are the leaf ranges. A trailing r == num_tris
            # must be dropped (reduceat indices must be < len).
            bounds = np.stack([l_arr[leaf_ids], r_arr[leaf_ids]], -1).reshape(-1)
            if bounds[-1] == num_tris:
                bounds = bounds[:-1]
            lo[leaf_ids] = np.minimum.reduceat(tri_lo, bounds, axis=0)[0::2]
            hi[leaf_ids] = np.maximum.reduceat(tri_hi, bounds, axis=0)[0::2]
        int_ids = node_ids[internal]
        if int_ids.size:
            fc = left[int_ids]
            lo[int_ids] = np.minimum(lo[fc], lo[fc + 1])
            hi[int_ids] = np.maximum(hi[fc], hi[fc + 1])

    return FlatBVH(
        bounds_lo=jnp.asarray(lo),
        bounds_hi=jnp.asarray(hi),
        left=jnp.asarray(left.astype(np.int32)),
        skip=jnp.asarray(skip.astype(np.int32)),
        tri_start=jnp.asarray(tri_start.astype(np.int32)),
        tri_count=jnp.asarray(tri_count.astype(np.int32)),
        tri_v0=jnp.asarray(sv0),
        tri_e1=jnp.asarray(sv1 - sv0),
        tri_e2=jnp.asarray(sv2 - sv0),
        tri_id=jnp.asarray(order.astype(np.int32)),
        num_nodes=int(n),
        num_tris=int(num_tris),
        leaf_size=int(leaf_size),
    )


def build_bvh_for_scene(scene) -> FlatBVH:
    """Build from a Scene pytree (gathers triangle vertices on host)."""
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    return build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]])
