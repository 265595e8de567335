"""LBVH construction (host-side, vectorized numpy) with a TPU-packed layout.

TPU-native replacement for the reference's driver-built DXR acceleration
structures (BuildRTAccelerationStructure, DXRPathTracer.cpp:2331-2488): the
reference hands one BLAS's geometry descs to the D3D12 driver and gets an opaque
hardware BVH; here we own the build. Morton-ordered median-split LBVH, built
level-by-level with fully vectorized numpy (np.minimum.reduceat per level), laid
out in BFS order with *skip links* so traversal is stackless and uniform —
the property that matters on TPU, where every ray must execute the same
instruction stream (`hit -> left child, miss/leaf-done -> skip link`).

Memory layout is tuned for wavefront traversal on TPU, where every gather is a
separate kernel and kernel-launch overhead dominates:
  - `nodes` (n, 8) f32   — [lo.xyz, hi.xyz, bitcast(next_if_hit), bitcast(skip)]
    ONE gather fetches a node's AABB and both links. `next_if_hit` is the left
    child for internal nodes and `~leaf_idx` (negative) for leaves.
  - `leaves` (n_leaves, leaf_size*12) f32 — per-leaf packed triangles
    [v0.xyz, e1.xyz, e2.xyz, bitcast(tri_id), pad, pad] x leaf_size; ONE gather
    fetches all of a leaf's triangles (padded slots have tri_id == -1 and
    degenerate zero edges that can never report a hit).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TRI_STRIDE = 12  # f32 slots per packed triangle


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@partial(_register, meta=("num_nodes", "num_tris", "num_leaves", "leaf_size"))
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    nodes: jax.Array    # (n, 8) f32 packed node records (see module doc)
    leaves: jax.Array   # (n_leaves, leaf_size * TRI_STRIDE) f32 packed triangles
    num_nodes: int = 0
    num_tris: int = 0
    num_leaves: int = 0
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


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = 4,
              use_native: bool = True) -> FlatBVH:
    """Build a FlatBVH from (T, 3) triangle vertices (host numpy -> device).

    Uses the native C++ builder (native/lbvh_builder.cpp via ctypes) when
    available; the numpy path below is the bit-identical reference
    implementation and fallback.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    num_tris = v0.shape[0]
    assert num_tris > 0

    if use_native:
        from . import native
        packed = native.build_packed(v0, v1, v2, leaf_size)
        if packed is not None:
            nodes_n, leaves_n, n_nodes, n_leaves = packed
            return FlatBVH(
                nodes=jnp.asarray(nodes_n),
                leaves=jnp.asarray(leaves_n),
                num_nodes=n_nodes, num_tris=int(num_tris),
                num_leaves=n_leaves, leaf_size=int(leaf_size))

    centroids = (v0 + v1 + v2) / 3.0
    order = np.argsort(morton_codes_30(centroids), kind="stable").astype(np.int64)
    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    tri_lo = np.minimum(np.minimum(sv0, sv1), sv2)
    tri_hi = np.maximum(np.maximum(sv0, sv1), sv2)

    # --- Level-by-level BFS construction over contiguous morton ranges ---
    levels = []
    ranges = np.array([[0, num_tris]], np.int64)
    node_base = 0
    all_l, all_r = [], []
    while ranges.size:
        k = ranges.shape[0]
        all_l.append(ranges[:, 0])
        all_r.append(ranges[:, 1])
        counts = ranges[:, 1] - ranges[:, 0]
        internal = counts > leaf_size
        li, ri = ranges[internal, 0], ranges[internal, 1]
        mid = (li + ri) // 2
        child_ranges = np.empty((int(internal.sum()) * 2, 2), np.int64)
        child_ranges[0::2, 0] = li
        child_ranges[0::2, 1] = mid
        child_ranges[1::2, 0] = mid
        child_ranges[1::2, 1] = ri
        levels.append({"internal": internal, "base": node_base,
                       "l": ranges[:, 0], "r": ranges[:, 1]})
        node_base += k
        ranges = child_ranges

    n = node_base
    l_arr = np.concatenate(all_l)
    r_arr = np.concatenate(all_r)
    left = np.full(n, -1, np.int64)
    skip = np.full(n, n, np.int64)
    tri_count = np.zeros(n, np.int64)

    for lev in levels:
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
            skip[fc] = fc + 1  # left child's skip = right sibling
    # Right-child skip = parent's skip; parents are final when processed top-down.
    for lev in levels:
        base = lev["base"]
        internal = lev["internal"]
        ids = (base + np.arange(internal.shape[0]))[internal]
        if ids.size:
            fc = left[ids]
            skip[fc + 1] = skip[ids]

    # --- AABBs, bottom-up ---
    lo = np.empty((n, 3), np.float32)
    hi = np.empty((n, 3), np.float32)
    for lev in reversed(levels):
        base = lev["base"]
        internal = lev["internal"]
        node_ids = base + np.arange(internal.shape[0])
        leaf_ids = node_ids[~internal]
        if leaf_ids.size:
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

    # --- Packed layouts ---
    is_leaf = tri_count > 0
    leaf_ids = np.where(is_leaf)[0]
    n_leaves = leaf_ids.size
    leaf_index_of_node = np.zeros(n, np.int64)
    leaf_index_of_node[leaf_ids] = np.arange(n_leaves)

    # next_if_hit: left child for internal; ~leaf_idx (negative) for leaves
    next_if_hit = np.where(is_leaf, ~leaf_index_of_node, left).astype(np.int32)

    nodes = np.zeros((n, 8), np.float32)
    nodes[:, 0:3] = lo
    nodes[:, 3:6] = hi
    nodes[:, 6] = next_if_hit.view(np.float32)
    nodes[:, 7] = skip.astype(np.int32).view(np.float32)

    leaves = np.zeros((max(n_leaves, 1), leaf_size, TRI_STRIDE), np.float32)
    # Padded slots: tri_id = -1, zero edges (Möller–Trumbore det == 0 -> miss).
    leaves[:, :, 9] = np.float32(np.int32(-1).view(np.float32))
    e1 = sv1 - sv0
    e2 = sv2 - sv0
    sorted_tri_id = order.astype(np.int32)
    starts = l_arr[leaf_ids]
    counts = tri_count[leaf_ids]
    for k in range(leaf_size):
        sel = counts > k
        src = starts[sel] + k
        dst = np.where(sel)[0]
        leaves[dst, k, 0:3] = sv0[src]
        leaves[dst, k, 3:6] = e1[src]
        leaves[dst, k, 6:9] = e2[src]
        leaves[dst, k, 9] = sorted_tri_id[src].view(np.float32)

    return FlatBVH(
        nodes=jnp.asarray(nodes),
        leaves=jnp.asarray(leaves.reshape(max(n_leaves, 1), leaf_size * TRI_STRIDE)),
        num_nodes=int(n),
        num_tris=int(num_tris),
        num_leaves=int(n_leaves),
        leaf_size=int(leaf_size),
    )


def build_bvh_for_scene(scene, positions=None, tri_idx=None) -> FlatBVH:
    """Build from a Scene pytree. Pass host-numpy `positions`/`tri_idx` when
    available to avoid device->host readbacks (slow over the TPU tunnel)."""
    pos = positions if positions is not None else np.asarray(scene.positions)
    tri = tri_idx if tri_idx is not None else np.asarray(scene.tri_idx)
    return build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]])
