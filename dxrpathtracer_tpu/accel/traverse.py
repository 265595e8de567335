"""Ordered wide-BVH traversal — the TPU replacement for DXR TraceRay.

The reference's per-ray MIMD hardware traversal (RayTrace.hlsl:138,258,407
`TraceRay`, max recursion 8) becomes a wavefront: every ray in a flat batch
walks the 8-ary BVH in lockstep inside one `lax.while_loop`, with divergence as
data (masks) — the shape the VPU wants.

The loop is built around two measured TPU facts:
  1. gathers cost ~constant per ROW (latency-bound) up to 512B rows, so each
     iteration fetches exactly ONE unified 512B record per ray (accel/lbvh.py)
     and does everything with it;
  2. wide (N, 8) block slices of the gathered record keep memory access
     efficient (fully component-major/transposed variants measured 2.7x
     faster per step but fault the current axon/Mosaic stack — PERF_NOTES.md).

Per iteration each lane either
  - slab-tests all 8 children of an internal record (SoA blocks), descends
    the nearest hit (3-level argmin tournament) and, when several children
    hit, pushes ONE (node, remaining-children bitmask) entry on a short
    per-ray stack, or
  - intersects the 10 inline triangles of a leaf record (statically unrolled
    component-wise Möller–Trumbore).
Pops re-visit the parent with the saved mask: one extra record gather, but
the re-test prunes against the by-then-improved `t_best` for free. The
(node, mask) scheme bounds the stack by the tree DEPTH (~7 levels for
Sponza-class scenes) instead of depth*(WIDTH-1): per-lane dynamic-index
stacks are dense masked updates on TPU (no fast per-lane scatter), so a
64-deep stack rewritten up to 7x per step was ~1 GB of HBM traffic per
iteration — the measured wall of the whole traversal (PERF_NOTES.md).

Two entry points mirror the reference's two hit groups:
  closest_hit — radiance rays (ClosestHitShader path)
  any_hit     — shadow/visibility rays with RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH
                semantics (RayTrace.hlsl:249,296,416)

Alpha-testing (AnyHitShader's `IgnoreHit` when opacity < 0.35,
RayTrace.hlsl:485-507) plugs in via `accept_fn(tri_id, u, v) -> bool`; passing
None is RAY_FLAG_FORCE_OPAQUE.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp

from .lbvh import FlatBVH, LEAF_SIZE, RECORD, WIDTH

_BIG = jnp.float32(3e38)


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class HitRecord:
    t: jax.Array        # (N,) f32 hit distance (t_max where missed)
    tri_id: jax.Array   # (N,) i32 original triangle index, -1 on miss
    u: jax.Array        # (N,) f32 barycentric u (of v1)
    v: jax.Array        # (N,) f32 barycentric v (of v2)

    @property
    def hit(self):
        return self.tri_id >= 0


def _safe_inv(d):
    """1/d with zero components nudged to ±eps (avoids 0*inf = NaN in slab tests)."""
    eps = 1e-12
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0.0, -eps, eps), d)


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


_POW2_8 = None  # lazily built (1, 8) powers-of-two row


def _argmin8_block(keys8, codes8, width: int = 8, slot_offset: int = 0):
    """Min over the child axis of (m, W) blocks via reduce + equality-select
    (far fewer ops than a tournament of per-column lanes; narrow per-column
    ops carry a large fixed overhead on this platform — PERF_NOTES.md).
    Ties pick the lowest slot. Returns (key, code, slot_bit) of the min;
    slot_offset shifts the bit for multi-bank wide records."""
    near_key = jnp.min(keys8, axis=1)
    is_min = keys8 <= near_key[:, None]
    slot = jnp.arange(width, dtype=jnp.int32)[None, :]
    near_slot = jnp.min(jnp.where(is_min, slot, width), axis=1)
    first = slot == near_slot[:, None]
    near_code = jnp.sum(jnp.where(first, codes8, 0), axis=1)
    # clamp the no-hit sentinel (slot == width) so the shift stays defined;
    # the bit is unused then (hit_mask is 0)
    shift = jnp.minimum(near_slot + slot_offset, 31)
    return near_key, near_code, jnp.int32(1) << shift


def _full_mask(width: int):
    """All-children pmask for a fresh internal visit (W=32 fills int32)."""
    return jnp.int32(-1) if width == 32 else jnp.int32((1 << width) - 1)


def _child_banks(bvh: FlatBVH, rec):
    """Child-AABB "banks" of gathered internal records: a list of
    (lo_xyz, hi_xyz, codes, slot_offset, bank_width) tuples the slab section
    iterates over.

    width 8: one f32 SoA bank — the classic layout, op-for-op unchanged.
    width 16/32: bf16 DE-INTERLEAVED pairs (build_table_numpy_sah_wide):
    f32 slot j of each field holds child j in its LOW 16 bits and child
    j + W/2 in its HIGH 16 bits, so each half decodes with pure integer ops
    (u << 16 / u & 0xFFFF0000 are exact bf16->f32 widenings) into contiguous
    (m, W/2) blocks — NO cross-lane relayout. The interleaved variant's
    (m, 3W, 2)->(m, 6W) reshape was a full lane shuffle per iteration and
    nearly doubled the body (tools/microbench_bf16_slab.py: 10.07 vs 6.43 vs
    5.62 ms/iter for shuffle/half/w8 at 518k lanes). Conservative directed
    rounding on the build side keeps the slab test exact-or-looser."""
    W = bvh.width
    if W == 8:
        lo = (rec[:, 0:8], rec[:, 8:16], rec[:, 16:24])
        hi = (rec[:, 24:32], rec[:, 32:40], rec[:, 40:48])
        codes = _bitcast_i32(rec[:, 48:56])
        return [(lo, hi, codes, 0, 8)]
    H = W // 2
    u = _bitcast_i32(rec[:, 0:3 * W])  # 6 fields x H u32 slots
    banks = []
    for h in range(2):
        if h == 0:
            fld = [jax.lax.bitcast_convert_type(
                u[:, f * H:(f + 1) * H] << 16, jnp.float32) for f in range(6)]
        else:
            msk = jnp.int32(-65536)  # 0xFFFF0000
            fld = [jax.lax.bitcast_convert_type(
                u[:, f * H:(f + 1) * H] & msk, jnp.float32) for f in range(6)]
        codes = _bitcast_i32(rec[:, 3 * W + h * H:3 * W + (h + 1) * H])
        banks.append(((fld[0], fld[1], fld[2]), (fld[3], fld[4], fld[5]),
                      codes, h * H, H))
    return banks


def _intersect_leaf(bvh, rec, o, d, t_min, is_leaf, best, accept_fn):
    """Vectorized Möller–Trumbore over the leaf record's SoA triangle blocks.

    rec: (m, RECORD) gathered records with SoA leaf layout (accel/lbvh.py):
    all L=8 triangles are tested with ~10 contiguous (m, 8) block slices —
    the earlier per-triangle AoS layout needed ~100 scalar column slices, each
    re-streaming the gathered 512B row (PERF_NOTES.md).
    o/d: tuples of (m,) xyz. No backface culling (the reference disables it:
    Timing.txt:3 "No back-face cull" is the shipped configuration).
    """
    L = LEAF_SIZE
    ox, oy, oz = (c[:, None] for c in o)
    dx, dy, dz = (c[:, None] for c in d)
    best_t, best_tri, best_u, best_v = best

    v0x, v0y, v0z = rec[:, 0:L], rec[:, L:2 * L], rec[:, 2 * L:3 * L]
    e1x, e1y, e1z = rec[:, 3 * L:4 * L], rec[:, 4 * L:5 * L], rec[:, 5 * L:6 * L]
    e2x, e2y, e2z = rec[:, 6 * L:7 * L], rec[:, 7 * L:8 * L], rec[:, 8 * L:9 * L]
    tid = _bitcast_i32(rec[:, 9 * L:10 * L])
    if getattr(bvh, "has_alpha_flags", False):
        # leaf tri ids carry the alpha-material bit (lbvh.ALPHA_TID_BIT);
        # the per-ray engines don't use it — strip before any consumer
        from .lbvh import ALPHA_TID_BIT
        tid = jnp.where(tid >= 0, tid & ~jnp.int32(ALPHA_TID_BIT), tid)

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (is_leaf[:, None] & (tid >= 0) & (jnp.abs(det) > 1e-12)
          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min[:, None]) & (t < best_t[:, None]))
    if accept_fn is not None:
        ok = ok & accept_fn(tid, u, v)

    # Min-reduce over the triangle axis via reduce + equality-select (block
    # reduces beat per-column tournaments on this platform; axis-1 gathers
    # inside while bodies fault the Mosaic stack — PERF_NOTES.md). The
    # lowest slot wins ties, matching the sequential-update order of the
    # AoS loop this replaces.
    key = jnp.where(ok, t, _BIG)
    ck = jnp.min(key, axis=1)
    slot = jnp.arange(L, dtype=jnp.int32)[None, :]
    min_slot = jnp.min(jnp.where(key <= ck[:, None], slot, L), axis=1)
    first = slot == min_slot[:, None]
    ctid = jnp.sum(jnp.where(first, tid, 0), axis=1)
    cu = jnp.sum(jnp.where(first, u, 0.0), axis=1)
    cv = jnp.sum(jnp.where(first, v, 0.0), axis=1)
    win = ck < _BIG
    best_tri = jnp.where(win, ctid, best_tri)
    best_u = jnp.where(win, cu, best_u)
    best_v = jnp.where(win, cv, best_v)
    best_t = jnp.where(win, ck, best_t)
    return best_t, best_tri, best_u, best_v


# Ray-compaction schedule. The lockstep while_loop pays every iteration for
# ALL lanes, but the average ray finishes in ~30 steps while the worst needs
# ~160 (PERF_NOTES.md): each phase therefore runs only until the live-lane
# count drops below the next (half) size, compacts survivors into a half-size
# static-shape array, and continues — the DXR hardware's per-ray MIMD
# termination (RayTrace.hlsl:138) recovered with static shapes. Tunables:
# phases below MIN_COMPACT_SIZE lanes or beyond MAX_COMPACT_PHASES halvings
# aren't worth the extra while_loop instance (compile time) or the boundary
# permute cost.
MIN_COMPACT_SIZE = 8192
MAX_COMPACT_PHASES = 4
# The per-ray engines default to a DEEPER schedule: at 518k lanes the
# 4x8192 schedule leaves a ~32k tail running to the worst lane plus up to
# half-dead lanes inside each phase; 8 phases with a 2048 floor measured
# 121.3 -> 114.6 ms (closest) / 104.4 -> 98.1 ms (any) on the production
# bounce/terminal populations, bit-identical (tools/ab_compact_schedule.py,
# v5e 960x540). Packets/sunspace keep the shallow schedule: their lane
# counts are already small (4k packets / short grid chains), so extra
# phases only buy compile time. DXRPT_SPREAD_DEAD_ROWS measured neutral.
PER_RAY_MIN_COMPACT_SIZE = 2048
PER_RAY_MAX_COMPACT_PHASES = 8


def compact_knobs(default_min=MIN_COMPACT_SIZE,
                  default_max=MAX_COMPACT_PHASES):
    """(min_size, max_phases) with env overrides for schedule A/Bs
    (tools/ab_compact_schedule.py). Read at trace time so a re-jit picks
    up the current values."""
    return (int(os.environ.get("DXRPT_MIN_COMPACT_SIZE", default_min)),
            int(os.environ.get("DXRPT_MAX_COMPACT_PHASES", default_max)))



def _compact_perm(finished, m):
    """Stable permutation putting unfinished lanes first (one cumsum + one
    drop-scatter; the scatter is the cost — ~9 ms per 518k rows, so every
    redundant pass matters: tools/microbench notes in PERF_NOTES.md)."""
    unf = (~finished).astype(jnp.int32)
    csu = jnp.cumsum(unf)
    n_unf = csu[-1]
    # finished lane i is the (i+1 - csu[i])-th finished lane; one cumsum
    # serves both groups
    iota = jnp.arange(m, dtype=jnp.int32)
    dest = jnp.where(finished, n_unf + iota - csu, csu - 1)
    perm = jnp.zeros((m,), jnp.int32).at[dest].set(iota, unique_indices=True)
    return perm


# Boundary-packable per-lane state: everything the next phase needs, as ONE
# (m, 18) f32 buffer so a phase boundary moves it with ONE row gather.
# Compacting the ~18 arrays separately cost ~5.7 ms EACH at 518k lanes
# (every take is an independent row-count-bound gather — 135 ms per
# boundary, dominating the whole traversal); the packed row moves for ~2 ms.
_PACK_F32 = ("ox", "oy", "oz", "dx", "dy", "dz", "ivx", "ivy", "ivz",
             "tmin", "bt", "bu", "bv")
_PACK_I32 = ("idx", "cur", "pmask", "sp", "btri")
_PACK_KEYS = _PACK_F32 + _PACK_I32


def _pack_lane(lane):
    cols = [lane[k] for k in _PACK_F32]
    cols += [jax.lax.bitcast_convert_type(lane[k], jnp.float32)
             for k in _PACK_I32]
    return jnp.stack(cols, axis=1)


def _unpack_lane(packed):
    lane = {}
    for j, k in enumerate(_PACK_F32):
        lane[k] = packed[:, j]
    base = len(_PACK_F32)
    for j, k in enumerate(_PACK_I32):
        lane[k] = jax.lax.bitcast_convert_type(packed[:, base + j], jnp.int32)
    return lane


# Default for the 4-way split row fetch. Flipped by measurement protocol
# only: tools/sweep_split_gather.py (bit-equality vs the single-gather
# incumbent over every historical bad shape x real tables, ON DEVICE) +
# tools/crosscheck_tpu.py must both be green on the current stack, and the
# driver bench must show a win. History: round 2 shipped it and the axon
# stack MISCOMPILED silently; round-5's canary measured the bug gone
# (artifacts/canary.json, split 5.2x on the isolated dependent walk).
# Round-5 outcome: CORRECT but SLOWER end-to-end. The sweep gate is green
# (artifacts/split_gather_sweep.json — 0 mismatches over 62 points:
# Sponza+Stronghold x W8/W32/packet x every historical bad lane count, on
# the v5e), so the miscompile era is over; but the driver bench measured
# the split fetch 1178.9 ms vs 1019.3 single at 1080p (±0.1% spreads) —
# the canary's 5.2x on a trivial-body walk does not survive the real
# traversal body (the 4 sub-gathers + concat add ops the scheduler cannot
# overlap once the body consumes all 128 columns). Stays opt-in
# (DXRPT_SPLIT_GATHER=1) as a validated-correct alternate fetch.
_SPLIT_GATHER_DEFAULT = False


def split_gather_enabled() -> bool:
    """Round-2's 4-sub-gather latency-overlap row fetch (see
    _SPLIT_GATHER_DEFAULT). DXRPT_SPLIT_GATHER=1/0 overrides;
    DXRPT_NO_SPLIT_GATHER=1 forces off (legacy A/B knob)."""
    if os.environ.get("DXRPT_NO_SPLIT_GATHER"):
        return False
    env = os.environ.get("DXRPT_SPLIT_GATHER")
    if env is not None:
        return env != "0"
    return _SPLIT_GATHER_DEFAULT


def _table_quarters(table):
    """Four 32-column views of the record table, hoisted OUT of the loop so
    each iteration issues 4 independent sub-gathers (the DMA latency
    overlap XLA won't create from one 128-wide gather)."""
    return [table[:, 32 * k:32 * (k + 1)] for k in range(4)]


def _gather_record(table, quarters, row):
    if quarters is None:
        return jnp.take(table, row, axis=0, mode="clip")
    return jnp.concatenate(
        [jnp.take(q, row, axis=0, mode="clip") for q in quarters], axis=1)


def _traverse(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active, accept_fn,
              first_hit: bool, stats: bool = False):
    n = ray_o.shape[0]
    inv_d = _safe_inv(ray_d)
    done_code = jnp.int32(bvh.num_rows)  # cur == done_code => lane finished
    quarters = (_table_quarters(bvh.table)
                if split_gather_enabled() else None)

    # Pallas loop body (accel/pallas_body.py): reads each gathered 512 B
    # record tile into VMEM once and runs the body component-major (rays on
    # the VPU lanes) — the XLA body re-streams rows ~5x and wastes lanes on
    # 8/12-wide blocks. Alpha-tested traversals keep the XLA body (the
    # accept_fn needs texture gathers).
    from . import pallas_body as _pb
    pallas_enabled = (accept_fn is None and bvh.width == 8
                      and _pb.enabled())
    pallas_interpret = jax.default_backend() == "cpu"
    # (node, mask) entries: at most one live entry per tree level.
    stack_depth = bvh.max_depth + 2
    levels = jnp.arange(stack_depth, dtype=jnp.int32)[:, None]

    # Safety bound only (turns a corrupt tree into a wrong image, not a
    # hang): every row is visited at most once per child slot per ray.
    max_iters = bvh.num_rows * 2 + stack_depth + 4

    root = jnp.int32(bvh.root_code)

    # Per-lane state, compactable. Ray components stay as (m,) lanes so the
    # hot math never re-slices (PERF_NOTES.md: jnp.cross/stack break fusion).
    lane = dict(
        idx=jnp.arange(n, dtype=jnp.int32),
        ox=ray_o[:, 0], oy=ray_o[:, 1], oz=ray_o[:, 2],
        dx=ray_d[:, 0], dy=ray_d[:, 1], dz=ray_d[:, 2],
        ivx=inv_d[:, 0], ivy=inv_d[:, 1], ivz=inv_d[:, 2],
        tmin=t_min,
        cur=jnp.where(active, root, done_code).astype(jnp.int32),
        pmask=jnp.full((n,), 1, jnp.int32) * _full_mask(bvh.width),
        snode=jnp.zeros((stack_depth, n), jnp.int32),
        smask=jnp.zeros((stack_depth, n), jnp.int32),
        sp=jnp.zeros((n,), jnp.int32),
        bt=t_max.astype(jnp.float32),
        btri=jnp.full((n,), -1, jnp.int32),
        bu=jnp.zeros((n,), jnp.float32),
        bv=jnp.zeros((n,), jnp.float32),
    )

    def body(s, rec_override=None):
        (idx, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmin,
         cur, pmask, snode, smask, sp,
         best_t, best_tri, best_u, best_v, it) = s

        # per-trace decision: the body is retraced at each compaction
        # phase's lane count, and the kernel needs a 128-multiple lane tile
        # dividing it
        pallas_tile = (_pb.pick_tile(cur.shape[0])
                       if pallas_enabled and rec_override is None else None)
        if pallas_tile is not None:
            alive_p = cur != done_code
            is_leaf_p = alive_p & (cur < 0)
            is_int_p = alive_p & (cur >= 0)
            row_p = jnp.where(is_leaf_p, ~cur, jnp.where(is_int_p, cur, 0))
            rec_p = jnp.take(bvh.table, row_p, axis=0, mode="clip")
            (cur2, pmask2, sp2, snode2, smask2,
             bt2, btri2, bu2, bv2) = _pb.pallas_step(
                rec_p, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmin,
                cur, pmask, sp, snode, smask,
                best_t, best_tri, best_u, best_v,
                first_hit=first_hit, done_code=int(bvh.num_rows),
                stack_depth=int(snode.shape[0]), tile=pallas_tile,
                interpret=pallas_interpret)
            return (idx, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmin,
                    cur2, pmask2, snode2, smask2, sp2,
                    bt2, btri2, bu2, bv2, it + 1)

        alive = cur != done_code
        is_leaf = alive & (cur < 0)
        is_int = alive & (cur >= 0)
        if rec_override is not None:
            # Peeled first step: every live lane is at the root, so the
            # record is a BROADCAST of one statically-indexed row instead of
            # a gather — and the all-same-row gather it replaces is this
            # platform's measured WORST case (tools/microbench_onehot_top.py:
            # 13.2 ms vs 8.2 ms random at 518k lanes). Dead lanes see
            # different rec values than the gather path would give them, but
            # every rec consumer is masked by is_leaf/is_int, so the state
            # update is bit-identical.
            rec = rec_override
        else:
            # The only gather. Split into 4 independent 32-wide sub-gathers
            # + concat (DMA latency overlap) when split_gather_enabled():
            # round 2 measured this ~1.3x on the isolated gather but it
            # MISCOMPILED inside while_loop on the then-current axon stack
            # (lanes >= 128 silently returned misses for N <= ~576);
            # round-5's canary harness measured the bug GONE and the split
            # 5.2x on the isolated dependent walk (artifacts/canary.json).
            # The single-gather fallback stays one env knob away
            # (DXRPT_NO_SPLIT_GATHER=1).
            # Dead (finished-but-not-yet-compacted) lanes still participate
            # in the gather; row 0 for all of them is the platform's WORST
            # gather pattern (microbench_onehot_top.py: all-same-row 13.2 ms
            # vs random 8.2 at 518k). DXRPT_SPREAD_DEAD_ROWS=1 spreads dead
            # lanes across rows instead (consumers are masked by
            # is_leaf/is_int, so results are bit-identical).
            if int(os.environ.get("DXRPT_SPREAD_DEAD_ROWS", "0")):
                dead_row = idx % jnp.int32(bvh.num_rows)
            else:
                dead_row = 0
            row = jnp.where(is_leaf, ~cur, jnp.where(is_int, cur, dead_row))
            rec = _gather_record(bvh.table, quarters, row)  # (m, RECORD)

        # ---- internal: slab-test all W children, bank by bank ----
        # (one (m, 8) f32 bank classically; two (m, W/2) de-interleaved bf16
        # banks for wide records — see _child_banks)
        hit_mask = jnp.zeros_like(pmask)
        near_key = near_code = near_bit = None
        for (lox, loy, loz), (hix, hiy, hiz), codes_b, off, hw in \
                _child_banks(bvh, rec):
            tx0 = (lox - ox[:, None]) * ivx[:, None]
            tx1 = (hix - ox[:, None]) * ivx[:, None]
            ty0 = (loy - oy[:, None]) * ivy[:, None]
            ty1 = (hiy - oy[:, None]) * ivy[:, None]
            tz0 = (loz - oz[:, None]) * ivz[:, None]
            tz1 = (hiz - oz[:, None]) * ivz[:, None]
            tn8 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                              jnp.maximum(jnp.minimum(tz0, tz1), tmin[:, None]))
            tf8 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                              jnp.minimum(jnp.maximum(tz0, tz1), best_t[:, None]))
            # Empty child slots carry inverted bounds (lo=3e38 > hi=-3e38);
            # they must be masked from the RECORD, not the slab result —
            # (3e38 - o) / d overflows to inf for steep rays, making the
            # inverted box "hit".
            valid8 = lox <= hix
            # pmask bit off+k gates child slot off+k: all-ones on a fresh
            # visit, the saved remaining-children mask on a popped resume.
            slot_pow2 = (jnp.int32(1)
                         << (off + jnp.arange(hw, dtype=jnp.int32)))[None, :]
            gate = (pmask[:, None] & slot_pow2) != 0
            hit8 = (is_int[:, None] & valid8 & (tn8 <= tf8) & gate)  # (m, hw)

            keys8 = jnp.where(hit8, tn8, _BIG)
            hit_mask = hit_mask | jnp.sum(jnp.where(hit8, slot_pow2, 0), axis=1)
            nk, nc, nb = _argmin8_block(keys8, codes_b, hw, off)
            if near_key is None:
                near_key, near_code, near_bit = nk, nc, nb
            else:
                # strict < keeps the lower-index bank on ties (the lowest
                # child slot wins, matching the single-bank rule)
                take = nk < near_key
                near_code = jnp.where(take, nc, near_code)
                near_bit = jnp.where(take, nb, near_bit)
                near_key = jnp.minimum(nk, near_key)
        any_child = near_key < _BIG
        rest_mask = hit_mask & ~near_bit

        # ---- leaf: inline triangle intersection ----
        best_t, best_tri, best_u, best_v = _intersect_leaf(
            bvh, rec, (ox, oy, oz), (dx, dy, dz), tmin, is_leaf,
            (best_t, best_tri, best_u, best_v), accept_fn)

        # ---- stack: ONE (node, mask) push when siblings remain ----
        do_push = is_int & any_child & (rest_mask != 0)
        at_sp = (levels == sp[None, :]) & do_push[None, :]
        snode = jnp.where(at_sp, cur[None, :], snode)
        smask = jnp.where(at_sp, rest_mask[None, :], smask)
        sp_pushed = sp + do_push.astype(jnp.int32)

        # ---- next cursor: descend nearest, else pop (parent, mask) ----
        need_pop = is_leaf | (is_int & ~any_child)
        at_top = levels == (sp_pushed - 1)[None, :]
        top_node = jnp.sum(jnp.where(at_top, snode, 0), axis=0)
        top_mask = jnp.sum(jnp.where(at_top, smask, 0), axis=0)
        can_pop = sp_pushed > 0
        popped = jnp.where(can_pop, top_node, done_code)
        cur_next = jnp.where(is_int & any_child, near_code,
                             jnp.where(need_pop, popped, done_code))
        cur_next = jnp.where(alive, cur_next, done_code)
        pmask_next = jnp.where(need_pop & can_pop, top_mask,
                               jnp.full_like(pmask, _full_mask(bvh.width)))
        sp_next = jnp.where(need_pop & can_pop, sp_pushed - 1, sp_pushed)

        if first_hit:
            # ACCEPT_FIRST_HIT_AND_END_SEARCH: stop the lane once anything hit.
            found = best_tri >= 0
            cur_next = jnp.where(found, done_code, cur_next)
            sp_next = jnp.where(found, 0, sp_next)

        return (idx, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmin,
                cur_next, pmask_next, snode, smask, sp_next,
                best_t, best_tri, best_u, best_v, it + 1)

    min_compact, max_phases = compact_knobs(PER_RAY_MIN_COMPACT_SIZE,
                                            PER_RAY_MAX_COMPACT_PHASES)
    sizes = [n]
    while (len(sizes) <= max_phases
           and sizes[-1] // 2 >= min_compact):
        nxt = sizes[-1] // 2
        if nxt >= 2048:
            # multiples of 2048 give the Pallas body its full lane tile
            nxt = (nxt // 2048) * 2048
        sizes.append(nxt)

    # Two traversal steps per while_loop iteration: a loop iteration carries
    # ~130 us fixed cost regardless of lane count (tools/costmodel.py), and
    # the body is a no-op on finished lanes, so the occasional extra step is
    # free while the fixed cost halves.
    UNROLL = int(os.environ.get("DXRPT_TRAVERSE_UNROLL", "2"))

    def body_unrolled(s):
        for _ in range(UNROLL):
            s = body(s)
        return s

    keys_order = ("idx", "ox", "oy", "oz", "dx", "dy", "dz",
                  "ivx", "ivy", "ivz", "tmin",
                  "cur", "pmask", "snode", "smask", "sp",
                  "bt", "btri", "bu", "bv")
    it = jnp.zeros((), jnp.int32)

    # Root peel: run step 1 OUTSIDE the loop with the root record broadcast
    # from a static index — no gather. Only applies when the root is an
    # internal row (single-leaf scenes start at a leaf). Bit-exact vs the
    # unpeeled loop (the loop just runs one fewer iteration). Measured
    # NEUTRAL on the v5e (tools/ab_root_peel.py: -0.1%/+0.2% on the
    # production bounce/terminal populations) — the all-same-row gather the
    # peel removes is only the platform's worst case when EVERY iteration
    # is degenerate (microbench_onehot_top.py clips all steps), not for the
    # single first step. Default OFF: zero steady-state win, one extra body
    # instantiation per traversal compile.
    if int(os.environ.get("DXRPT_ROOT_PEEL", "0")) and bvh.root_code >= 0:
        rec0 = jnp.broadcast_to(bvh.table[bvh.root_code][None, :],
                                (n, bvh.table.shape[1]))
        state = tuple(lane[k] for k in keys_order) + (it,)
        state = body(state, rec_override=rec0)
        lane = dict(zip(keys_order, state[:-1]))
        it = state[-1]
    phase_iters = []  # cumulative step count at each phase boundary (stats)
    exit_chunks = []  # packed rows of lanes that exited at each boundary
    for pi, size in enumerate(sizes):
        final = pi == len(sizes) - 1
        state = tuple(lane[k] for k in keys_order) + (it,)

        if final:
            def cond(s):
                return jnp.any(s[11] != done_code) & (s[20] < max_iters)
        else:
            next_size = sizes[pi + 1]

            def cond(s, _ns=next_size):
                n_alive = jnp.sum((s[11] != done_code).astype(jnp.int32))
                return (n_alive > _ns) & (s[20] < max_iters)

        state = jax.lax.while_loop(cond, body_unrolled, state)
        lane = dict(zip(keys_order, state[:-1]))
        it = state[-1]
        phase_iters.append(it)

        if not final:
            # Boundary compaction. Measured costs drove this shape
            # (PERF_NOTES.md): each separate jnp.take of an (m,) lane array
            # is its own row-count-bound gather (~5.7 ms at 518k — 18 arrays
            # made ONE boundary cost 135 ms, more than all the loop steps),
            # so the lane state moves as ONE packed (m, 18) row gather. The
            # permutation partitions survivors first; the suffix rows are
            # lanes exiting NOW — collected per boundary and delivered once
            # at the end instead of re-scattering all four result arrays at
            # every boundary (halves total scatter volume).
            nxt = sizes[pi + 1]
            perm = _compact_perm(lane["cur"] == done_code, size)
            packed = jnp.take(_pack_lane(lane), perm, axis=0)
            exit_chunks.append(packed[nxt:])
            sperm = perm[:nxt]
            new_lane = _unpack_lane(packed[:nxt])
            new_lane["snode"] = jnp.take(lane["snode"], sperm, axis=1)
            new_lane["smask"] = jnp.take(lane["smask"], sperm, axis=1)
            lane = new_lane

    # ---- END delivery: every lane's result written exactly once ----
    col = {k: j for j, k in enumerate(_PACK_KEYS)}
    if exit_chunks:
        allp = jnp.concatenate(exit_chunks + [_pack_lane(lane)], axis=0)
        idx_all = jax.lax.bitcast_convert_type(allp[:, col["idx"]], jnp.int32)
        tri_all = jax.lax.bitcast_convert_type(allp[:, col["btri"]], jnp.int32)
        out_tri = jnp.zeros((n,), jnp.int32).at[idx_all].set(
            tri_all, unique_indices=True)
        out_t = jnp.zeros((n,), jnp.float32).at[idx_all].set(
            allp[:, col["bt"]], unique_indices=True)
        if first_hit:
            # any_hit consumers read hit/t only; skip two scatters
            out_u = jnp.zeros((n,), jnp.float32)
            out_v = jnp.zeros((n,), jnp.float32)
        else:
            out_u = jnp.zeros((n,), jnp.float32).at[idx_all].set(
                allp[:, col["bu"]], unique_indices=True)
            out_v = jnp.zeros((n,), jnp.float32).at[idx_all].set(
                allp[:, col["bv"]], unique_indices=True)
    else:
        # single phase: lanes never moved, results are already in ray order
        out_t, out_tri = lane["bt"], lane["btri"]
        out_u, out_v = lane["bu"], lane["bv"]

    rec = HitRecord(t=out_t, tri_id=out_tri, u=out_u, v=out_v)
    if stats:
        return rec, {"sizes": tuple(sizes),
                     "phase_iters": jnp.stack(phase_iters)}
    return rec


# ---------------------------------------------------------------------------
# Lane-count quarantine — axon TPU wrong-result band (2026-08-18).
#
# On the tunneled axon/Mosaic stack, per-ray AND packet traversals over the
# theInn-size tables compile SILENTLY WRONG for dispatch lane counts in a
# contiguous band: every lane returns the same single triangle at t ~ 0
# (measured sweep on random rays, both W8 and W32 tables, jit-only, eager
# and CPU correct):
#     n = 6912/16384/32768: correct     n = 36864..98304: DEGENERATE
#     n = 131072/147456/518400/524288: correct
# This black-baked every Stronghold@192 lightmap (192^2 = 36864 texel rays)
# while all production render/bake shapes sat outside the band — the class
# of bug tools/crosscheck_tpu.py exists for (now covering bakes too).
# Until the platform bug is fixed, any traversal dispatch whose lane count
# falls inside the open band is PADDED with inactive lanes up to the
# verified-good upper edge: padding changes only data (the padded program
# shape is measured-correct), costs nothing outside the band, and is
# disabled with DXRPT_NO_LANE_PAD=1 for A/Bs. Padding equivalence is pinned
# by tests/test_traverse.py::test_quarantine_pad_equivalence.
_PAD_BAND_LO = 32768   # largest verified-good shape below the band
_PAD_BAND_HI = 131072  # first verified-good shape above the band

# Round 4: the band is sweep-derived, not folklore. tools/sweep_lane_bands.py
# compiles+runs every grid lane count on the device for all 5 scene tables
# (both widths, render + bake ray populations) against the verified REF_N
# dispatch and an independent numpy brute-force oracle, then writes the
# measured band to data/lane_quarantine.json. The constants above remain the
# fallback when no sweep artifact is committed.
try:
    import json as _json
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "lane_quarantine.json")) as _f:
        _q = _json.load(_f)
    _PAD_BAND_LO = int(_q["band_lo"])
    _PAD_BAND_HI = int(_q["band_hi"])
except (OSError, KeyError, ValueError):
    pass


_IS_TPU = None


def quarantine_pad_count(n: int) -> int:
    """Extra inactive lanes that move a dispatch out of the quarantined
    lane-count band (0 when n is outside the band or padding is disabled).
    TPU-only: the band is a device-compiler wrong-result class; the CPU
    backend is the correctness reference and must not pay the pad (the
    round-5 widened band would otherwise pad every small CI render 19x)."""
    if os.environ.get("DXRPT_NO_LANE_PAD"):
        return 0
    global _IS_TPU
    if _IS_TPU is None:
        import jax
        _IS_TPU = jax.default_backend() not in ("cpu",)
    if not _IS_TPU:
        return 0
    if _PAD_BAND_LO < n < _PAD_BAND_HI:
        return _PAD_BAND_HI - n
    return 0


def pad_traversal_args(pad, ray_o, ray_d, t_min, t_max, active):
    """Append `pad` inactive lanes (unit-x direction, t_max 0) to a
    traversal dispatch; callers slice the results back to the original n."""
    f32 = jnp.float32
    dpad = jnp.zeros((pad, 3), f32).at[:, 0].set(1.0)
    return (jnp.concatenate([ray_o, jnp.zeros((pad, 3), f32)], axis=0),
            jnp.concatenate([ray_d, dpad], axis=0),
            jnp.concatenate([t_min, jnp.zeros((pad,), f32)]),
            jnp.concatenate([t_max, jnp.zeros((pad,), f32)]),
            jnp.concatenate([active, jnp.zeros((pad,), jnp.bool_)]))


def closest_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None, accept_fn=None):
    """Closest-hit traversal over a flat ray batch.

    ray_o/ray_d: (N, 3); t_min/t_max: scalar or (N,); active: (N,) bool or None.
    Returns HitRecord with t==t_max and tri_id==-1 for misses.
    """
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    pad = quarantine_pad_count(n)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    rec = _traverse(bvh, ray_o, ray_d, t_min, t_max, active, accept_fn, first_hit=False)
    if pad:
        rec = HitRecord(t=rec.t[:n], tri_id=rec.tri_id[:n],
                        u=rec.u[:n], v=rec.v[:n])
    return rec


def any_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None, accept_fn=None):
    """Any-hit (shadow) traversal; returns visibility (N,) f32 in {0, 1}.

    Mirrors ShadowPayload semantics (RayTrace.hlsl:73-76,533-541): 1 when
    unoccluded. Lanes terminate at the first accepted hit.
    """
    return any_hit_rec(bvh, ray_o, ray_d, t_min, t_max, active, accept_fn)[0]


def any_hit_rec(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None,
                accept_fn=None):
    """any_hit that also returns the occluder triangle id (-1 when
    unoccluded) — consumed by the history-seeded sun-shadow path
    (accel/history.py), which retests last sample's occluder first."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    pad = quarantine_pad_count(n)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    rec = _traverse(bvh, ray_o, ray_d, t_min, t_max, active, accept_fn, first_hit=True)
    return jnp.where(rec.hit, 0.0, 1.0)[:n], rec.tri_id[:n]
