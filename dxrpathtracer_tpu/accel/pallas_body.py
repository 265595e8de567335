"""Pallas (Mosaic) kernel for the per-ray traversal loop body.

Why this exists — two measured walls of the XLA while_loop body
(PERF_NOTES.md):
  1. the gathered (m, 128) record buffer is re-streamed from HBM ~5x per
     iteration (each of the ~20 block slices re-reads full 512 B rows);
     the kernel reads each record tile into VMEM ONCE;
  2. the body's natural shapes put the record's 8/12-wide component blocks
     on the VPU's 128-lane minor dimension (6-16x lane waste). A fully
     component-major XLA variant measured 2.7x faster per step but
     MISCOMPILES on the axon stack (silent wrong traversals —
     PERF_NOTES.md round 1); here the transpose is explicit and local:
     each (T, 128) record tile is transposed once in VMEM and every body
     op runs as (components, T) with rays on the VPU lanes.

The while_loop and the row gather stay in XLA (Mosaic's dynamic_gather
cannot express per-lane table rows); the kernel replaces everything between
the gather and the next-state carry, for accept_fn=None traversals (alpha
test needs texture fetches -> XLA body). Math is expression-for-expression
identical to accel/traverse.py's body — results are bit-identical, enforced
by tests/test_pallas_body.py and tools/crosscheck_tpu.py.

Measured on the v5e (960x540 Sponza-class, PERF_NOTES.md round 3): the
kernel is bit-exact vs the XLA body ON DEVICE (0/518400 mismatches across
closest/any/terminal populations) but 15-35% SLOWER (d2 sun any 244 vs
179 ms): the per-tile (T,128)->(128,T) sublane/lane transpose plus the
per-iteration pallas_call cost exceed what the re-streaming saves at
post-compaction lane counts. Default OFF; enable with DXRPT_PALLAS_BODY=1
for A/Bs. It remains the reference Pallas implementation of the traversal
body and a third cross-validating engine.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lbvh import LEAF_SIZE, RECORD, WIDTH

_BIG = 3e38  # python float: jnp scalars would be captured consts in the kernel
TILE = 2048


def enabled() -> bool:
    mode = os.environ.get("DXRPT_PALLAS_BODY", "0")
    return mode not in ("0", "", "off", "auto")


def _kernel(first_hit: bool, done_code: int, stack_depth: int,
            rec_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            ivx_ref, ivy_ref, ivz_ref, tmin_ref,
            cur_ref, pmask_ref, sp_ref, snode_ref, smask_ref,
            bt_ref, btri_ref, bu_ref, bv_ref,
            o_cur, o_pmask, o_sp, o_snode, o_smask,
            o_bt, o_btri, o_bu, o_bv):
    f32 = jnp.float32
    i32 = jnp.int32
    L = LEAF_SIZE
    T = rec_ref.shape[0]  # lane tile

    # one VMEM transpose per tile -> every op below is (components, T)
    # with rays on the 128-lane minor dimension
    recT = rec_ref[:].T                       # (RECORD, T)

    ox = ox_ref[0, :]
    oy = oy_ref[0, :]
    oz = oz_ref[0, :]
    dx = dx_ref[0, :]
    dy = dy_ref[0, :]
    dz = dz_ref[0, :]
    ivx = ivx_ref[0, :]
    ivy = ivy_ref[0, :]
    ivz = ivz_ref[0, :]
    tmin = tmin_ref[0, :]
    cur = cur_ref[0, :]
    pmask = pmask_ref[0, :]
    sp = sp_ref[0, :]
    snode = snode_ref[:, :]                   # (S, T)
    smask = smask_ref[:, :]
    best_t = bt_ref[0, :]
    best_tri = btri_ref[0, :]
    best_u = bu_ref[0, :]
    best_v = bv_ref[0, :]

    done = jnp.int32(done_code)
    alive = cur != done
    is_leaf = alive & (cur < 0)
    is_int = alive & (cur >= 0)

    # ---- internal: slab-test all 8 children ((8, T) blocks) ----
    tx0 = (recT[0:8, :] - ox[None, :]) * ivx[None, :]
    tx1 = (recT[24:32, :] - ox[None, :]) * ivx[None, :]
    ty0 = (recT[8:16, :] - oy[None, :]) * ivy[None, :]
    ty1 = (recT[32:40, :] - oy[None, :]) * ivy[None, :]
    tz0 = (recT[16:24, :] - oz[None, :]) * ivz[None, :]
    tz1 = (recT[40:48, :] - oz[None, :]) * ivz[None, :]
    tn8 = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                      jnp.maximum(jnp.minimum(tz0, tz1), tmin[None, :]))
    tf8 = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                      jnp.minimum(jnp.maximum(tz0, tz1), best_t[None, :]))
    valid8 = recT[0:8, :] <= recT[24:32, :]
    slot8 = jax.lax.broadcasted_iota(i32, (WIDTH, T), 0)
    slot_pow2 = jnp.left_shift(jnp.int32(1), slot8)
    gate = (pmask[None, :] & slot_pow2) != 0
    hit8 = is_int[None, :] & valid8 & (tn8 <= tf8) & gate
    codes8 = pltpu.bitcast(recT[48:56, :], i32)

    keys8 = jnp.where(hit8, tn8, _BIG)
    hit_mask = jnp.sum(jnp.where(hit8, slot_pow2, 0), axis=0)
    near_key = jnp.min(keys8, axis=0)
    is_min8 = keys8 <= near_key[None, :]
    near_slot = jnp.min(jnp.where(is_min8, slot8, WIDTH), axis=0)
    first8 = slot8 == near_slot[None, :]
    near_code = jnp.sum(jnp.where(first8, codes8, 0), axis=0)
    near_bit = jnp.left_shift(jnp.int32(1), near_slot)
    any_child = near_key < _BIG
    rest_mask = hit_mask & ~near_bit

    # ---- leaf: inline Moller-Trumbore ((L, T) blocks) ----
    v0x = recT[0 * L:1 * L, :]
    v0y = recT[1 * L:2 * L, :]
    v0z = recT[2 * L:3 * L, :]
    e1x = recT[3 * L:4 * L, :]
    e1y = recT[4 * L:5 * L, :]
    e1z = recT[5 * L:6 * L, :]
    e2x = recT[6 * L:7 * L, :]
    e2y = recT[7 * L:8 * L, :]
    e2z = recT[8 * L:9 * L, :]
    tid = pltpu.bitcast(recT[9 * L:10 * L, :], i32)

    rdx = dx[None, :]
    rdy = dy[None, :]
    rdz = dz[None, :]
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox[None, :] - v0x
    ty = oy[None, :] - v0y
    tz = oz[None, :] - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (is_leaf[None, :] & (tid >= 0) & (jnp.abs(det) > 1e-12)
          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= tmin[None, :]) & (t < best_t[None, :]))

    key = jnp.where(ok, t, _BIG)
    ck = jnp.min(key, axis=0)
    slotL = jax.lax.broadcasted_iota(i32, (L, T), 0)
    min_slot = jnp.min(jnp.where(key <= ck[None, :], slotL, L), axis=0)
    firstL = slotL == min_slot[None, :]
    ctid = jnp.sum(jnp.where(firstL, tid, 0), axis=0)
    cu = jnp.sum(jnp.where(firstL, u, 0.0), axis=0)
    cv = jnp.sum(jnp.where(firstL, v, 0.0), axis=0)
    win = ck < _BIG
    best_tri = jnp.where(win, ctid, best_tri)
    best_u = jnp.where(win, cu, best_u)
    best_v = jnp.where(win, cv, best_v)
    best_t = jnp.where(win, ck, best_t)

    # ---- stack: ONE (node, mask) push when siblings remain ----
    levels = jax.lax.broadcasted_iota(i32, (stack_depth, T), 0)
    do_push = is_int & any_child & (rest_mask != 0)
    at_sp = (levels == sp[None, :]) & do_push[None, :]
    snode = jnp.where(at_sp, cur[None, :], snode)
    smask = jnp.where(at_sp, rest_mask[None, :], smask)
    sp_pushed = sp + do_push.astype(i32)

    # ---- next cursor: descend nearest, else pop (parent, mask) ----
    need_pop = is_leaf | (is_int & ~any_child)
    at_top = levels == (sp_pushed - 1)[None, :]
    top_node = jnp.sum(jnp.where(at_top, snode, 0), axis=0)
    top_mask = jnp.sum(jnp.where(at_top, smask, 0), axis=0)
    can_pop = sp_pushed > 0
    popped = jnp.where(can_pop, top_node, done)
    cur_next = jnp.where(is_int & any_child, near_code,
                         jnp.where(need_pop, popped, done))
    cur_next = jnp.where(alive, cur_next, done)
    pmask_next = jnp.where(need_pop & can_pop, top_mask,
                           jnp.full_like(pmask, 0xFF))
    sp_next = jnp.where(need_pop & can_pop, sp_pushed - 1, sp_pushed)

    if first_hit:
        found = best_tri >= 0
        cur_next = jnp.where(found, done, cur_next)
        sp_next = jnp.where(found, 0, sp_next)

    o_cur[0, :] = cur_next
    o_pmask[0, :] = pmask_next
    o_sp[0, :] = sp_next
    o_snode[:, :] = snode
    o_smask[:, :] = smask
    o_bt[0, :] = best_t
    o_btri[0, :] = best_tri
    o_bu[0, :] = best_u
    o_bv[0, :] = best_v


def pick_tile(m: int, max_tile: int = TILE):
    """Largest lane-tile t with t | m, t % 128 == 0, t <= max_tile — the
    Mosaic block rule needs the last dim tiled in 128s; None when m has no
    such divisor (caller falls back to the XLA body)."""
    if m % 128 != 0:
        return None
    q = m // 128
    best = None
    for d in range(1, min(q, max_tile // 128) + 1):
        if q % d == 0:
            best = d * 128
    return best


@functools.partial(jax.jit, static_argnames=("first_hit", "done_code",
                                             "stack_depth", "tile",
                                             "interpret"))
def pallas_step(rec, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmin,
                cur, pmask, sp, snode, smask, bt, btri, bu, bv,
                first_hit: bool, done_code: int, stack_depth: int,
                tile: int, interpret: bool = False):
    """One traversal step for all m lanes via the Pallas body kernel.

    rec: (m, RECORD) gathered records; lane vectors (m,); stacks (S, m).
    Lane vectors ride as (1, m) arrays blocked (1, t): the sublane dim then
    equals the array dim (Mosaic's block rule) and rays stay on the VPU
    lane dimension. Returns (cur, pmask, sp, snode, smask, bt, btri, bu,
    bv)."""
    m = rec.shape[0]
    t = tile
    assert m % t == 0 and t % 128 == 0, (m, t)
    g = m // t
    s = stack_depth

    def v2(x):   # (m,) -> (1, m)
        return x.reshape(1, m)

    vspec = pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((s, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((t, RECORD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    f32 = jnp.float32
    i32 = jnp.int32
    out_shapes = (
        jax.ShapeDtypeStruct((1, m), i32),      # cur
        jax.ShapeDtypeStruct((1, m), i32),      # pmask
        jax.ShapeDtypeStruct((1, m), i32),      # sp
        jax.ShapeDtypeStruct((s, m), i32),      # snode
        jax.ShapeDtypeStruct((s, m), i32),      # smask
        jax.ShapeDtypeStruct((1, m), f32),      # bt
        jax.ShapeDtypeStruct((1, m), i32),      # btri
        jax.ShapeDtypeStruct((1, m), f32),      # bu
        jax.ShapeDtypeStruct((1, m), f32),      # bv
    )
    kern = functools.partial(_kernel, first_hit, done_code, stack_depth)
    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[rspec] + [vspec] * 10 + [vspec, vspec, vspec, sspec, sspec,
                                           vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec, sspec, sspec,
                   vspec, vspec, vspec, vspec),
        out_shape=out_shapes,
        interpret=interpret,
    )(rec, v2(ox), v2(oy), v2(oz), v2(dx), v2(dy), v2(dz),
      v2(ivx), v2(ivy), v2(ivz), v2(tmin),
      v2(cur), v2(pmask), v2(sp), snode, smask,
      v2(bt), v2(btri), v2(bu), v2(bv))
    cur2, pmask2, sp2, snode2, smask2, bt2, btri2, bu2, bv2 = outs
    return (cur2.reshape(m), pmask2.reshape(m), sp2.reshape(m),
            snode2, smask2,
            bt2.reshape(m), btri2.reshape(m), bu2.reshape(m), bv2.reshape(m))
