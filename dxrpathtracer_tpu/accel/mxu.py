"""MXU packet traversal — fat-leaf BVH with leaf intersection as matmuls.

The TPU-first redesign of TraceRay (RayTrace.hlsl:138): where accel/packet.py
intersects 12-triangle leaves on the VPU (~40 elementwise ops per ray-tri
pair), this traversal makes leaves FAT (MXU_LEAF=64 triangles) and computes
all four Moller-Trumbore quantities for a 128-ray packet x 64-triangle leaf
as THREE small batched matmuls on the MXU:

    ray features   F = [d, m, o', 1]        (K, 10), m = o' x d (Plucker
                                            moment about the leaf anchor)
    det' = [d]        @ [e2 x e1]           (K,3) @ (3,L)
    u'   = [d, m]     @ [-(e2 x v0') ; e2]  (K,6) @ (6,L)
    v'   = [d, m]     @ [-(v0' x e1) ; -e1] (K,6) @ (6,L)
    t'   = [o', 1]    @ [e1 x e2 ; -v0'.n]  (K,4) @ (4,L)
    u = u'/det', v = v'/det', t = t'/det'

Anchoring o' = o - leaf_center and storing v0' leaf-local keeps every factor
leaf-scale, so precision matches classic f32 Moller-Trumbore (validated: 0
hit/miss disagreements vs f64 on 600k random pairs; tests/test_mxu.py pins
agreement against accel/traverse.py on scenes). Triangle feature columns are
built on the VPU per leaf VISIT (~50 flops/tri, shared by all 128 rays) from
the raw v0'/e1/e2 record, so the leaf table stays compact.

Fat leaves make the tree ~4x shallower than the 12-tri unified layout: the
lockstep walk runs ~5x fewer iterations (each ~130 us of while_loop fixed
cost on this platform), and the per-pair intersection flops move to the MXU
which has ~20-100x the VPU's f32 throughput.

Structure: an outer while_loop alternates two inner phases —
  walk:  8-ary ordered descent over the 256 B internal records (same
         (node, mask) short-stack scheme as accel/packet.py), but leaf
         children are ENQUEUED (id + packet-min entry t) instead of visited;
  drain: the queue is sorted front-to-back (odd-even transposition — no
         axis-1 gathers inside loop bodies, which miscompile on the axon
         stack; PERF_NOTES.md) and leaves are intersected one per iteration
         with early-stop once the next entry t can no longer beat any ray's
         current best.
A packet whose queue nears capacity stalls walking until the next drain, so
queue overflow is impossible and every leaf is processed exactly once.

Semantics match accel/traverse.py (closest: nearest hit; any-hit:
ACCEPT_FIRST_HIT_AND_END_SEARCH) for accept_fn=None; alpha-tested rays use
the per-ray path, exactly like accel/packet.py.
"""

import jax
import jax.numpy as jnp

from .lbvh import MXU_LEAF, SplitBVH, WIDTH
from .traverse import HitRecord, _argmin8_block, _bitcast_i32, _safe_inv, _BIG

PACKET = 128
QUEUE = 32          # leaf-queue slots per packet
_HIGH = jax.lax.Precision.HIGHEST


def _oddeven_sort_pairs(key, val):
    """Sort (key, val) along axis 1 ascending by key via odd-even
    transposition (Q static passes of neighbor compare-exchange; pure
    reshapes/slices — no gathers)."""
    p, q = key.shape
    for step in range(q):
        if step % 2 == 0:
            ka = key[:, 0::2]
            kb = key[:, 1::2]
            va = val[:, 0::2]
            vb = val[:, 1::2]
            swap = ka > kb
            k0 = jnp.where(swap, kb, ka)
            k1 = jnp.where(swap, ka, kb)
            v0 = jnp.where(swap, vb, va)
            v1 = jnp.where(swap, va, vb)
            key = jnp.stack([k0, k1], axis=2).reshape(p, q)
            val = jnp.stack([v0, v1], axis=2).reshape(p, q)
        else:
            ka = key[:, 1:-1:2]
            kb = key[:, 2::2]
            va = val[:, 1:-1:2]
            vb = val[:, 2::2]
            swap = ka > kb
            k0 = jnp.where(swap, kb, ka)
            k1 = jnp.where(swap, ka, kb)
            v0 = jnp.where(swap, vb, va)
            v1 = jnp.where(swap, va, vb)
            mid_k = jnp.stack([k0, k1], axis=2).reshape(p, q - 2)
            mid_v = jnp.stack([v0, v1], axis=2).reshape(p, q - 2)
            key = jnp.concatenate([key[:, :1], mid_k, key[:, -1:]], axis=1)
            val = jnp.concatenate([val[:, :1], mid_v, val[:, -1:]], axis=1)
    return key, val


def _mxu_traverse(bvh: SplitBVH, ray_o, ray_d, t_min, t_max, active,
                  first_hit: bool, stats: bool = False):
    n = ray_o.shape[0]
    if n % PACKET != 0:
        raise ValueError(f"mxu traversal needs N % {PACKET} == 0, got {n}")
    p = n // PACKET
    K = PACKET
    L = bvh.leaf_size
    Q = QUEUE
    f32 = jnp.float32
    i32 = jnp.int32

    def pk(x):
        return x.reshape(p, K)

    ox, oy, oz = pk(ray_o[:, 0]), pk(ray_o[:, 1]), pk(ray_o[:, 2])
    dx, dy, dz = pk(ray_d[:, 0]), pk(ray_d[:, 1]), pk(ray_d[:, 2])
    inv_d = _safe_inv(ray_d)
    ivx, ivy, ivz = pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2])
    tmin = pk(t_min.astype(f32))
    act = pk(active)

    done = jnp.int32(bvh.num_int_rows)   # cur == done => walk finished
    stack_depth = bvh.max_depth + 2
    levels = jnp.arange(stack_depth, dtype=i32)[:, None]
    slot_pow2 = jnp.int32(1) << jnp.arange(WIDTH, dtype=i32)[None, :]
    qcols = jnp.arange(Q, dtype=i32)[None, :]
    max_walk = bvh.num_int_rows * 2 + stack_depth + 8
    max_outer = bvh.num_leaves + 4

    packet_live0 = jnp.any(act, axis=1)
    if bvh.root_code >= 0:
        cur0 = jnp.where(packet_live0, jnp.int32(bvh.root_code), done)
        qn0 = jnp.zeros((p,), i32)
        qid0 = jnp.zeros((p, Q), i32)
        qt0 = jnp.full((p, Q), _BIG, f32)
    else:
        # single-leaf scene: enqueue the root leaf directly
        cur0 = jnp.full((p,), done, i32)
        qn0 = jnp.where(packet_live0, 1, 0).astype(i32)
        qid0 = jnp.zeros((p, Q), i32).at[:, 0].set(jnp.int32(~bvh.root_code))
        qt0 = jnp.full((p, Q), _BIG, f32).at[:, 0].set(
            jnp.where(packet_live0, jnp.minimum(jnp.min(tmin, axis=1), _BIG),
                      _BIG))

    state = dict(
        cur=cur0, pmask=jnp.full((p,), 0xFF, i32),
        snode=jnp.zeros((stack_depth, p), i32),
        smask=jnp.zeros((stack_depth, p), i32),
        sp=jnp.zeros((p,), i32),
        qn=qn0, qid=qid0, qt=qt0,
        bt=pk(t_max.astype(f32)),
        btri=jnp.full((p, K), -1, i32),
        bu=jnp.zeros((p, K), f32),
        bv=jnp.zeros((p, K), f32),
        it=jnp.zeros((), i32),
    )

    def ray_live_of(s):
        if first_hit:
            return act & (s["btri"] < 0)
        return act

    # ---------------- walk phase ----------------
    def walk_body(s):
        cur = s["cur"]
        alive = cur != done
        # stall when the queue can't absorb a full node's worth of leaves
        walkable = alive & (s["qn"] <= Q - WIDTH)
        ray_live = act
        if first_hit:
            ray_live = ray_live & (s["btri"] < 0)

        row = jnp.where(walkable, cur, 0)
        rec = jnp.take(bvh.int_table, row, axis=0, mode="clip")  # (p, 64)

        lox, loy, loz = rec[:, 0:8], rec[:, 8:16], rec[:, 16:24]
        hix, hiy, hiz = rec[:, 24:32], rec[:, 32:40], rec[:, 40:48]
        codes8 = _bitcast_i32(rec[:, 48:56])

        def axis_minmax(lo, hi, o, iv):
            a = (lo[:, :, None] - o[:, None, :]) * iv[:, None, :]
            b = (hi[:, :, None] - o[:, None, :]) * iv[:, None, :]
            return jnp.minimum(a, b), jnp.maximum(a, b)

        nx, xx_ = axis_minmax(lox, hix, ox, ivx)
        ny, xy_ = axis_minmax(loy, hiy, oy, ivy)
        nz, xz_ = axis_minmax(loz, hiz, oz, ivz)
        tn = jnp.maximum(jnp.maximum(nx, ny),
                         jnp.maximum(nz, tmin[:, None, :]))
        tf = jnp.minimum(jnp.minimum(xx_, xy_),
                         jnp.minimum(xz_, s["bt"][:, None, :]))
        valid8 = lox <= hix
        gate = (s["pmask"][:, None] & slot_pow2) != 0
        ray_hit8 = (tn <= tf) & ray_live[:, None, :]
        hit8 = walkable[:, None] & valid8 & gate & jnp.any(ray_hit8, axis=2)
        tn_min = jnp.min(jnp.where(ray_hit8, tn, _BIG), axis=2)  # (p, 8)

        leaf8 = hit8 & (codes8 < 0)
        int8 = hit8 & (codes8 >= 0)

        # ---- enqueue ALL hit leaf children at qn, qn+1, ... ----
        rank = jnp.cumsum(leaf8.astype(i32), axis=1) - leaf8.astype(i32)
        slot_pos = s["qn"][:, None] + rank                        # (p, 8)
        write = (qcols[:, :, None] == slot_pos[:, None, :]) & leaf8[:, None, :]
        qid = jnp.where(jnp.any(write, axis=2),
                        jnp.sum(jnp.where(write, (~codes8)[:, None, :], 0),
                                axis=2), s["qid"])
        qt = jnp.where(jnp.any(write, axis=2),
                       jnp.sum(jnp.where(write, tn_min[:, None, :], 0.0),
                               axis=2), s["qt"])
        qn = s["qn"] + jnp.sum(leaf8, axis=1)

        # ---- descend nearest INTERNAL child; push the rest ----
        keys8 = jnp.where(int8, tn_min, _BIG)
        hit_mask = jnp.sum(jnp.where(int8, slot_pow2, 0), axis=1)
        near_key, near_code, near_bit = _argmin8_block(keys8, codes8)
        any_child = near_key < _BIG
        rest_mask = hit_mask & ~near_bit

        do_push = walkable & any_child & (rest_mask != 0)
        at_sp = (levels == s["sp"][None, :]) & do_push[None, :]
        snode = jnp.where(at_sp, cur[None, :], s["snode"])
        smask = jnp.where(at_sp, rest_mask[None, :], s["smask"])
        sp_pushed = s["sp"] + do_push.astype(i32)

        need_pop = walkable & ~any_child
        at_top = levels == (sp_pushed - 1)[None, :]
        top_node = jnp.sum(jnp.where(at_top, snode, 0), axis=0)
        top_mask = jnp.sum(jnp.where(at_top, smask, 0), axis=0)
        can_pop = sp_pushed > 0
        popped = jnp.where(can_pop, top_node, done)
        cur_next = jnp.where(walkable & any_child, near_code,
                             jnp.where(need_pop, popped, cur))
        cur_next = jnp.where(alive, cur_next, done)
        pmask_next = jnp.where(need_pop & can_pop, top_mask,
                               jnp.where(walkable,
                                         jnp.full_like(s["pmask"], 0xFF),
                                         s["pmask"]))
        sp_next = jnp.where(need_pop & can_pop, sp_pushed - 1, sp_pushed)

        if first_hit:
            all_found = ~jnp.any(act & (s["btri"] < 0), axis=1)
            cur_next = jnp.where(all_found, done, cur_next)
            sp_next = jnp.where(all_found, 0, sp_next)
            qn = jnp.where(all_found, 0, qn)

        return dict(s, cur=cur_next, pmask=pmask_next, snode=snode,
                    smask=smask, sp=sp_next, qn=qn, qid=qid, qt=qt,
                    it=s["it"] + 1)

    def walk_cond(s):
        walkable = (s["cur"] != done) & (s["qn"] <= Q - WIDTH)
        return jnp.any(walkable) & (s["it"] < max_walk)

    # ---------------- drain phase ----------------
    tmin3 = tmin[:, :, None]

    def drain_body(ds):
        s, dp = ds
        live = dp < s["qn"]
        ray_live = ray_live_of(s)

        sel = qcols == dp[:, None]
        lid = jnp.sum(jnp.where(sel, s["qid"], 0), axis=1)
        lt = jnp.sum(jnp.where(sel & live[:, None], s["qt"], 0.0), axis=1)
        lt = jnp.where(live, lt, _BIG)

        # queue is sorted: once the next entry can't beat ANY live ray's
        # best, every later entry can't either -> finish this packet.
        pmax = jnp.max(jnp.where(ray_live, s["bt"], -_BIG), axis=1)
        skip_rest = live & (lt >= pmax)
        process = live & ~skip_rest
        dp_next = jnp.where(skip_rest, s["qn"], dp + live.astype(i32))

        row = jnp.where(process, lid, 0)
        lrec = jnp.take(bvh.leaf_table, row, axis=0, mode="clip")  # (p, LEAF_ROW)

        v0x, v0y, v0z = lrec[:, 0:L], lrec[:, L:2 * L], lrec[:, 2 * L:3 * L]
        e1x, e1y, e1z = (lrec[:, 3 * L:4 * L], lrec[:, 4 * L:5 * L],
                         lrec[:, 5 * L:6 * L])
        e2x, e2y, e2z = (lrec[:, 6 * L:7 * L], lrec[:, 7 * L:8 * L],
                         lrec[:, 8 * L:9 * L])
        tid = _bitcast_i32(lrec[:, 9 * L:10 * L])                 # (p, L)
        cx = lrec[:, 10 * L:10 * L + 1]                           # (p, 1)
        cy = lrec[:, 10 * L + 1:10 * L + 2]
        cz = lrec[:, 10 * L + 2:10 * L + 3]

        # ray features about the leaf anchor
        opx, opy, opz = ox - cx, oy - cy, oz - cz                 # (p, K)
        mx = opy * dz - opz * dy
        my = opz * dx - opx * dz
        mz = opx * dy - opy * dx

        # triangle columns (component math on (p, L) blocks)
        axc = e2y * e1z - e2z * e1y
        ayc = e2z * e1x - e2x * e1z
        azc = e2x * e1y - e2y * e1x
        bxc = -(e2y * v0z - e2z * v0y)
        byc = -(e2z * v0x - e2x * v0z)
        bzc = -(e2x * v0y - e2y * v0x)
        cxc = -(v0y * e1z - v0z * e1y)
        cyc = -(v0z * e1x - v0x * e1z)
        czc = -(v0x * e1y - v0y * e1x)
        nxc = e1y * e2z - e1z * e2y
        nyc = e1z * e2x - e1x * e2z
        nzc = e1x * e2y - e1y * e2x
        d0c = -(v0x * nxc + v0y * nyc + v0z * nzc)

        F3 = jnp.stack([dx, dy, dz], axis=2)                      # (p, K, 3)
        F6 = jnp.stack([dx, dy, dz, mx, my, mz], axis=2)          # (p, K, 6)
        F4 = jnp.stack([opx, opy, opz, jnp.ones_like(opx)], axis=2)

        Cdet = jnp.stack([axc, ayc, azc], axis=1)                 # (p, 3, L)
        Cu = jnp.stack([bxc, byc, bzc, e2x, e2y, e2z], axis=1)    # (p, 6, L)
        Cv = jnp.stack([cxc, cyc, czc, -e1x, -e1y, -e1z], axis=1)
        Ct = jnp.stack([nxc, nyc, nzc, d0c], axis=1)              # (p, 4, L)

        mm = lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))), precision=_HIGH)
        det = mm(F3, Cdet)                                        # (p, K, L)
        up = mm(F6, Cu)
        vp = mm(F6, Cv)
        tp = mm(F4, Ct)

        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        u = up * inv_det
        v = vp * inv_det
        t = tp * inv_det
        ok = (process[:, None, None] & ray_live[:, :, None]
              & (tid >= 0)[:, None, :] & (jnp.abs(det) > 1e-12)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= tmin3) & (t < s["bt"][:, :, None]))

        key = jnp.where(ok, t, _BIG)                              # (p, K, L)
        ck = jnp.min(key, axis=2)                                 # (p, K)
        slot = jnp.arange(L, dtype=i32)[None, None, :]
        min_slot = jnp.min(jnp.where(key <= ck[:, :, None], slot, L), axis=2)
        first = slot == min_slot[:, :, None]
        ctid = jnp.sum(jnp.where(first, tid[:, None, :], 0), axis=2)
        cu = jnp.sum(jnp.where(first, u, 0.0), axis=2)
        cv = jnp.sum(jnp.where(first, v, 0.0), axis=2)
        win = ck < _BIG
        s = dict(s,
                 btri=jnp.where(win, ctid, s["btri"]),
                 bu=jnp.where(win, cu, s["bu"]),
                 bv=jnp.where(win, cv, s["bv"]),
                 bt=jnp.where(win, ck, s["bt"]))
        return (s, dp_next)

    def drain_cond(ds):
        s, dp = ds
        return jnp.any(dp < s["qn"])

    # ---------------- outer loop ----------------
    def outer_body(os_):
        s, oit = os_
        s = jax.lax.while_loop(walk_cond, walk_body, s)
        key, vals = _oddeven_sort_pairs(
            jnp.where(qcols < s["qn"][:, None], s["qt"], _BIG),
            s["qid"])
        s = dict(s, qt=key, qid=vals)
        s, _dp = jax.lax.while_loop(drain_cond, drain_body,
                                    (s, jnp.zeros((p,), i32)))
        s = dict(s, qn=jnp.zeros((p,), i32), qt=jnp.full((p, Q), _BIG, f32))
        return (s, oit + 1)

    def outer_cond(os_):
        s, oit = os_
        unfinished = (s["cur"] != done) | (s["qn"] > 0)
        return jnp.any(unfinished) & (oit < max_outer)

    state, outer_iters = jax.lax.while_loop(outer_cond, outer_body,
                                            (state, jnp.zeros((), i32)))

    rec = HitRecord(t=state["bt"].reshape(n), tri_id=state["btri"].reshape(n),
                    u=state["bu"].reshape(n), v=state["bv"].reshape(n))
    if stats:
        return rec, {"walk_iters": state["it"], "outer_iters": outer_iters}
    return rec


def mxu_closest_hit(bvh: SplitBVH, ray_o, ray_d, t_min, t_max, active=None):
    """Closest-hit over coherent 128-ray packets via the MXU leaf matmuls.
    accept_fn unsupported — alpha-tested rays use accel.traverse."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    return _mxu_traverse(bvh, ray_o, ray_d, t_min, t_max, active,
                         first_hit=False)


def mxu_any_hit(bvh: SplitBVH, ray_o, ray_d, t_min, t_max, active=None):
    """ACCEPT_FIRST_HIT_AND_END_SEARCH visibility over packets; returns (N,)
    f32 (1 = unoccluded), matching traverse.any_hit."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    rec = _mxu_traverse(bvh, ray_o, ray_d, t_min, t_max, active,
                        first_hit=True)
    return jnp.where(active & (rec.tri_id >= 0), 0.0, 1.0)
