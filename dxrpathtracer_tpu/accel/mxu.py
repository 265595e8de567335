"""Fat-leaf split-table packet traversal (walk + queued leaf drain).

The second-generation packet traversal (accel/packet.py is the first): the
unified 512 B record with 12-triangle leaves is split into 256 B internal
records and FAT 64-triangle leaf records (lbvh.SplitBVH), and the single
lockstep loop is split into two phases so a leaf's 64-wide intersection test
only runs on iterations that actually consume a leaf:

  walk:  8-ary ordered descent over the internal table (same (node, mask)
         short-stack scheme as accel/packet.py), but leaf children are
         ENQUEUED (id + packet-min entry t) instead of visited — walk
         iterations touch only 256 B rows and the (8, K) slab test;
  drain: the queue is sorted front-to-back (odd-even transposition — no
         axis-1 gathers inside loop bodies, which miscompile on the axon
         stack; PERF_NOTES.md) and leaves are Moller-Trumbore-tested one per
         iteration on (L, K) VPU blocks, with early-stop once the next entry
         t can no longer beat any live ray's best.

An outer while_loop alternates the phases (a packet whose queue nears
capacity stalls walking until the next drain, so overflow is impossible);
python-level phases compact finished PACKETS between rounds exactly like
accel/packet.py (the lockstep loop pays every iteration for all packets).
Any-hit walks stall at a small queue depth so found-status propagates to the
walk's pruning quickly.

History, measured on the v5e (tools note in PERF_NOTES.md): the first
version of this module computed the leaf test as batched MXU matmuls of
anchored Plucker ray features x precomputed triangle columns (det' = d.
(e2xe1), u' = [d,m].[-(e2xv0');e2], ...; validated to f32-MT precision).
It measured 2.7-4.8x SLOWER than accel/packet.py everywhere: a (128x10) @
(10x256) batched matmul cannot feed the 128x128 systolic array — per-batch
fill dominates, x6 for HIGHEST precision. The MXU is the wrong unit for
low-rank bilinear forms; the fat-leaf/two-phase structure is kept, the
epilogue is classic component-wise VPU Moller-Trumbore (translation by the
leaf anchor keeps it bit-comparable to the unified path's math).

Semantics match accel/traverse.py (closest: nearest hit; any-hit:
ACCEPT_FIRST_HIT_AND_END_SEARCH) for accept_fn=None; alpha-tested rays use
the per-ray path, exactly like accel/packet.py.
"""

import jax
import jax.numpy as jnp

from .lbvh import SplitBVH, WIDTH
from .traverse import (HitRecord, MAX_COMPACT_PHASES, MIN_COMPACT_SIZE, _BIG,
                       _argmin8_block, _bitcast_i32, _compact_perm, _safe_inv)

PACKET = 128
QUEUE = 32          # leaf-queue slots per packet


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
    p0 = n // PACKET
    K = PACKET
    L = bvh.leaf_size
    Q = QUEUE
    f32 = jnp.float32
    i32 = jnp.int32

    def pk(x):
        return x.reshape(p0, K)

    inv_d = _safe_inv(ray_d)
    done = jnp.int32(bvh.num_int_rows)   # cur == done => walk finished
    stack_depth = bvh.max_depth + 2
    levels = jnp.arange(stack_depth, dtype=i32)[:, None]
    slot_pow2 = jnp.int32(1) << jnp.arange(WIDTH, dtype=i32)[None, :]
    qcols = jnp.arange(Q, dtype=i32)[None, :]
    max_walk = bvh.num_int_rows * 2 + stack_depth + 8
    max_outer = bvh.num_leaves + 4
    # any-hit: stall the walk at a shallow queue so drained found-status
    # prunes further walking quickly; closest: fill the queue
    qcap = WIDTH if first_hit else Q - WIDTH

    act0 = pk(active)
    packet_live0 = jnp.any(act0, axis=1)
    if bvh.root_code >= 0:
        cur0 = jnp.where(packet_live0, jnp.int32(bvh.root_code), done)
        qn0 = jnp.zeros((p0,), i32)
        qid0 = jnp.zeros((p0, Q), i32)
        qt0 = jnp.full((p0, Q), _BIG, f32)
    else:
        # single-leaf scene: enqueue the root leaf directly
        cur0 = jnp.full((p0,), done, i32)
        qn0 = jnp.where(packet_live0, 1, 0).astype(i32)
        qid0 = jnp.zeros((p0, Q), i32).at[:, 0].set(jnp.int32(~bvh.root_code))
        qt0 = jnp.full((p0, Q), _BIG, f32).at[:, 0].set(0.0)

    state = dict(
        idx=jnp.arange(p0, dtype=i32),
        ox=pk(ray_o[:, 0]), oy=pk(ray_o[:, 1]), oz=pk(ray_o[:, 2]),
        dx=pk(ray_d[:, 0]), dy=pk(ray_d[:, 1]), dz=pk(ray_d[:, 2]),
        ivx=pk(inv_d[:, 0]), ivy=pk(inv_d[:, 1]), ivz=pk(inv_d[:, 2]),
        tmin=pk(t_min.astype(f32)), act=act0,
        cur=cur0, pmask=jnp.full((p0,), 0xFF, i32),
        snode=jnp.zeros((stack_depth, p0), i32),
        smask=jnp.zeros((stack_depth, p0), i32),
        sp=jnp.zeros((p0,), i32),
        qn=qn0, qid=qid0, qt=qt0,
        bt=pk(t_max.astype(f32)),
        btri=jnp.full((p0, K), -1, i32),
        bu=jnp.zeros((p0, K), f32),
        bv=jnp.zeros((p0, K), f32),
        it=jnp.zeros((), i32), oit=jnp.zeros((), i32),
    )

    def ray_live_of(s):
        if first_hit:
            return s["act"] & (s["btri"] < 0)
        return s["act"]

    # ---------------- walk phase ----------------
    def walk_body(s):
        cur = s["cur"]
        alive = cur != done
        walkable = alive & (s["qn"] <= qcap)
        ray_live = ray_live_of(s)

        row = jnp.where(walkable, cur, 0)
        rec = jnp.take(bvh.int_table, row, axis=0, mode="clip")  # (p, 64)

        lox, loy, loz = rec[:, 0:8], rec[:, 8:16], rec[:, 16:24]
        hix, hiy, hiz = rec[:, 24:32], rec[:, 32:40], rec[:, 40:48]
        codes8 = _bitcast_i32(rec[:, 48:56])

        def axis_minmax(lo, hi, o, iv):
            a = (lo[:, :, None] - o[:, None, :]) * iv[:, None, :]
            b = (hi[:, :, None] - o[:, None, :]) * iv[:, None, :]
            return jnp.minimum(a, b), jnp.maximum(a, b)

        nx, xx_ = axis_minmax(lox, hix, s["ox"], s["ivx"])
        ny, xy_ = axis_minmax(loy, hiy, s["oy"], s["ivy"])
        nz, xz_ = axis_minmax(loz, hiz, s["oz"], s["ivz"])
        tn = jnp.maximum(jnp.maximum(nx, ny),
                         jnp.maximum(nz, s["tmin"][:, None, :]))
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
            all_found = ~jnp.any(s["act"] & (s["btri"] < 0), axis=1)
            cur_next = jnp.where(all_found, done, cur_next)
            sp_next = jnp.where(all_found, 0, sp_next)
            qn = jnp.where(all_found, 0, qn)

        return dict(s, cur=cur_next, pmask=pmask_next, snode=snode,
                    smask=smask, sp=sp_next, qn=qn, qid=qid, qt=qt,
                    it=s["it"] + 1)

    def walk_cond(s):
        walkable = (s["cur"] != done) & (s["qn"] <= qcap)
        return jnp.any(walkable) & (s["it"] < max_walk)

    # ---------------- drain phase ----------------
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

        # classic Moller-Trumbore on (p, L, K) blocks (the MXU-matmul
        # formulation measured 2.7-4.8x slower — module docstring). Origins
        # are leaf-anchored (vertices are stored anchor-relative).
        opx = (s["ox"] - cx)[:, None, :]                          # (p, 1, K)
        opy = (s["oy"] - cy)[:, None, :]
        opz = (s["oz"] - cz)[:, None, :]
        rdx, rdy, rdz = (s["dx"][:, None, :], s["dy"][:, None, :],
                         s["dz"][:, None, :])
        px_ = rdy * e2z[:, :, None] - rdz * e2y[:, :, None]
        py_ = rdz * e2x[:, :, None] - rdx * e2z[:, :, None]
        pz_ = rdx * e2y[:, :, None] - rdy * e2x[:, :, None]
        det = (e1x[:, :, None] * px_ + e1y[:, :, None] * py_
               + e1z[:, :, None] * pz_)
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tx = opx - v0x[:, :, None]
        ty = opy - v0y[:, :, None]
        tz = opz - v0z[:, :, None]
        u = (tx * px_ + ty * py_ + tz * pz_) * inv_det
        qx_ = ty * e1z[:, :, None] - tz * e1y[:, :, None]
        qy_ = tz * e1x[:, :, None] - tx * e1z[:, :, None]
        qz_ = tx * e1y[:, :, None] - ty * e1x[:, :, None]
        v = (rdx * qx_ + rdy * qy_ + rdz * qz_) * inv_det
        t = (e2x[:, :, None] * qx_ + e2y[:, :, None] * qy_
             + e2z[:, :, None] * qz_) * inv_det
        ok = (process[:, None, None] & ray_live[:, None, :]
              & (tid >= 0)[:, :, None] & (jnp.abs(det) > 1e-12)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= s["tmin"][:, None, :]) & (t < s["bt"][:, None, :]))

        key = jnp.where(ok, t, _BIG)                              # (p, L, K)
        ck = jnp.min(key, axis=1)                                 # (p, K)
        slot = jnp.arange(L, dtype=i32)[None, :, None]
        min_slot = jnp.min(jnp.where(key <= ck[:, None, :], slot, L), axis=1)
        first = slot == min_slot[:, None, :]
        ctid = jnp.sum(jnp.where(first, tid[:, :, None], 0), axis=1)
        cu = jnp.sum(jnp.where(first, u, 0.0), axis=1)
        cv = jnp.sum(jnp.where(first, v, 0.0), axis=1)
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

    # ---------------- outer loop (walk | sort | drain) ----------------
    def outer_body(s):
        s = jax.lax.while_loop(walk_cond, walk_body, s)
        key, vals = _oddeven_sort_pairs(
            jnp.where(qcols[:, :s["qt"].shape[1]] < s["qn"][:, None],
                      s["qt"], _BIG),
            s["qid"])
        s = dict(s, qt=key, qid=vals)
        s, _dp = jax.lax.while_loop(
            drain_cond, drain_body,
            (s, jnp.zeros(s["qn"].shape, i32)))
        s = dict(s, qn=jnp.zeros_like(s["qn"]),
                 qt=jnp.full_like(s["qt"], _BIG))
        return dict(s, oit=s["oit"] + 1)

    def unfinished(s):
        return (s["cur"] != done) | (s["qn"] > 0)

    # ---------------- packet-compaction phases ----------------
    out_t = pk(t_max.astype(f32))
    out_tri = jnp.full((p0, K), -1, i32)
    out_u = jnp.zeros((p0, K), f32)
    out_v = jnp.zeros((p0, K), f32)

    min_packets = max(MIN_COMPACT_SIZE // PACKET, 32)
    sizes = [p0]
    while (len(sizes) <= MAX_COMPACT_PHASES
           and (sizes[-1] + 3) // 4 >= min_packets):
        sizes.append((sizes[-1] + 3) // 4)

    for pi, size in enumerate(sizes):
        final = pi == len(sizes) - 1
        if final:
            def cond(s):
                return jnp.any(unfinished(s)) & (s["oit"] < max_outer)
        else:
            next_size = sizes[pi + 1]

            def cond(s, _ns=next_size):
                alive = jnp.sum(unfinished(s).astype(i32))
                return (alive > _ns) & (s["oit"] < max_outer)

        state = jax.lax.while_loop(cond, outer_body, state)

        out_t = out_t.at[state["idx"]].set(state["bt"], mode="drop")
        out_tri = out_tri.at[state["idx"]].set(state["btri"], mode="drop")
        out_u = out_u.at[state["idx"]].set(state["bu"], mode="drop")
        out_v = out_v.at[state["idx"]].set(state["bv"], mode="drop")

        if not final:
            perm = _compact_perm(~unfinished(state), size)[:sizes[pi + 1]]
            state = {k: (v if k in ("it", "oit")
                         else jnp.take(v, perm, axis=1)
                         if k in ("snode", "smask")
                         else jnp.take(v, perm, axis=0))
                     for k, v in state.items()}

    rec = HitRecord(t=out_t.reshape(n), tri_id=out_tri.reshape(n),
                    u=out_u.reshape(n), v=out_v.reshape(n))
    if stats:
        return rec, {"walk_iters": state["it"], "outer_iters": state["oit"],
                     "sizes": tuple(sizes)}
    return rec


def mxu_closest_hit(bvh: SplitBVH, ray_o, ray_d, t_min, t_max, active=None):
    """Closest-hit over coherent 128-ray packets via the fat-leaf walk/drain
    traversal. accept_fn unsupported — alpha-tested rays use accel.traverse."""
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
