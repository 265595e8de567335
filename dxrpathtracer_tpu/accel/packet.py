"""Packet BVH traversal — one record gather serves a whole 128-ray packet.

Why this exists (measured cost model, tools/costmodel.py): the per-ray
lockstep traversal (accel/traverse.py) is bound by its gather — ~12 ns per
gathered ROW, ~24 rows per Sponza-class ray, so 518k rays cost ~150 ms per
traversal call. For COHERENT rays (primaries from one camera, sun-shadow
rays sharing one direction) adjacent rays walk nearly identical node
sequences; grouping 128 of them into a packet that traverses the UNION of
their node sets turns 128 gathers into one. Rows drop ~institutionally
(~50x for primary rays); the loop instead pays dense (P, 8, 128) slab tests
and (P, L, 128) triangle tests per iteration — exactly the elementwise
block shapes the 8x128 VPU wants (measured 27-71 G AABB-pairs/s,
tools/microbench_primitives2.py).

The classic CPU-SIMD analogy is Wald-style packet tracing; DXR needs
nothing like it because RT cores do per-ray MIMD traversal in hardware
(RayTrace.hlsl:138 TraceRay). On a lockstep-SIMD machine the packet IS the
natural unit; the 128-lane VPU minor dimension makes PACKET=128 the native
width.

Semantics match accel/traverse.py exactly for the supported configuration
(accept_fn=None — FORCE_OPAQUE; alpha-tested rays take the per-ray path):
closest hit returns the nearest triangle with the lowest-slot tie rule,
any-hit is ACCEPT_FIRST_HIT_AND_END_SEARCH per ray. Equality is enforced
by tests/test_packet.py against the per-ray traversal.

Packet shape invariants:
  - ray arrays are flat (N,) with N % PACKET == 0; lane k of packet p is
    ray p*PACKET + k. The CALLER is responsible for making consecutive
    128-ray groups spatially coherent (render/integrator.py's raygen tiles
    pixels 8x16 per packet).
  - per-packet state: cur/pmask/sp (P,), (node,mask) stack (depth, P);
  - per-ray state: t_best/tri/u/v and active masks as (P, 128) blocks.

A packet is culled into a child if ANY of its live rays hits the child's
AABB within its current [t_min, t_best] interval; children are visited
near-to-far by the packet-min entry distance. Finished packets (empty
stack, no live rays) compact away between phases like the per-ray path.
"""

import os

import jax
import jax.numpy as jnp

from .lbvh import FlatBVH, LEAF_SIZE, WIDTH
from .traverse import (HitRecord, _argmin8_block, _bitcast_i32,
                       _child_banks, _compact_perm, _full_mask,
                       _safe_inv, MIN_COMPACT_SIZE, MAX_COMPACT_PHASES, _BIG,
                       pad_traversal_args, quarantine_pad_count)

PACKET = 128


def _packet_traverse(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active,
                     first_hit: bool, stats: bool = False):
    n = ray_o.shape[0]
    if n % PACKET != 0:
        raise ValueError(f"packet traversal needs N % {PACKET} == 0, got {n}")
    p = n // PACKET
    K = PACKET

    def pk(x):  # (N,) -> (P, K)
        return x.reshape(p, K)

    ox, oy, oz = pk(ray_o[:, 0]), pk(ray_o[:, 1]), pk(ray_o[:, 2])
    dx, dy, dz = pk(ray_d[:, 0]), pk(ray_d[:, 1]), pk(ray_d[:, 2])
    inv_d = _safe_inv(ray_d)
    ivx, ivy, ivz = pk(inv_d[:, 0]), pk(inv_d[:, 1]), pk(inv_d[:, 2])
    tmin = pk(t_min)
    act0 = pk(active)

    done_code = jnp.int32(bvh.num_rows)
    stack_depth = bvh.max_depth + 2
    levels = jnp.arange(stack_depth, dtype=jnp.int32)[:, None]
    max_iters = bvh.num_rows * 2 + stack_depth + 4
    root = jnp.int32(bvh.root_code)

    packet_live0 = jnp.any(act0, axis=1)
    state = dict(
        idx=jnp.arange(p, dtype=jnp.int32),
        ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
        ivx=ivx, ivy=ivy, ivz=ivz, tmin=tmin,
        act=act0,
        cur=jnp.where(packet_live0, root, done_code).astype(jnp.int32),
        pmask=jnp.full((p,), 1, jnp.int32) * _full_mask(bvh.width),
        snode=jnp.zeros((stack_depth, p), jnp.int32),
        smask=jnp.zeros((stack_depth, p), jnp.int32),
        sp=jnp.zeros((p,), jnp.int32),
        bt=pk(t_max.astype(jnp.float32)),
        btri=jnp.full((p, K), -1, jnp.int32),
        bu=jnp.zeros((p, K), jnp.float32),
        bv=jnp.zeros((p, K), jnp.float32),
        it=jnp.zeros((), jnp.int32),
    )

    def body(s):
        cur = s["cur"]
        alive = cur != done_code
        is_leaf = alive & (cur < 0)
        is_int = alive & (cur >= 0)
        row = jnp.where(is_leaf, ~cur, jnp.where(is_int, cur, 0))
        rec = jnp.take(bvh.table, row, axis=0, mode="clip")  # (p, 128)

        # live rays: active AND (closest: always search; any-hit: not found)
        ray_live = s["act"]
        if first_hit:
            ray_live = ray_live & (s["btri"] < 0)

        # ---- internal: slab-test W children x K rays, bank by bank ----
        # (one (p, 8, K) f32 bank classically; two (p, W/2, K) de-interleaved
        # bf16 banks for wide records — traverse._child_banks)
        def axis_minmax(lo, hi, o, iv):
            a = (lo[:, :, None] - o[:, None, :]) * iv[:, None, :]
            b = (hi[:, :, None] - o[:, None, :]) * iv[:, None, :]
            return jnp.minimum(a, b), jnp.maximum(a, b)

        hit_mask = jnp.zeros_like(s["pmask"])
        near_key = near_code = near_bit = None
        for (lox, loy, loz), (hix, hiy, hiz), codes_b, off, hw in \
                _child_banks(bvh, rec):
            nx, xx_ = axis_minmax(lox, hix, s["ox"], s["ivx"])
            ny, xy_ = axis_minmax(loy, hiy, s["oy"], s["ivy"])
            nz, xz_ = axis_minmax(loz, hiz, s["oz"], s["ivz"])
            tn = jnp.maximum(jnp.maximum(nx, ny),
                             jnp.maximum(nz, s["tmin"][:, None, :]))
            tf = jnp.minimum(jnp.minimum(xx_, xy_),
                             jnp.minimum(xz_, s["bt"][:, None, :]))
            # Empty child slots are encoded lo > hi in the RECORD (must be
            # tested there, not via the slab result — inf arithmetic can
            # "hit").
            valid8 = lox <= hix  # (p, hw)
            slot_pow2 = (jnp.int32(1)
                         << (off + jnp.arange(hw, dtype=jnp.int32)))[None, :]
            gate = (s["pmask"][:, None] & slot_pow2) != 0
            ray_hit8 = (tn <= tf) & ray_live[:, None, :]        # (p, hw, K)
            hit8 = (is_int[:, None] & valid8 & gate
                    & jnp.any(ray_hit8, axis=2))                 # (p, hw)

            # near-to-far by packet-min entry distance
            tn_min = jnp.min(jnp.where(ray_hit8, tn, _BIG), axis=2)  # (p, hw)
            keys8 = jnp.where(hit8, tn_min, _BIG)
            hit_mask = hit_mask | jnp.sum(jnp.where(hit8, slot_pow2, 0), axis=1)
            nk, nc, nb = _argmin8_block(keys8, codes_b, hw, off)
            if near_key is None:
                near_key, near_code, near_bit = nk, nc, nb
            else:
                take = nk < near_key
                near_code = jnp.where(take, nc, near_code)
                near_bit = jnp.where(take, nb, near_bit)
                near_key = jnp.minimum(nk, near_key)
        any_child = near_key < _BIG
        rest_mask = hit_mask & ~near_bit

        # ---- leaf: L triangles x K rays ((p, L, K)) ----
        L = LEAF_SIZE
        v0x, v0y, v0z = rec[:, 0:L], rec[:, L:2 * L], rec[:, 2 * L:3 * L]
        e1x, e1y, e1z = (rec[:, 3 * L:4 * L], rec[:, 4 * L:5 * L],
                         rec[:, 5 * L:6 * L])
        e2x, e2y, e2z = (rec[:, 6 * L:7 * L], rec[:, 7 * L:8 * L],
                         rec[:, 8 * L:9 * L])
        tid = _bitcast_i32(rec[:, 9 * L:10 * L])               # (p, L)

        rdx, rdy, rdz = (s["dx"][:, None, :], s["dy"][:, None, :],
                         s["dz"][:, None, :])
        px = rdy * e2z[:, :, None] - rdz * e2y[:, :, None]
        py = rdz * e2x[:, :, None] - rdx * e2z[:, :, None]
        pz = rdx * e2y[:, :, None] - rdy * e2x[:, :, None]
        det = e1x[:, :, None] * px + e1y[:, :, None] * py + e1z[:, :, None] * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tx = s["ox"][:, None, :] - v0x[:, :, None]
        ty = s["oy"][:, None, :] - v0y[:, :, None]
        tz = s["oz"][:, None, :] - v0z[:, :, None]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z[:, :, None] - tz * e1y[:, :, None]
        qy = tz * e1x[:, :, None] - tx * e1z[:, :, None]
        qz = tx * e1y[:, :, None] - ty * e1x[:, :, None]
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        t = (e2x[:, :, None] * qx + e2y[:, :, None] * qy
             + e2z[:, :, None] * qz) * inv_det
        ok = (is_leaf[:, None, None] & (tid >= 0)[:, :, None]
              & (jnp.abs(det) > 1e-12)
              & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (t >= s["tmin"][:, None, :]) & (t < s["bt"][:, None, :])
              & ray_live[:, None, :])

        # per-ray min over the L axis, lowest slot wins ties
        key = jnp.where(ok, t, _BIG)                          # (p, L, K)
        ck = jnp.min(key, axis=1)                             # (p, K)
        slot = jnp.arange(L, dtype=jnp.int32)[None, :, None]
        min_slot = jnp.min(jnp.where(key <= ck[:, None, :], slot, L), axis=1)
        first = slot == min_slot[:, None, :]                  # (p, L, K)
        ctid = jnp.sum(jnp.where(first, tid[:, :, None], 0), axis=1)
        cu = jnp.sum(jnp.where(first, u, 0.0), axis=1)
        cv = jnp.sum(jnp.where(first, v, 0.0), axis=1)
        win = ck < _BIG
        btri = jnp.where(win, ctid, s["btri"])
        bu = jnp.where(win, cu, s["bu"])
        bv = jnp.where(win, cv, s["bv"])
        bt = jnp.where(win, ck, s["bt"])

        # ---- stack: ONE (node, mask) push when siblings remain ----
        do_push = is_int & any_child & (rest_mask != 0)
        at_sp = (levels == s["sp"][None, :]) & do_push[None, :]
        snode = jnp.where(at_sp, cur[None, :], s["snode"])
        smask = jnp.where(at_sp, rest_mask[None, :], s["smask"])
        sp_pushed = s["sp"] + do_push.astype(jnp.int32)

        # ---- next cursor: descend nearest, else pop ----
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
                               jnp.full_like(s["pmask"], _full_mask(bvh.width)))
        sp_next = jnp.where(need_pop & can_pop, sp_pushed - 1, sp_pushed)

        if first_hit:
            # whole packet stops once every live ray has found a hit
            all_found = ~jnp.any(s["act"] & (btri < 0), axis=1)
            cur_next = jnp.where(all_found, done_code, cur_next)
            sp_next = jnp.where(all_found, 0, sp_next)

        return dict(s, cur=cur_next, pmask=pmask_next, snode=snode,
                    smask=smask, sp=sp_next, bt=bt, btri=btri, bu=bu, bv=bv,
                    it=s["it"] + 1)

    # phase schedule over PACKETS (same policy as the per-ray path)
    out_t = pk(t_max.astype(jnp.float32))
    out_tri = jnp.full((p, K), -1, jnp.int32)
    out_u = jnp.zeros((p, K), jnp.float32)
    out_v = jnp.zeros((p, K), jnp.float32)

    # Packet phases compact harder than the per-ray path (ceil-halving, more
    # phases): the tail is dominated by the ~125 us/iteration while_loop
    # fixed cost (tools/costmodel.py), so shrinking lane count alone is not
    # enough — UNROLL steps per loop iteration amortize it.
    UNROLL = int(os.environ.get("DXRPT_PACKET_UNROLL", "2"))
    from .traverse import compact_knobs
    min_compact, max_phases = compact_knobs()
    sizes = [p]
    while (len(sizes) <= max_phases + 2
           and (sizes[-1] + 1) // 2 >= max(min_compact // PACKET, 32)):
        sizes.append((sizes[-1] + 1) // 2)

    def body_unrolled(s):
        for _ in range(UNROLL):
            s = body(s)
        return s

    phase_iters = []
    for pi, size in enumerate(sizes):
        final = pi == len(sizes) - 1

        if final:
            def cond(s):
                return jnp.any(s["cur"] != done_code) & (s["it"] < max_iters)
        else:
            next_size = sizes[pi + 1]

            def cond(s, _ns=next_size):
                n_alive = jnp.sum((s["cur"] != done_code).astype(jnp.int32))
                return (n_alive > _ns) & (s["it"] < max_iters)

        state = jax.lax.while_loop(cond, body_unrolled, state)
        phase_iters.append(state["it"])

        out_t = out_t.at[state["idx"]].set(state["bt"], mode="drop")
        out_tri = out_tri.at[state["idx"]].set(state["btri"], mode="drop")
        out_u = out_u.at[state["idx"]].set(state["bu"], mode="drop")
        out_v = out_v.at[state["idx"]].set(state["bv"], mode="drop")

        if not final:
            perm = _compact_perm(state["cur"] == done_code,
                                 size)[:sizes[pi + 1]]
            state = {k: (v if k == "it"
                         else jnp.take(v, perm, axis=1)
                         if k in ("snode", "smask")
                         else jnp.take(v, perm, axis=0))
                     for k, v in state.items()}

    rec = HitRecord(t=out_t.reshape(n), tri_id=out_tri.reshape(n),
                    u=out_u.reshape(n), v=out_v.reshape(n))
    if stats:
        return rec, {"sizes": tuple(sizes),
                     "phase_iters": jnp.stack(phase_iters)}
    return rec


def packet_closest_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None):
    """Closest-hit over coherent packets (see module docstring).
    accept_fn is not supported — alpha-tested rays use accel.traverse."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    # lane-count quarantine (see traverse.py): the pad is a whole number of
    # inactive packets (both band edges are multiples of 128)
    pad = quarantine_pad_count(n)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    rec = _packet_traverse(bvh, ray_o, ray_d, t_min, t_max, active,
                           first_hit=False)
    if pad:
        rec = HitRecord(t=rec.t[:n], tri_id=rec.tri_id[:n],
                        u=rec.u[:n], v=rec.v[:n])
    return rec


def packet_any_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None):
    """ACCEPT_FIRST_HIT_AND_END_SEARCH visibility over coherent packets.
    Returns (N,) f32 visibility (1 = unoccluded), like traverse.any_hit."""
    return packet_any_hit_rec(bvh, ray_o, ray_d, t_min, t_max, active)[0]


def packet_any_hit_rec(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None):
    """packet_any_hit that also returns the occluder triangle id (-1 when
    unoccluded) for the history-seeded shadow path (accel/history.py)."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    pad = quarantine_pad_count(n)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    rec = _packet_traverse(bvh, ray_o, ray_d, t_min, t_max, active,
                           first_hit=True)
    occluded = active & (rec.tri_id >= 0)
    return (jnp.where(occluded, 0.0, 1.0)[:n],
            jnp.where(occluded, rec.tri_id, -1)[:n])
