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
                       _gather_record, _table_quarters, split_gather_enabled,
                       _child_banks, _compact_perm, _full_mask,
                       _safe_inv, MIN_COMPACT_SIZE, MAX_COMPACT_PHASES, _BIG,
                       pad_traversal_args, quarantine_pad_count)

PACKET = 128
# candidates extracted per leaf visit in the alpha-collect walk
LEAF_EXTRACT = int(os.environ.get("DXRPT_LEAF_EXTRACT", "2"))


def _packet_traverse(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active,
                     first_hit: bool, stats: bool = False,
                     collect_alpha: int = 0, exclude_alpha: bool = False):
    """collect_alpha=Kc > 0 turns on K-CANDIDATE alpha collection (requires
    bvh.has_alpha_flags): the closest-hit walk treats flagged (alpha-
    material) triangles as transparent for the best-hit/pruning state and
    instead records each lane's Kc NEAREST flagged candidates (tri, t, u,
    v) plus an overflow bit (more in-reach candidates existed than fit:
    >1 flagged hit inside one leaf visit, or a sorted-buffer drop). One
    traversal thus replaces the punch-through loop's re-traversals; the
    caller alpha-tests the few candidates OUTSIDE the loop and falls back
    to punch-through only for overflow lanes (render/integrator.py)."""
    quarters = (_table_quarters(bvh.table)
                if split_gather_enabled() else None)
    n = ray_o.shape[0]
    if n % PACKET != 0:
        raise ValueError(f"packet traversal needs N % {PACKET} == 0, got {n}")
    if collect_alpha:
        assert not first_hit, "alpha collection is a closest-walk mode"
        assert bvh.has_alpha_flags, "table was built without alpha flags"
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
    if collect_alpha:
        for sslot in range(collect_alpha):
            state[f"ct{sslot}"] = jnp.full((p, K), _BIG, jnp.float32)
            state[f"ctri{sslot}"] = jnp.full((p, K), -1, jnp.int32)
            state[f"cu{sslot}"] = jnp.zeros((p, K), jnp.float32)
            state[f"cv{sslot}"] = jnp.zeros((p, K), jnp.float32)
        state["ovf"] = jnp.zeros((p, K), jnp.bool_)

    def body(s):
        cur = s["cur"]
        alive = cur != done_code
        is_leaf = alive & (cur < 0)
        is_int = alive & (cur >= 0)
        row = jnp.where(is_leaf, ~cur, jnp.where(is_int, cur, 0))
        # 4-way split gather (latency overlap) — see accel/traverse.py
        # split_gather_enabled(); validated by tools/sweep_split_gather.py
        rec = _gather_record(bvh.table, quarters, row)  # (p, 128)

        # live rays: active AND (closest: always search; any-hit: not found)
        ray_live = s["act"]
        if first_hit:
            ray_live = ray_live & (s["btri"] < 0)

        # Pruning bound. Plain walks prune by the best (opaque) hit. The
        # alpha-collect walk additionally prunes by the FARTHEST kept
        # candidate once the K-buffer is full: anything beyond it can
        # neither enter the buffer nor win (the resolver punches when all
        # K reject), so without this bound a ray would walk the entire
        # card field it used to stop at (measured: the unpruned walk gave
        # back the whole punch-loop saving).
        prune_t = s["bt"]
        if collect_alpha:
            last = collect_alpha - 1
            kfull = s[f"ctri{last}"] >= 0
            prune_t = jnp.minimum(prune_t,
                                  jnp.where(kfull, s[f"ct{last}"], _BIG))

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
                             jnp.minimum(xz_, prune_t[:, None, :]))
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
        if bvh.has_alpha_flags:
            from .lbvh import ALPHA_TID_BIT
            aflag = (tid >= 0) & ((tid & jnp.int32(ALPHA_TID_BIT)) != 0)
            tid = jnp.where(tid >= 0, tid & ~jnp.int32(ALPHA_TID_BIT), tid)
        else:
            aflag = None

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
              & (t >= s["tmin"][:, None, :]) & (t < prune_t[:, None, :])
              & ray_live[:, None, :])
        if exclude_alpha and aflag is not None:
            # opaque-only walk: alpha-material hits neither terminate nor
            # prune — candidates come from the separate alpha-only table
            # (the split-table design, render/integrator.py)
            ok = ok & ~aflag[:, :, None]

        def leaf_min(ok_mask):
            # per-ray min over the L axis, lowest slot wins ties
            key = jnp.where(ok_mask, t, _BIG)                 # (p, L, K)
            ck = jnp.min(key, axis=1)                         # (p, K)
            slot = jnp.arange(L, dtype=jnp.int32)[None, :, None]
            min_slot = jnp.min(jnp.where(key <= ck[:, None, :], slot, L),
                               axis=1)
            first = slot == min_slot[:, None, :]              # (p, L, K)
            ctid = jnp.sum(jnp.where(first, tid[:, :, None], 0), axis=1)
            cu = jnp.sum(jnp.where(first, u, 0.0), axis=1)
            cv = jnp.sum(jnp.where(first, v, 0.0), axis=1)
            return ck, ctid, cu, cv

        extra = {}
        if collect_alpha:
            ok_a = ok & aflag[:, :, None]
            ok = ok & ~aflag[:, :, None]
            # Up to LEAF_EXTRACT nearest candidates per leaf visit feed the
            # sorted Kc-buffer (dense card fields regularly put 2 different
            # cards' triangles in one leaf on one ray: single-extract
            # measured 13-19% in-leaf overflow on SponzaAlpha primaries);
            # only deeper in-leaf pileups or buffer drops overflow.
            bufs = {nm: [s[f"{nm}{i}"] for i in range(collect_alpha)]
                    for nm in ("ct", "ctri", "cu", "cv")}
            ovf = s["ovf"]
            ok_rem = ok_a
            slot = jnp.arange(L, dtype=jnp.int32)[None, :, None]
            for _ in range(LEAF_EXTRACT):
                key = jnp.where(ok_rem, t, _BIG)
                ck_ = jnp.min(key, axis=1)
                min_slot = jnp.min(jnp.where(key <= ck_[:, None, :],
                                             slot, L), axis=1)
                first = ok_rem & (slot == min_slot[:, None, :])
                cand_t = ck_
                cand_tri = jnp.sum(jnp.where(first, tid[:, :, None], 0),
                                   axis=1)
                cand_u = jnp.sum(jnp.where(first, u, 0.0), axis=1)
                cand_v = jnp.sum(jnp.where(first, v, 0.0), axis=1)
                cand_valid = cand_t < _BIG
                ok_rem = ok_rem & ~first
                for sslot in range(collect_alpha):
                    st, stri = bufs["ct"][sslot], bufs["ctri"][sslot]
                    su, sv = bufs["cu"][sslot], bufs["cv"][sslot]
                    take = cand_valid & (cand_t < st)
                    bufs["ct"][sslot] = jnp.where(take, cand_t, st)
                    bufs["ctri"][sslot] = jnp.where(take, cand_tri, stri)
                    bufs["cu"][sslot] = jnp.where(take, cand_u, su)
                    bufs["cv"][sslot] = jnp.where(take, cand_v, sv)
                    # displaced occupant becomes the carried candidate
                    disp_valid = take & (stri >= 0)
                    cand_t = jnp.where(take, st, cand_t)
                    cand_tri = jnp.where(take, stri, cand_tri)
                    cand_u = jnp.where(take, su, cand_u)
                    cand_v = jnp.where(take, sv, cand_v)
                    cand_valid = disp_valid | (cand_valid & ~take)
                # NOTE: a candidate displaced off the end is always the
                # (K+1)-th nearest so far — the resolver RESUMES past the
                # K-th kept candidate for such lanes (full & unresolved),
                # no flag needed. Only >LEAF_EXTRACT in-reach candidates
                # inside ONE leaf make the kept ordering suspect (the
                # extras could be nearer than buffered ones): that is the
                # one non-resumable class the overflow bit reports.
                # (Impossible by construction when the table's leaf_size
                # <= LEAF_EXTRACT, e.g. the production leaf-2 alpha table.)
            ovf = ovf | jnp.any(ok_rem, axis=1)  # >LEAF_EXTRACT in leaf
            for sslot in range(collect_alpha):
                for nm in ("ct", "ctri", "cu", "cv"):
                    extra[f"{nm}{sslot}"] = bufs[nm][sslot]
            extra["ovf"] = ovf

        ck, ctid, cu, cv = leaf_min(ok)
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
                    it=s["it"] + 1, **extra)

    # phase schedule over PACKETS (same policy as the per-ray path)
    out_t = pk(t_max.astype(jnp.float32))
    out_tri = jnp.full((p, K), -1, jnp.int32)
    out_u = jnp.zeros((p, K), jnp.float32)
    out_v = jnp.zeros((p, K), jnp.float32)
    out_cand = {}
    if collect_alpha:
        for sslot in range(collect_alpha):
            out_cand[f"ct{sslot}"] = jnp.full((p, K), _BIG, jnp.float32)
            out_cand[f"ctri{sslot}"] = jnp.full((p, K), -1, jnp.int32)
            out_cand[f"cu{sslot}"] = jnp.zeros((p, K), jnp.float32)
            out_cand[f"cv{sslot}"] = jnp.zeros((p, K), jnp.float32)
        out_cand["ovf"] = jnp.zeros((p, K), jnp.bool_)

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
        for ck_ in out_cand:
            out_cand[ck_] = out_cand[ck_].at[state["idx"]].set(
                state[ck_], mode="drop")

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
    if collect_alpha:
        Kc = collect_alpha
        cands = dict(
            t=jnp.stack([out_cand[f"ct{s_}"].reshape(n)
                         for s_ in range(Kc)], axis=1),
            tri=jnp.stack([out_cand[f"ctri{s_}"].reshape(n)
                           for s_ in range(Kc)], axis=1),
            u=jnp.stack([out_cand[f"cu{s_}"].reshape(n)
                         for s_ in range(Kc)], axis=1),
            v=jnp.stack([out_cand[f"cv{s_}"].reshape(n)
                         for s_ in range(Kc)], axis=1),
            overflow=out_cand["ovf"].reshape(n))
        return rec, cands
    if stats:
        return rec, {"sizes": tuple(sizes),
                     "phase_iters": jnp.stack(phase_iters)}
    return rec


def packet_closest_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None,
                       exclude_alpha: bool = False):
    """Closest-hit over coherent packets (see module docstring).
    accept_fn is not supported — alpha-tested rays use accel.traverse.
    exclude_alpha=True ignores flagged (alpha-material) triangles — the
    opaque-only step of the split-table alpha design."""
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
                           first_hit=False, exclude_alpha=exclude_alpha)
    if pad:
        rec = HitRecord(t=rec.t[:n], tri_id=rec.tri_id[:n],
                        u=rec.u[:n], v=rec.v[:n])
    return rec


def packet_closest_hit_alpha(bvh: FlatBVH, ray_o, ray_d, t_min, t_max,
                             active=None, k_cands: int = 4):
    """Closest-hit walk that ALSO returns each lane's k_cands nearest
    alpha-material candidates (see _packet_traverse collect_alpha). Returns
    (HitRecord opaque_best, cands) where cands = {t/tri/u/v: (N, Kc),
    overflow: (N,) bool}; candidate tri ids are flag-stripped, padded
    slots hold tri=-1/t=_BIG. Requires bvh.has_alpha_flags."""
    n = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    pad = quarantine_pad_count(n)
    if pad:
        ray_o, ray_d, t_min, t_max, active = pad_traversal_args(
            pad, ray_o, ray_d, t_min, t_max, active)
    rec, cands = _packet_traverse(bvh, ray_o, ray_d, t_min, t_max, active,
                                  first_hit=False, collect_alpha=k_cands)
    if pad:
        rec = HitRecord(t=rec.t[:n], tri_id=rec.tri_id[:n],
                        u=rec.u[:n], v=rec.v[:n])
        cands = {k_: v[:n] for k_, v in cands.items()}
    return rec, cands


def packet_any_hit(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None):
    """ACCEPT_FIRST_HIT_AND_END_SEARCH visibility over coherent packets.
    Returns (N,) f32 visibility (1 = unoccluded), like traverse.any_hit."""
    return packet_any_hit_rec(bvh, ray_o, ray_d, t_min, t_max, active)[0]


def packet_any_hit_rec(bvh: FlatBVH, ray_o, ray_d, t_min, t_max, active=None,
                       exclude_alpha: bool = False):
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
                           first_hit=True, exclude_alpha=exclude_alpha)
    occluded = active & (rec.tri_id >= 0)
    return (jnp.where(occluded, 0.0, 1.0)[:n],
            jnp.where(occluded, rec.tri_id, -1)[:n])
