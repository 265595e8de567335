"""Wavefront path-tracing integrator — the TPU-native RayTrace.hlsl.

The reference's recursive megakernel (RayGen -> ClosestHit -> PathTrace ->
recursive TraceRay, DXRPathTracer/RayTrace.hlsl:92-441) becomes a statically
unrolled wavefront loop: path depth is the outer Python loop (static because
MaxPathLength is a static setting, so XLA sees straight-line code), with the
whole pixel wavefront carried as SoA arrays. The recursion's multiplicative
composition `radiance += throughput * child` unrolls into a carried path
throughput `beta` with `total += beta * local`.

Semantics parity checklist vs RayTrace.hlsl (each implemented below):
  - CMJ sample points: primary = set 0, bounce k = set k; permutation =
    set * TotalNumPixels + pixelIdx (RayTrace.hlsl:85-90)
  - primary ray un-projection through InvViewProjection with y-flip (:100-112)
  - miss: sky cubemap sample, sun-disc *replace* at depth 1 (:509-530); white
    furnace miss = 1.0 (:512-515)
  - early-outs: no diffuse+specular, no direct+indirect, indirect-off past
    depth 1 (:153-158); per-lane enableDiffuse/enableSpecular gating (:191-195)
  - normal mapping with TBN re-orthogonalization row3 = N (:168-179)
  - metallic/roughness scaling + furnace forcing (:182-204)
  - Turquin multiscatter energy compensation (:206-218, :359-370) including the
    reference's use of dot(normalTS=(0,0,1), -rayDirWS) = -rayDir.z in the
    specular-sample DFG lookup (:361) — reproduced as-is for pixel parity
  - sun NEE with representative-point area-light approximation (:224-262);
    shadow ray along SunDirectionWS with t in [1e-5, FP32Max]
  - spot-light NEE loop with smoothstep angular attenuation and 4th-power
    distance falloff (:264-313); shadow ray offset by 0.01 * normal, t in
    [SpotShadowNearClip, dist - SpotShadowNearClip]
  - 50/50 lobe selection with sample-x remapping, cosine-hemisphere diffuse /
    GGX-VNDF specular with F * G2/G1 weight, x2 when both lobes (:315-376)
  - EnableDirect zeroing at depth 1 (:385-386)
  - terminal vertex: visibility ray along the BRDF direction; sky * visibility
    (or throughput replacement in furnace mode) (:411-438)
  - any-hit alpha test (opacity < 0.35 ignores the hit) only while depth <=
    MaxAnyHitPathLength, else FORCE_OPAQUE (:129-133, :485-507)
  - final clamp to [0, FP16Max] and progressive running-mean accumulation
    (:140-148)
"""

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.traverse import any_hit, closest_hit
from ..app.settings import (AppSettings, SPOT_SHADOW_NEAR_CLIP)
from ..core import brdf as brdf_lib
from ..core import cmj
from ..core.constants import FP16Max, FP32Max
from ..core.math3 import dot, dot3, normalize, reflect, saturate, smoothstep
from ..scene.textures import bilinear_from_meta, sample_bilinear_wrap
from ..scene.types import PACKED_SLOTS
from ..sky.cubemap import sample_cubemap


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class FrameConstants:
    """Per-frame scalars — the RayTraceConstants cbuffer (RayTrace.hlsl:24-44).

    Passed as *traced* jit arguments so camera motion / progressive sample index
    never retrace; only settings changes do.
    """

    inv_view_projection: jax.Array   # (4, 4) f32, row-vector convention
    camera_pos_ws: jax.Array         # (3,)
    sun_direction_ws: jax.Array      # (3,)
    sun_irradiance: jax.Array        # (3,)
    sun_render_color: jax.Array      # (3,)
    cos_sun_angular_radius: jax.Array  # () f32
    sin_sun_angular_radius: jax.Array  # () f32
    curr_sample_idx: jax.Array       # () uint32


def _fetch_vertex_attrs(scene, tri_id, u, v):
    """GetHitSurface (RayTrace.hlsl:444-464): gather 3 vertices, barycentric
    lerp, normalize N/T/B."""
    tri = jnp.take(scene.tri_idx, jnp.maximum(tri_id, 0), axis=0)  # (N, 3)
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]

    def lerp3(arr):
        a0 = jnp.take(arr, tri[:, 0], axis=0)
        a1 = jnp.take(arr, tri[:, 1], axis=0)
        a2 = jnp.take(arr, tri[:, 2], axis=0)
        return a0 * w + a1 * uu + a2 * vv

    pos = lerp3(scene.positions)
    nrm = normalize(lerp3(scene.normals), eps=1e-37)
    uv = lerp3(scene.uvs)
    tan = normalize(lerp3(scene.tangents), eps=1e-37)
    bit = normalize(lerp3(scene.bitangents), eps=1e-37)
    return pos, nrm, uv, tan, bit


def _fetch_shade_inputs(scene, tri_id, u, v):
    """Surface + material inputs for _shade_vertex in ONE gather when the
    scene carries the packed per-triangle shading rows (pack_tri_shade,
    scene/types.py): rec = (n, 64) 256 B rows; the barycentric lerp runs as
    one fused op over three contiguous 14-wide vertex blocks, and the
    material index + packed material meta ride in the same row. Falls back
    to the per-attribute gathers (~18 rows/vertex) on scenes without it."""
    if scene.tri_shade is None:
        pos, geo_n, uv_l, tan, bit = _fetch_vertex_attrs(scene, tri_id, u, v)
        mat = jnp.take(scene.tri_material, jnp.maximum(tri_id, 0), axis=0)
        packed_mm = _gather_packed_meta(scene, mat)
        return pos, geo_n, uv_l, tan, bit, mat, packed_mm

    from ..scene.types import TRI_SHADE_MAT, TRI_SHADE_META, TRI_SHADE_VTX
    rec = jnp.take(scene.tri_shade, jnp.maximum(tri_id, 0), axis=0)  # (n, 64)
    w = (1.0 - u - v)[..., None]
    K = TRI_SHADE_VTX
    blk = (rec[:, 0:K] * w + rec[:, K:2 * K] * u[..., None]
           + rec[:, 2 * K:3 * K] * v[..., None])
    pos = blk[:, 0:3]
    geo_n = normalize(blk[:, 3:6], eps=1e-37)
    uv_l = blk[:, 6:8]
    tan = normalize(blk[:, 8:11], eps=1e-37)
    bit = normalize(blk[:, 11:14], eps=1e-37)
    mat = jax.lax.bitcast_convert_type(rec[:, TRI_SHADE_MAT], jnp.int32)
    packed_mm = jax.lax.bitcast_convert_type(
        rec[:, TRI_SHADE_META:TRI_SHADE_META + 20], jnp.int32)
    return pos, geo_n, uv_l, tan, bit, mat, packed_mm


def _sample_material(scene, mat_idx, uv, slot):
    tex_idx = jnp.take(getattr(scene.materials, slot), mat_idx, axis=0)
    return sample_bilinear_wrap(scene.textures, tex_idx, uv)


def _gather_packed_meta(scene, mat_idx):
    """One (n, 20) gather of the fused material+atlas meta rows — replaces
    ~10 separate slot-index/atlas-meta gathers per vertex (gathers are
    row-count bound on TPU; PERF_NOTES.md). Falls back to None when the
    scene predates packed_meta (then _sample_packed re-gathers per slot)."""
    pm = scene.materials.packed_meta
    if pm is None:
        return None
    return jnp.take(pm, mat_idx, axis=0)


def _sample_packed(scene, packed, mat_idx, uv, slot):
    """Texture tap via the packed meta row (same values as _sample_material)."""
    if packed is None:
        return _sample_material(scene, mat_idx, uv, slot)
    k = 3 * PACKED_SLOTS.index(slot)
    return bilinear_from_meta(scene.textures.texels, packed[..., k],
                              packed[..., k + 1], packed[..., k + 2], uv)


def _make_alpha_test(scene, settings: AppSettings):
    """Alpha-test accept_fn for traversal, or None when the scene has no
    opacity-mapped materials (== every hit-group record is opaque,
    DXRPathTracer.cpp:1176-1199)."""
    if not scene.materials.any_opacity:
        return None

    def accept(tri_id, u, v):
        # Shape-polymorphic: called with (m,) rays or (m, L) leaf-slot blocks.
        mat = jnp.take(scene.tri_material, jnp.maximum(tri_id, 0), axis=0)
        packed = _gather_packed_meta(scene, mat)
        if packed is None:
            has_op = jnp.take(scene.materials.has_opacity, mat, axis=0)
        else:
            has_op = packed[..., 18] != 0
        tri = jnp.take(scene.tri_idx, jnp.maximum(tri_id, 0), axis=0)
        w = 1.0 - u - v
        uv0 = jnp.take(scene.uvs, tri[..., 0], axis=0)
        uv1 = jnp.take(scene.uvs, tri[..., 1], axis=0)
        uv2 = jnp.take(scene.uvs, tri[..., 2], axis=0)
        uv = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]
        opacity = _sample_packed(scene, packed, mat, uv, "opacity")[..., 0]
        return jnp.where(has_op, opacity >= 0.35, True)

    return accept


def _punch_through_closest(closest_fn, accept, o, d, t_min, t_max, active,
                           max_rounds: int = 8, rest_fn=None):
    """Closest-hit with alpha testing as PUNCH-THROUGH: traverse with
    FORCE_OPAQUE semantics, evaluate the opacity accept_fn ONCE per
    candidate hit OUTSIDE the traversal loop, and re-traverse past rejected
    hits (t_min advanced beyond them) until every lane holds an accepted
    hit or a miss.

    Why: DXR's MIMD any-hit shader (RayTrace.hlsl:485-507) evaluates alpha
    only at actual candidate hits; putting the accept_fn INSIDE the
    lockstep loop instead evaluates 4-tap bilinear texture gathers on
    every leaf slot of every lane every iteration — measured 28x slower
    than opaque at 960x540 on the alpha bench scene (PERF_NOTES.md round
    3). Punch-through restores sparse evaluation AND re-enables the packet
    traversal for alpha scenes (the inner traversal is accept-free).

    Identical results to the in-loop accept_fn for rejection chains up to
    max_rounds deep (foliage is 1-3); deeper chains fall back to treating
    the surviving surface as opaque (pinned in tests).

    rest_fn (optional, DEFAULT OFF) swaps rounds >= 2 onto a second engine
    (the compacted per-ray W32 traversal). Measured WORSE on-device
    (SponzaAlpha@540p interleaved: premium 509 -> 923 ms): inside a
    while_loop the per-ray engine pays near-full-population cost per round
    — its compaction phases are iteration-indexed, not occupancy-indexed,
    so a 25%-occupied round still walks the full lockstep schedule, while
    a packet round at least skips tiles with no rejected lanes. Kept as
    DXRPT_PUNCH_HYBRID=1 for re-measurement on future stacks."""
    n = o.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32

    def cond(s):
        und = s[0]
        return jnp.any(und) & (s[5] < max_rounds)

    def make_body(fn):
        def body(s):
            und, bt, btri, bu, bv, r, cur_tmin = s
            rec = fn(o, d, cur_tmin, t_max, und)
            hit = und & (rec.tri_id >= 0)
            acc = accept(rec.tri_id, rec.u, rec.v)
            last = r >= max_rounds - 1
            take = hit & (acc | last)  # final round: surviving = opaque
            bt = jnp.where(take, rec.t, jnp.where(und & ~hit, t_max, bt))
            btri = jnp.where(take, rec.tri_id,
                             jnp.where(und & ~hit, -1, btri))
            bu = jnp.where(take, rec.u, bu)
            bv = jnp.where(take, rec.v, bv)
            rejected = hit & ~acc & ~last
            # strictly beyond the rejected surface (relative+absolute nudge)
            cur_tmin = jnp.where(rejected, rec.t * (1.0 + 4e-6) + 1e-6,
                                 cur_tmin)
            return (rejected, bt, btri, bu, bv, r + 1, cur_tmin)
        return body

    state = (active,
             t_max.astype(f32) if hasattr(t_max, "astype")
             else jnp.full((n,), t_max, f32),
             jnp.full((n,), -1, i32),
             jnp.zeros((n,), f32), jnp.zeros((n,), f32),
             jnp.zeros((), i32),
             jnp.broadcast_to(jnp.asarray(t_min, f32), (n,)).astype(f32))
    if not os.environ.get("DXRPT_PUNCH_HYBRID"):  # measured-negative: opt-in
        rest_fn = None
    if rest_fn is not None and max_rounds > 1:
        state = make_body(closest_fn)(state)  # peeled coherent round 1
        out = jax.lax.while_loop(cond, make_body(rest_fn), state)
    else:
        out = jax.lax.while_loop(cond, make_body(closest_fn), state)
    from ..accel.traverse import HitRecord
    return HitRecord(t=out[1], tri_id=out[2], u=out[3], v=out[4])


def _kcand_closest(kcand_fn, punch_fn, accept, o, d, t_min, t_max, active,
                   max_rounds: int = 8):
    """Alpha-tested closest hit via ONE K-candidate packet traversal
    (accel/packet.packet_closest_hit_alpha) instead of the punch-through
    re-traversal loop: the walk returns the nearest opaque hit plus each
    lane's K nearest alpha candidates; the opacity accept_fn runs on those
    few candidates OUTSIDE the loop (sorted, so the first accepted slot is
    the winner), and only overflow lanes (more in-reach candidates than K)
    fall back to the punch loop. Exact same semantics: every candidate
    nearer than the winner is alpha-tested, none skipped."""
    rec, cands = kcand_fn(o, d, t_min, t_max, active)
    win, need_punch = _resolve_candidates(rec, cands, accept, active)
    prec = punch_fn(o, d, t_min, t_max, need_punch, max_rounds)
    from ..accel.traverse import HitRecord
    return HitRecord(
        t=jnp.where(need_punch, prec.t, win.t),
        tri_id=jnp.where(need_punch, prec.tri_id, win.tri_id),
        u=jnp.where(need_punch, prec.u, win.u),
        v=jnp.where(need_punch, prec.v, win.v))


def _resolve_candidates(rec, cands, accept, active):
    """Shared K-candidate resolution: taps each lane's sorted candidates
    (nearest first), returns (win HitRecord, resolved, need_punch). Exact:
    every candidate nearer than the returned winner was alpha-tested."""
    from ..accel.traverse import HitRecord
    kc = cands["tri"].shape[1]
    win_t, win_tri, win_u, win_v = rec.t, rec.tri_id, rec.u, rec.v
    resolved = jnp.zeros_like(active)
    for s in range(kc):
        tri_s = cands["tri"][:, s]
        valid = (tri_s >= 0) & (cands["t"][:, s] < rec.t)
        acc = accept(tri_s, cands["u"][:, s], cands["v"][:, s])
        take = valid & acc & ~resolved
        win_t = jnp.where(take, cands["t"][:, s], win_t)
        win_tri = jnp.where(take, tri_s, win_tri)
        win_u = jnp.where(take, cands["u"][:, s], win_u)
        win_v = jnp.where(take, cands["v"][:, s], win_v)
        resolved = resolved | take
    # Punch when the walk may have hidden information: an in-leaf overflow
    # (a dropped candidate could have been nearer than kept ones), or a
    # FULL buffer with every kept candidate rejected — the walk pruned at
    # the K-th candidate's t, so the true winner may lie beyond it.
    buffer_full = cands["tri"][:, -1] >= 0
    need_punch = active & (cands["overflow"] | (buffer_full & ~resolved))
    return HitRecord(t=win_t, tri_id=win_tri, u=win_u, v=win_v), need_punch


def _compact_lanes(need, n, cap):
    """(idx, valid, handled): gather up to `cap` needy lanes into a static
    compacted dispatch. cap must avoid the lane-count quarantine band —
    use 16384 or 131072. `handled` marks lanes that made it in (the rest
    go to a full-width sweeper whose while-condition is usually false)."""
    cnt = jnp.sum(need.astype(jnp.int32))
    idx = jnp.nonzero(need, size=cap, fill_value=0)[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < cnt
    idx_v = jnp.where(valid, idx, n)
    handled = jnp.zeros((n,), jnp.bool_).at[idx_v].set(True, mode="drop")
    return idx, valid, idx_v, handled


def _compact_punch(punch_fn, o, d, t_min, t_max, need, max_rounds: int):
    """Punch-through on a COMPACTED dispatch + full-width sweeper for the
    overflow beyond the cap (its while-condition is immediately false
    otherwise). Returns a full-width HitRecord (misses where ~need)."""
    from ..accel.traverse import HitRecord
    n = o.shape[0]
    cap = 16384 if n <= 16384 * 4 else 131072
    cap = min(cap, n)
    idx, valid, idx_v, handled = _compact_lanes(need, n, cap)
    prec = punch_fn(o[idx], d[idx], t_min[idx], t_max[idx], valid,
                    max_rounds)
    out_t = t_max.at[idx_v].set(prec.t, mode="drop")
    out_tri = jnp.full((n,), -1, jnp.int32).at[idx_v].set(prec.tri_id,
                                                          mode="drop")
    out_u = jnp.zeros((n,), jnp.float32).at[idx_v].set(prec.u, mode="drop")
    out_v = jnp.zeros((n,), jnp.float32).at[idx_v].set(prec.v, mode="drop")
    leftover = need & ~handled
    lrec = punch_fn(o, d, t_min, t_max, leftover, max_rounds)
    return HitRecord(
        t=jnp.where(leftover, lrec.t, out_t),
        tri_id=jnp.where(leftover, lrec.tri_id, out_tri),
        u=jnp.where(leftover, lrec.u, out_u),
        v=jnp.where(leftover, lrec.v, out_v))


def _alpha_resolve_all(alpha_kcand_fn, alpha_punch_fn, accept, o, d,
                       t_min, bound, active, rec_default,
                       max_rounds: int = 8, no_overflow: bool = False):
    """Full alpha-candidate resolution against the tiny alpha table.

    One K-candidate walk + outside taps resolves everything, because the
    punch-through loop's own semantics close the gap: punch enumerates
    candidates nearest-first and ACCEPTS the max_rounds-th one as opaque
    (RayTrace.hlsl's bounded any-hit recursion, pinned since round 3).
    With K == max_rounds, a full buffer with every candidate rejected
    means the K-th kept candidate IS the one punch would have accepted —
    one select replaces the whole re-traversal fallback (resumed-walk and
    compacted-punch fallbacks both measured SLOWER than their parts
    in composition; PERF_NOTES round 4). The punch loop survives only for
    in-leaf overflow (possible when the table's leaf_size exceeds
    LEAF_EXTRACT — never for the production leaf-2 alpha table), on a
    compacted dispatch whose sweeper is usually condition-false.
    """
    n = o.shape[0]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    bound_b = jnp.broadcast_to(jnp.asarray(bound, jnp.float32), (n,))

    rec0, cands = alpha_kcand_fn(o, d, t_min_b, bound_b, active)
    win, _ = _resolve_candidates(rec_default, cands, accept, active)
    resolved = win.t < rec_default.t
    last_t = cands["t"][:, -1]
    last_tri = cands["tri"][:, -1]
    full = (last_tri >= 0) & (last_t < rec_default.t)
    ovf = active & cands["overflow"]

    # reference-parity truncation: all K nearest rejected -> the K-th
    # candidate renders as opaque (what punch round K would have done)
    take_last = active & full & ~resolved & ~ovf
    win = type(win)(
        t=jnp.where(take_last, last_t, win.t),
        tri_id=jnp.where(take_last, last_tri, win.tri_id),
        u=jnp.where(take_last, cands["u"][:, -1], win.u),
        v=jnp.where(take_last, cands["v"][:, -1], win.v))

    if no_overflow:
        # statically impossible (table leaf_size <= LEAF_EXTRACT): no
        # punch program in the trace at all
        return win
    need_punch = ovf
    prec = _compact_punch(alpha_punch_fn, o, d, t_min_b, bound_b,
                          need_punch, max_rounds)
    punch_hit = need_punch & (prec.tri_id >= 0)
    from ..accel.traverse import HitRecord
    return HitRecord(
        t=jnp.where(punch_hit, prec.t,
                    jnp.where(need_punch, rec_default.t, win.t)),
        tri_id=jnp.where(punch_hit, prec.tri_id,
                         jnp.where(need_punch, rec_default.tri_id,
                                   win.tri_id)),
        u=jnp.where(punch_hit, prec.u,
                    jnp.where(need_punch, rec_default.u, win.u)),
        v=jnp.where(punch_hit, prec.v,
                    jnp.where(need_punch, rec_default.v, win.v)))


def _split_alpha_closest(opq_fn, alpha_kcand_fn, alpha_punch_fn, accept,
                         o, d, t_min, t_max, active, max_rounds: int = 8,
                         no_overflow: bool = False):
    """Split-table alpha closest hit (the production alpha design):

      1. opaque-only walk on the full scene table (flagged alpha triangles
         ignored in-loop; the alpha-masked software raster serves this
         step for primaries) -> exact nearest opaque hit;
      2. K-candidate collection on the TINY alpha-only table, bounded
         per-lane by the opaque t;
      3. opacity taps on the few candidates OUTSIDE any loop;
      4. resumed compacted walks, then a compacted punch, for the rare
         lanes whose K nearest candidates all rejected.

    Exact punch-through semantics at a fraction of its cost (see
    _alpha_resolve_all and PERF_NOTES round-4)."""
    rec = opq_fn(o, d, t_min, t_max, active)
    return _alpha_resolve_all(alpha_kcand_fn, alpha_punch_fn, accept,
                              o, d, t_min, rec.t, active, rec,
                              max_rounds=max_rounds,
                              no_overflow=no_overflow)


def _split_alpha_visibility(opq_any_fn, alpha_kcand_fn, alpha_punch_fn,
                            accept, o, d, t_min, t_max, active,
                            max_rounds: int = 8, no_overflow: bool = False):
    """Split-table alpha shadow visibility: opaque-only any-hit (early
    exit) + full alpha-candidate resolution for the unblocked lanes."""
    from ..accel.traverse import HitRecord
    n = o.shape[0]
    vis_opq, _ = opq_any_fn(o, d, t_min, t_max, active)
    blocked_opq = active & (vis_opq == 0.0)
    need_alpha = active & ~blocked_opq
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    rec_default = HitRecord(t=t_max_b,
                            tri_id=jnp.full((n,), -1, jnp.int32),
                            u=jnp.zeros((n,), jnp.float32),
                            v=jnp.zeros((n,), jnp.float32))
    win = _alpha_resolve_all(alpha_kcand_fn, alpha_punch_fn, accept,
                             o, d, t_min, t_max_b, need_alpha, rec_default,
                             max_rounds=max_rounds, no_overflow=no_overflow)
    blocked = blocked_opq | (need_alpha & (win.tri_id >= 0))
    return jnp.where(blocked, 0.0, 1.0)


def _to_tangent(v_ws, tan, bit, nrm):
    """Row-vector mul by transpose(tangentToWorld): project onto T/B/N."""
    return jnp.stack([dot(v_ws, tan), dot(v_ws, bit), dot(v_ws, nrm)], axis=-1)


def _from_tangent(v_ts, tan, bit, nrm):
    """Row-vector mul by tangentToWorld = rows (T, B, N)."""
    return (v_ts[..., 0:1] * tan + v_ts[..., 1:2] * bit + v_ts[..., 2:3] * nrm)


def _depth_schedule(settings: AppSettings):
    """Static per-depth control flags (all Python values — the reference's
    compile-time AppSettings branches, RayTrace.hlsl:153-158, 388).

    Yields (depth, flags) for depths 1..MaxPathLength-1; the driver breaks
    after an `early_stop` or non-`continue_paths` depth."""
    s = settings
    furnace = bool(s.enable_white_furnace_mode)
    last_depth = max(int(s.max_path_length) - 1, 1)
    out = []
    for depth in range(1, last_depth + 1):
        is_last = depth == last_depth
        early_stop = ((not s.enable_diffuse and not s.enable_specular)
                      or (not s.enable_direct and not s.enable_indirect)
                      or (depth > 1 and not s.enable_indirect))
        continue_paths = bool(s.enable_indirect) and not is_last and not furnace
        out.append((depth, dict(
            is_last=is_last,
            furnace=furnace,
            early_stop=early_stop,
            continue_paths=continue_paths,
            use_any_hit=depth <= s.max_any_hit_path_length,
            terminal_any_hit=(depth + 1) <= s.max_any_hit_path_length,
        )))
        if early_stop or not continue_paths:
            break
    return out


def _path_state0(n, ray_o, ray_d, t_max, t_min0=0.0, active0=None,
                 initial_is_diffuse=False):
    f32 = jnp.float32
    return dict(
        total=jnp.zeros((n, 3), f32),
        beta=jnp.ones((n, 3), f32),
        active=jnp.ones((n,), jnp.bool_) if active0 is None else active0,
        prev_is_diffuse=jnp.full((n,), bool(initial_is_diffuse)),
        prev_roughness=jnp.zeros((n,), f32),
        ray_o=ray_o,
        ray_d=ray_d,
        t_min=jnp.full((n,), t_min0, f32) if not hasattr(t_min0, "shape")
        else t_min0.astype(f32),
        t_max=t_max.astype(f32),
    )


def _sky_radiance(sky_cube, settings: AppSettings, dirs):
    if settings.enable_white_furnace_mode:
        return jnp.ones((dirs.shape[0], 3), jnp.float32)
    if not settings.enable_sky or sky_cube is None:
        return jnp.zeros((dirs.shape[0], 3), jnp.float32)
    return sample_cubemap(sky_cube, dirs)


def _shadow_plan(scene, settings: AppSettings, depth: int, has_alpha: bool,
                 flags):
    """Static (kind, use_alpha) list matching _shade_vertex's request order."""
    s = settings
    plan = []
    if s.enable_sun and not flags["furnace"]:
        plan.append(("sun", flags["use_any_hit"] and has_alpha))
    num_lights = min(scene.lights.num_lights, int(s.max_light_clamp))
    if s.render_lights and num_lights > 0:
        plan += [("spot", flags["use_any_hit"] and has_alpha)] * num_lights
    if not flags["continue_paths"] and not flags["furnace"]:
        plan.append(("terminal", flags["terminal_any_hit"] and has_alpha))
    return plan


def _shade_vertex(scene, sky_cube, settings: AppSettings, frame: FrameConstants,
                  depth: int, flags, state, rec, pixel_idx,
                  total_num_pixels: int, first_set_idx: int, cmj_sample_idx):
    """Everything between closest-hit and the shadow-visibility rays: miss
    shader, surface fetch, material sampling, light evaluation, BRDF sampling
    (RayTrace.hlsl:153-386). Pure function of arrays + static flags.

    Returns (state', shadow_reqs, mid):
      shadow_reqs — tuple of (origin, dir, tmin, tmax, mask) for the batched
                    any_hit flush, ordered per _shadow_plan
      mid         — per-vertex arrays _apply_vertex needs"""
    s = settings
    n = state["ray_o"].shape[0]
    f32 = jnp.float32
    furnace = flags["furnace"]
    from ..core.sampling import sample_cosine_hemisphere, sample_ggx_visible_normal

    ray_o = state["ray_o"]
    ray_d = state["ray_d"]
    active = state["active"]
    total = state["total"]
    beta = state["beta"]

    hit = rec.hit & active
    missed = active & ~hit

    # ---- Miss shader (RayTrace.hlsl:509-530) ----
    if furnace:
        miss_rad = jnp.ones((n, 3), f32)
    else:
        miss_rad = _sky_radiance(sky_cube, s, ray_d)
        if depth == 1:
            cos_sun = dot(ray_d, frame.sun_direction_ws[None, :])
            in_disc = cos_sun >= frame.cos_sun_angular_radius
            miss_rad = jnp.where(in_disc[..., None],
                                 frame.sun_render_color[None, :], miss_rad)
    total = total + jnp.where(missed[..., None], beta * miss_rad, 0.0)
    state = dict(state, total=total)

    # ---- PathTrace early-outs (static) (RayTrace.hlsl:153-158) ----
    if flags["early_stop"]:
        state = dict(state, active=jnp.zeros_like(active))
        return state, (), {}

    # ---- Hit surface ----
    pos, geo_n, uv, tan, bit, mat, packed_mm = _fetch_shade_inputs(
        scene, rec.tri_id, rec.u, rec.v)
    incoming_dir = ray_d
    incoming_origin = ray_o

    normal_ws = geo_n
    if s.enable_normal_maps:
        nm = _sample_packed(scene, packed_mm, mat, uv, "normal")
        nx = nm[..., 0] * 2.0 - 1.0
        ny = nm[..., 1] * 2.0 - 1.0
        nz = jnp.sqrt(jnp.maximum(1.0 - saturate(nx * nx + ny * ny), 0.0))
        normal_ws = normalize(
            nx[..., None] * tan + ny[..., None] * bit + nz[..., None] * geo_n, eps=1e-37)
    # tangentToWorld._31_32_33 = normalWS (RayTrace.hlsl:178)
    frame_n = normal_ws

    if s.enable_albedo_maps and not furnace:
        base_color = _sample_packed(scene, packed_mm, mat, uv, "albedo")[..., :3]
    else:
        base_color = jnp.ones((n, 3), f32)

    if furnace:
        metallic_raw = jnp.ones((n,), f32)
        sqrt_rough_raw = jnp.ones((n,), f32)
    else:
        metallic_raw = _sample_packed(scene, packed_mm, mat, uv, "metallic")[..., 0]
        sqrt_rough_raw = _sample_packed(scene, packed_mm, mat, uv, "roughness")[..., 0]
    metallic = saturate(metallic_raw * s.metallic_scale)
    sqrt_roughness = saturate(sqrt_rough_raw * s.roughness_scale)

    enable_diffuse_l = (s.enable_diffuse & (metallic < 1.0)) | furnace
    if s.enable_specular:
        if s.enable_indirect_specular:
            if s.avoid_caustic_paths:
                enable_specular_l = ~state["prev_is_diffuse"]
            else:
                enable_specular_l = jnp.ones((n,), jnp.bool_)
        else:
            enable_specular_l = jnp.full((n,), depth == 1)
    else:
        enable_specular_l = jnp.zeros((n,), jnp.bool_)

    lane_dead = ~(enable_diffuse_l | enable_specular_l)  # return 0 (hlsl:194-195)

    diffuse_albedo = ((1.0 - metallic)[..., None] * base_color
                      * enable_diffuse_l[..., None].astype(f32))
    specular_albedo = ((0.03 + (base_color - 0.03) * metallic[..., None])
                       * enable_specular_l[..., None].astype(f32))
    roughness = sqrt_roughness * sqrt_roughness
    if s.clamp_roughness:
        roughness = jnp.maximum(roughness, state["prev_roughness"])

    ms_comp = jnp.ones((n, 3), f32)
    if s.apply_multiscattering_energy_compensation:
        n_dot_v = saturate(dot(normal_ws, -incoming_dir))
        ess, _ = brdf_lib.ggx_environment_brdf_scale_bias(n_dot_v, sqrt_roughness)
        ms_comp = 1.0 + specular_albedo * (1.0 / ess[..., None] - 1.0)

    if furnace:
        local = jnp.zeros((n, 3), f32)
    else:
        local = _sample_packed(scene, packed_mm, mat, uv, "emissive")[..., :3]

    # ---- Shadow-ray batch construction ----
    # The reference issues sun NEE, each spot light, and the terminal
    # sky-visibility ray as separate TraceRay calls (RayTrace.hlsl:262, 311,
    # 434); DXR's MIMD scheduler overlaps them for free. On TPU each any_hit
    # call is its own lockstep while_loop that pays the worst ray's iteration
    # count, so same-accept_fn shadow rays at one vertex are CONCATENATED
    # into a single 2N/3N-lane call: the merged loop's step count is the max
    # of the sets, not the sum, and compaction works better at larger N.
    shadow_reqs = []  # (origin, dir, tmin, tmax, mask); order = _shadow_plan

    # ---- Sun NEE (RayTrace.hlsl:224-262) ----
    if s.enable_sun and not furnace:
        sun_d = frame.sun_direction_ws[None, :]
        if s.sun_area_light_approximation:
            r_vec = reflect(incoming_dir, normal_ws)
            d_dot_r = dot(sun_d, r_vec)
            s_vec = r_vec - d_dot_r[..., None] * sun_d
            closest = (frame.cos_sun_angular_radius * sun_d
                       + normalize(s_vec, eps=1e-37) * frame.sin_sun_angular_radius)
            shade_sun_dir = jnp.where(
                (d_dot_r < frame.cos_sun_angular_radius)[..., None],
                normalize(closest, eps=1e-37), r_vec)
        else:
            shade_sun_dir = jnp.broadcast_to(sun_d, (n, 3))
        # Exact-zero cull: calc_lighting multiplies by saturate(NdotL)
        # against shade_sun_dir, so lanes facing away from the sun
        # contribute exactly 0 regardless of visibility — skip their
        # occlusion traversal (the compaction phases turn the smaller
        # active set into real savings). Bit-identical output.
        sun_relevant = hit & (dot(normal_ws, shade_sun_dir) > 0.0)
        shadow_reqs.append((pos, jnp.broadcast_to(sun_d, (n, 3)),
                            jnp.full((n,), 1e-5, f32),
                            jnp.full((n,), FP32Max, f32), sun_relevant))
        sun_light = brdf_lib.calc_lighting(
            normal_ws, shade_sun_dir, frame.sun_irradiance[None, :],
            diffuse_albedo, specular_albedo, roughness, pos,
            incoming_origin, ms_comp)
    else:
        sun_light = None

    # ---- Spot-light NEE (RayTrace.hlsl:264-313) ----
    spot_contribs = []  # (light, relevant), aligned with shadow_reqs order
    num_lights = min(scene.lights.num_lights, int(s.max_light_clamp))
    if s.render_lights and num_lights > 0:
        for li in range(num_lights):
            lp = scene.lights.position[li][None, :]
            ld = scene.lights.direction[li][None, :]
            lint = scene.lights.intensity[li][None, :]
            ax = scene.lights.angular_attenuation_x[li]
            ay = scene.lights.angular_attenuation_y[li]
            lrange = scene.lights.range[li]

            to_light = lp - pos
            dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-20))
            to_light = to_light / dist[..., None]
            angle_f = saturate(dot(to_light, ld))
            ang_att = smoothstep(ay, ax, angle_f)
            dd = dist / lrange
            falloff = saturate(1.0 - dd ** 4)
            falloff = (falloff * falloff) / (dist * dist + 1.0)
            ang_att = ang_att * falloff
            # NdotL <= 0 zeroes calc_lighting exactly — cull those lanes'
            # shadow traversal too (bit-identical, see sun cull above).
            relevant = hit & (ang_att > 0.0) & (dot(normal_ws, to_light) > 0.0)

            shadow_reqs.append((
                pos + normal_ws * 0.01, to_light,
                jnp.full((n,), SPOT_SHADOW_NEAR_CLIP, f32),
                jnp.maximum(dist - SPOT_SHADOW_NEAR_CLIP,
                            SPOT_SHADOW_NEAR_CLIP),
                relevant))
            light = brdf_lib.calc_lighting(
                normal_ws, to_light, lint * ang_att[..., None],
                diffuse_albedo, specular_albedo, roughness, pos,
                incoming_origin, ms_comp)
            spot_contribs.append((light, relevant))

    # ---- BRDF sampling (RayTrace.hlsl:315-376) ----
    set_idx = first_set_idx + (depth - 1)
    permutation = (jnp.uint32(set_idx) * jnp.uint32(total_num_pixels)
                   + pixel_idx.astype(jnp.uint32))
    sqrt_n = int(s.sqrt_num_samples)
    uv2 = cmj.sample_cmj_2d(cmj_sample_idx, sqrt_n, sqrt_n, permutation)
    bx = uv2[..., 0]
    by = uv2[..., 1]

    selector = bx
    selector = jnp.where(enable_specular_l, selector, 0.0)
    selector = jnp.where(enable_diffuse_l, selector, 1.0)
    pick_diffuse = selector < 0.5

    # Diffuse branch
    bx_d = jnp.where(enable_specular_l, bx * 2.0, bx)
    dir_ts_diff = sample_cosine_hemisphere(bx_d, by)
    thr_diff = diffuse_albedo

    # Specular branch (GGX VNDF)
    bx_s = jnp.where(enable_diffuse_l, (bx - 0.5) * 2.0, bx)
    incoming_ts = normalize(_to_tangent(incoming_dir, tan, bit, frame_n), eps=1e-37)
    m_ts = sample_ggx_visible_normal(-incoming_ts, roughness, roughness, bx_s, by)
    dir_ts_spec = reflect(incoming_ts, m_ts)
    n_ts = jnp.zeros((n, 3), f32).at[:, 2].set(1.0)
    if furnace:
        fres = jnp.ones((n, 3), f32)
    else:
        fres = brdf_lib.fresnel(specular_albedo, m_ts, dir_ts_spec)
    a2 = roughness * roughness
    g1 = brdf_lib.smith_ggx_masking(n_ts, dir_ts_spec, -incoming_ts, a2)
    g2 = brdf_lib.smith_ggx_masking_shadowing(n_ts, dir_ts_spec, -incoming_ts, a2)
    thr_spec = fres * (g2 / jnp.where(g1 == 0.0, 1.0, g1))[..., None]
    if s.apply_multiscattering_energy_compensation:
        # Reference quirk (RayTrace.hlsl:361): dot(normalTS=(0,0,1),
        # -incomingRayDirWS) mixes spaces; equals -rayDir.z in world space.
        ndv_q = saturate(-incoming_dir[..., 2])
        ess_q, _ = brdf_lib.ggx_environment_brdf_scale_bias(ndv_q, sqrt_roughness)
        thr_spec = thr_spec * (1.0 + specular_albedo * (1.0 / ess_q[..., None] - 1.0))

    ray_dir_ts = jnp.where(pick_diffuse[..., None], dir_ts_diff, dir_ts_spec)
    throughput = jnp.where(pick_diffuse[..., None], thr_diff, thr_spec)
    ray_dir_ws = normalize(_from_tangent(ray_dir_ts, tan, bit, frame_n), eps=1e-37)
    throughput = jnp.where((enable_diffuse_l & enable_specular_l)[..., None],
                           throughput * 2.0, throughput)

    # Terminal sky-visibility ray joins the batched any_hit call
    # (RayTrace.hlsl:411-438).
    if not flags["continue_paths"] and not furnace:
        # Exact-zero cull: the terminal ray only feeds
        # beta * vis * sky * throughput — lanes whose path weight is
        # exactly zero in every channel (metal diffuse picks; VNDF
        # reflections below the horizon where G2 == 0) need no sky
        # visibility. Bit-identical up to an underflow caveat: the gate
        # tests beta * throughput while the apply side computes
        # beta * (vis * sky * throughput) in a different association
        # order, so a product that flushes to exactly 0 here could round
        # to a subnormal there (~1e-38-scale light through a forced
        # vis=1). Visually invisible; noted for strict-exactness audits.
        term_weight = state["beta"] * throughput
        shadow_reqs.append((pos, ray_dir_ws,
                            jnp.full((n,), 1e-5, f32),
                            jnp.full((n,), FP32Max, f32),
                            hit & ~lane_dead
                            & jnp.any(term_weight != 0.0, axis=-1)))

    mid = dict(hit=hit, lane_dead=lane_dead, local=local,
               throughput=throughput, ray_dir_ws=ray_dir_ws,
               pick_diffuse=pick_diffuse, roughness=roughness, pos=pos,
               sun_light=sun_light, spot_contribs=tuple(spot_contribs))
    return state, tuple(shadow_reqs), mid


def _flush_shadow(bvh, shadow_reqs, plan, alpha_test, proxy=None, cut=None):
    """One any_hit per shadow request (the reference's separate TraceRay
    dispatches, RayTrace.hlsl:262,311,434).

    A concatenated same-accept batch (sun+terminal as one 2N call) was tried
    and MEASURED SLOWER on the v5e: 397 ms for the 1.04M-lane merged call vs
    150+170 ms separate at 960x540 — the merged lockstep loop pays the union
    of both sets' worst rays at every iteration and compaction phases match
    the mix worse than each set alone.

    Alpha-tested visibility punches through instead of running the
    accept_fn inside the lockstep loop (28x measured; see
    _punch_through_closest): closest-hit semantics are required for
    correctness (a first-found hit could be advanced past while a CLOSER
    accepted occluder was never visited).

    proxy (accel/proxy.DenseProxy, optional): opaque dispatches run the
    gather-free dense pre-pass first — proxy-blocked lanes resolve to 0
    without entering the walk, shrinking its lockstep width at entry.
    Visibility is EXACTLY equal either way (a proxy hit is a real
    occluder; alpha dispatches never see the proxy).

    cut (accel/proxy.AABBCut, optional): the definitely-CLEAR counterpart —
    lanes whose segment misses every covering box resolve to 1 with no
    traversal (valid for alpha dispatches too: alpha triangles are inside
    the covering boxes, so a cut miss is a miss of everything)."""
    from ..accel.proxy import cut_clear, screened_any
    vis_out = []
    for r, (_kind, use_alpha) in zip(shadow_reqs, plan):
        act = r[4]
        if cut is not None:
            act = act & ~cut_clear(cut, r[0], r[1], r[2], r[3], act)
        if use_alpha:
            rec = _punch_through_closest(partial(closest_hit, bvh),
                                         alpha_test, r[0], r[1], r[2], r[3],
                                         act)
            vis_out.append(jnp.where(act & (rec.tri_id >= 0), 0.0, 1.0))
        elif proxy is not None:
            vis_out.append(screened_any(
                lambda o_, d_, tn_, tx_, a_: any_hit(bvh, o_, d_, tn_, tx_,
                                                     a_),
                proxy, r[0], r[1], r[2], r[3], act))
        else:
            vis_out.append(any_hit(bvh, r[0], r[1], r[2], r[3], act))
    return vis_out


def _apply_vertex(settings: AppSettings, sky_cube, depth: int, flags, state,
                  mid, vis_list):
    """Fold the visibility results into the radiance sums and advance (or
    terminate) the path state (RayTrace.hlsl:379-438)."""
    s = settings
    furnace = flags["furnace"]
    f32 = jnp.float32
    n = state["ray_o"].shape[0]
    local = mid["local"]
    hit = mid["hit"]
    lane_dead = mid["lane_dead"]
    total = state["total"]
    beta = state["beta"]

    ri = 0
    if mid["sun_light"] is not None:
        local = local + mid["sun_light"] * vis_list[ri][..., None]
        ri += 1
    for light, relevant in mid["spot_contribs"]:
        local = local + jnp.where(relevant[..., None],
                                  light * vis_list[ri][..., None], 0.0)
        ri += 1

    if depth == 1 and not s.enable_direct:
        local = jnp.zeros_like(local)

    if flags["continue_paths"]:
        total = total + jnp.where(hit[..., None] & ~lane_dead[..., None],
                                  beta * local, 0.0)
        # Exact-zero cull: once the accumulated path weight is zero in
        # every channel, all future vertices contribute exactly 0 —
        # terminate the lane (the reference would keep tracing and adding
        # zeros, RayTrace.hlsl:379-438). One pathological divergence: a
        # zero-beta lane that later produced a NaN/Inf `local` (degenerate
        # normal) would propagate 0*NaN = NaN in the reference; here the
        # lane stops first and the pixel stays clean.
        beta_next = beta * mid["throughput"]
        return dict(
            total=total,
            beta=beta_next,
            active=hit & ~lane_dead & jnp.any(beta_next != 0.0, axis=-1),
            prev_is_diffuse=mid["pick_diffuse"],
            prev_roughness=mid["roughness"],
            ray_o=mid["pos"],
            ray_d=mid["ray_dir_ws"],
            t_min=jnp.full((n,), 1e-5, f32),
            t_max=jnp.full((n,), FP32Max, f32),
        )
    # Terminal vertex (RayTrace.hlsl:411-438)
    if furnace:
        local = mid["throughput"]
    else:
        vis = vis_list[ri]
        sky_r = (_sky_radiance(sky_cube, s, mid["ray_dir_ws"])
                 if s.enable_sky else jnp.zeros((n, 3), f32))
        local = local + vis[..., None] * sky_r * mid["throughput"]
    total = total + jnp.where(hit[..., None] & ~lane_dead[..., None],
                              beta * local, 0.0)
    return dict(state, total=total, active=jnp.zeros_like(state["active"]))


def trace_paths(scene, bvh, sky_cube, settings: AppSettings, frame: FrameConstants,
                ray_o, ray_d, t_max, pixel_idx, total_num_pixels: int,
                first_set_idx: int = 1, initial_is_diffuse: bool = False,
                t_min0=0.0, active0=None, sample_idx=None,
                packet_coherent: bool = False, bvh2=None, sun_bvh=None,
                ray_bvh=None, history=None, raster=None, alpha_bvh=None,
                proxy=None, cut=None):
    """Trace a wavefront of rays to completion; returns (N, 3) radiance.

    ray_o/ray_d/t_max describe the depth-1 rays (already jittered primaries for
    the interactive path, or hemisphere rays for the baker). `first_set_idx` is
    the CMJ sample-set index consumed by the *first* PathTrace vertex (the
    raygen shader consumed set 0 for the pixel jitter). The baker sets
    initial_is_diffuse=True / t_min0=1e-4 (BakeRayGen, Baking.hlsl:395-409) and
    passes its own sample counter via `sample_idx`.

    This is the MONOLITHIC form — the whole wavefront inlined into the
    caller's jit (used by the sharded multi-chip step and lax.map ray tiles).
    StagedTracer runs the identical helpers as separately-jitted stages so
    traversal executables are compiled once and reused (see its docstring).

    packet_coherent=True asserts that consecutive 128-lane groups are
    spatially coherent (render_sample's packet tiling): depth-1 closest-hit
    and sun-NEE rays then take the 128-wide packet traversal
    (accel/packet.py, ~5x measured on Sponza-class primaries) when no
    alpha-test applies; all other rays keep the per-ray path.

    ray_bvh (optional) is a second acceleration structure used ONLY by the
    per-ray traversals (terminal shadow rays, alpha punch-through, non-packet
    fallbacks). Measured on the v5e (tools/ab_wide_records.py): the wide
    bf16-internal W=32 table wins every per-ray population (terminal any
    129 -> 89 ms, bounce closest 116 -> 99 at 960x540) but LOSES on packet
    closest (61.5 -> 88 ms — ordered-descent packets want the narrow W8
    fanout), so the session passes a W32 table here while packets keep the
    classic W8 `bvh`. Results are bit-exact either way (leaves stay f32;
    bf16 child AABBs are conservatively rounded, admitting only spurious
    descents).

    raster (optional) is a render/swraster.RasterBins for THESE rays (camera
    primaries in packet-tile order): depth-1 closest hits then come from the
    binned software rasterizer (~2 gathered rows per screen-tile PAIR
    instead of ~7 BVH rows per ray) — hit-exact vs the packet traversal up
    to equal-t tie order. Opaque scenes only (alpha punch-through needs
    re-traversal with advanced t_min, which bins can't answer).

    history (optional) enables EXACT temporal hit reuse at depth 1
    (accel/history.py): a dict {"prim_tri": (N,) i32 last-sample hit ids,
    "sun_tri": (N,) i32 last-sample sun occluder ids, "tri_table": (T, 9)}
    in the SAME lane order as the rays. When given, trace_paths returns
    (radiance, new_history). Disabled internally for alpha-tested scenes
    (an occluder retest would need the opacity evaluation).
    """
    from ..accel.mxu import mxu_any_hit, mxu_closest_hit
    from ..accel.packet import (packet_any_hit, packet_any_hit_rec,
                                packet_closest_hit)
    from ..accel.history import seeded_any, seeded_closest

    s = settings
    n = ray_o.shape[0]
    rbvh = bvh if ray_bvh is None else ray_bvh
    cmj_sample_idx = frame.curr_sample_idx if sample_idx is None else sample_idx
    alpha_test = _make_alpha_test(scene, s)
    has_alpha = alpha_test is not None
    # Dense-proxy pre-pass (accel/proxy.py): gather-free broadcast MT of the
    # K largest opaque triangles screens/seeds the per-ray walks. Disabled
    # by the settings knob or DXRPT_NO_PROXY=1 (A/B).
    if (proxy is None or not s.enable_dense_proxy
            or os.environ.get("DXRPT_NO_PROXY")):
        proxy = None
    # AABB-cut clear screen (accel/proxy.py): the definitely-CLEAR
    # counterpart of the proxy's definitely-blocked verdict — per-ray
    # depth>=2 lanes that provably hit nothing skip the walk. A/B knob:
    # DXRPT_NO_CUT=1.
    if (cut is None or not s.enable_clear_cut
            or os.environ.get("DXRPT_NO_CUT")):
        cut = None
    use_packet = (packet_coherent and bool(s.enable_packet_traversal)
                  and n % 128 == 0)
    use_mxu = use_packet and bool(s.enable_mxu_traversal) and bvh2 is not None
    if use_mxu:
        pk_closest = partial(mxu_closest_hit, bvh2)
        pk_any = partial(mxu_any_hit, bvh2)
    else:
        pk_closest = partial(packet_closest_hit, bvh)
        pk_any = partial(packet_any_hit, bvh)
    return_history = history is not None
    use_history = return_history and not has_alpha and not use_mxu
    new_history = dict(history) if return_history else None
    state = _path_state0(n, ray_o, ray_d, t_max, t_min0, active0,
                         initial_is_diffuse)

    for depth, flags in _depth_schedule(s):
        alpha_now = flags["use_any_hit"] and has_alpha
        # Closest-hit routing: packets at depth 1 (primary-tile coherence
        # collapses gathers ~50x); per-ray W32 at depth >= 2 — the hybrid
        # wide table flipped the old ordering (tools/ab_bounce_route.py,
        # production tile-ordered bounce lanes at 960x540: per-ray W32
        # 122 ms vs packet W8 230 ms, bit-identical tri_ids; the pre-W32
        # measurement was 148 packet vs 167-183 per-ray). Shadow/terminal
        # rays at depth >= 2 are per-ray for the same reason.
        pk_now = use_packet and (depth == 1 or ray_bvh is None)
        # Unmasked bins (raster.opaque_only False) hold EVERY triangle and
        # serve any FORCE_OPAQUE primary dispatch — including alpha scenes
        # when alpha testing is off or this depth is past max_any_hit.
        # Masked bins (the split-alpha design's opaque-only step) cannot:
        # FORCE_OPAQUE must see alpha geometry as opaque.
        raster_now = (raster is not None and depth == 1 and use_packet
                      and not alpha_now and not use_history
                      and not raster.opaque_only)
        if raster_now:
            from .swraster import raster_closest_hit
            rec = raster_closest_hit(raster, state["ray_o"], state["ray_d"],
                                     state["t_min"], state["t_max"],
                                     state["active"])
        elif alpha_now:
            # Depth-1 alpha closest: the punch-through loop's closest_fn is
            # the UNMASKED software raster when bound (FORCE_OPAQUE
            # semantics; raster_closest_hit honors the advanced per-lane
            # t_min of resumed rounds, so every round is exact) — measured
            # the end-to-end winner in round 5 (TIMING.md). The round-4
            # split-table design stays behind DXRPT_SPLIT_ALPHA=1: it
            # measured 1056 vs 864 ms on SponzaAlpha@540p (bench protocol)
            # against plain punch-through.
            if (raster is not None and depth == 1 and not use_history
                    and not raster.opaque_only and pk_now):
                from .swraster import raster_closest_hit
                base = partial(raster_closest_hit, raster)
            else:
                base = (pk_closest if pk_now
                        else partial(closest_hit, rbvh))
            if (pk_now and not use_mxu and alpha_bvh is not None
                    and bvh.has_alpha_flags
                    and os.environ.get("DXRPT_SPLIT_ALPHA")):
                from ..accel.packet import (packet_closest_hit,
                                            packet_closest_hit_alpha)
                kc = int(os.environ.get("DXRPT_KCAND", "8"))

                def alpha_punch_fn(o_, d_, tn_, tx_, act_, mr_):
                    return _punch_through_closest(
                        partial(packet_closest_hit, alpha_bvh), alpha_test,
                        o_, d_, tn_, tx_, act_, max_rounds=mr_)

                if (raster is not None and depth == 1
                        and raster.opaque_only and not use_history):
                    # masked bins: the raster IS the opaque-only step
                    from .swraster import raster_closest_hit

                    def opq_fn(o_, d_, tn_, tx_, act_):
                        return raster_closest_hit(raster, o_, d_, tn_,
                                                  tx_, act_)
                else:
                    opq_fn = partial(packet_closest_hit, bvh,
                                     exclude_alpha=True)
                from ..accel.packet import LEAF_EXTRACT
                rec = _split_alpha_closest(
                    opq_fn,
                    partial(packet_closest_hit_alpha, alpha_bvh,
                            k_cands=kc),
                    alpha_punch_fn, alpha_test,
                    state["ray_o"], state["ray_d"],
                    state["t_min"], state["t_max"], state["active"],
                    no_overflow=alpha_bvh.leaf_size <= LEAF_EXTRACT)
            else:
                rec = _punch_through_closest(
                    base, alpha_test, state["ray_o"], state["ray_d"],
                    state["t_min"], state["t_max"], state["active"],
                    rest_fn=partial(closest_hit, rbvh) if pk_now else None)
        elif use_history and depth == 1:
            # Temporal hit reuse (accel/history.py): last sample's per-lane
            # hit triangle is revalidated (exact t upper bound) and the
            # traversal runs with the tightened t_max; a miss under the
            # seed means the predicted hit IS the closest.
            base = (pk_closest if pk_now else partial(closest_hit, rbvh))
            rec, new_history["prim_tri"] = seeded_closest(
                base, history["tri_table"], history["prim_tri"],
                state["ray_o"], state["ray_d"], state["t_min"],
                state["t_max"], state["active"])
        elif pk_now:
            rec = pk_closest(
                state["ray_o"], state["ray_d"], state["t_min"],
                state["t_max"], state["active"])
        elif (proxy is not None
              and os.environ.get("DXRPT_PROXY_SEED", "0") != "0"):
            # per-ray closest proxy SEEDING — OPT-IN (default off): exact
            # and bit-equal (tests/test_proxy.py), but measured a LOSS both
            # in isolation (tools/ab_proxy.py: bounce 337.7 -> 358.7
            # ms/frame — tightening t_max barely shrinks the ordered walk,
            # the same shape as the round-3 history-seeding negative) and
            # end-to-end (1032.8 -> 1019.3 ms with DXRPT_PROXY_SEED=0).
            # The any-hit SCREENING below carries the proxy's whole win.
            from ..accel.proxy import seeded_closest
            rec = seeded_closest(
                lambda o_, d_, tn_, tx_, a_: closest_hit(rbvh, o_, d_, tn_,
                                                         tx_, a_),
                proxy, state["ray_o"], state["ray_d"], state["t_min"],
                state["t_max"], state["active"])
        else:
            act = state["active"]
            if cut is not None:
                # Clear-cut screen: lanes that provably miss the scene skip
                # the walk; inactive lanes already yield the identical miss
                # record (t = t_max, tri_id = -1), so results are exact.
                from ..accel.proxy import cut_clear
                act = act & ~cut_clear(cut, state["ray_o"], state["ray_d"],
                                       state["t_min"], state["t_max"], act)
            rec = closest_hit(
                rbvh, state["ray_o"], state["ray_d"], state["t_min"],
                state["t_max"], act)
        state, reqs, mid = _shade_vertex(
            scene, sky_cube, s, frame, depth, flags, state, rec, pixel_idx,
            total_num_pixels, first_set_idx, cmj_sample_idx)
        if flags["early_stop"]:
            break
        plan = _shadow_plan(scene, s, depth, has_alpha, flags)
        vis_list = [None] * len(reqs)
        rest = list(range(len(reqs)))
        if sun_bvh is not None:
            # Sun NEE rays share ONE direction per restart: answer them with
            # the sun-space point-descent grid (accel/sunspace.py) — ~10
            # gathers per ray vs ~40-90 lockstep BVH steps, at every depth.
            # Alpha tests run in-loop (the descent is short enough that the
            # punch-through redesign isn't needed here).
            from ..accel.sunspace import sun_any_hit
            for i, (kind, use_alpha) in enumerate(plan):
                if kind != "sun" or use_alpha:
                    # Alpha-tested sun rays stay on the punch-through path
                    # below: an in-loop accept_fn inside the grid walk costs
                    # 12 candidate x 4-tap opacity gathers on EVERY lane
                    # EVERY record (measured 3.0 s/frame vs punch-through's
                    # 1.4 s on SponzaAlpha 960x540).
                    continue
                if (depth == 1 and use_packet
                        and not os.environ.get("DXRPT_SUNGRID_D1")):
                    # depth-1 opaque sun rays: the packet traversal is
                    # faster (80 vs 115 ms at 960x540 — primary-tile
                    # coherence collapses its gathers 50x; the grid walk
                    # can't amortize across lanes). Depth >= 2 sun rays go
                    # to the grid: 119 vs 172 ms per-ray / 255 ms packet.
                    # DXRPT_SUNGRID_D1=1 routes depth 1 to the grid too —
                    # the Sponza-measured tradeoff flips on scenes whose
                    # packet sun walks run long (SunTemple-class A/B,
                    # PERF_NOTES r5 s3).
                    continue
                r = reqs[i]
                vis_list[i] = sun_any_hit(
                    sun_bvh, r[0], r[1], r[2], r[3], r[4])
                rest.remove(i)
        if use_packet and (depth == 1 or s.packet_shadows_all_depths):
            for i, (kind, use_alpha) in enumerate(plan):
                pk_kind = (kind == "sun"
                           or (kind == "terminal"
                               and s.packet_shadows_all_depths))
                if not pk_kind or i not in rest:
                    continue
                # Sun shadow rays from packet-coherent primary hits share
                # one direction — prime packet-traversal material
                # (measured 4x vs per-ray at 960x540). Alpha-tested
                # visibility punches through with the PACKET closest-hit.
                r = reqs[i]
                if use_alpha:
                    if (not use_mxu and alpha_bvh is not None
                            and bvh.has_alpha_flags
                            and os.environ.get("DXRPT_SPLIT_ALPHA")):
                        from ..accel.packet import (packet_any_hit_rec,
                                                    packet_closest_hit,
                                                    packet_closest_hit_alpha)
                        kc = int(os.environ.get("DXRPT_KCAND", "8"))

                        def alpha_punch_fn(o_, d_, tn_, tx_, act_, mr_):
                            return _punch_through_closest(
                                partial(packet_closest_hit, alpha_bvh),
                                alpha_test, o_, d_, tn_, tx_, act_,
                                max_rounds=mr_)

                        from ..accel.packet import LEAF_EXTRACT
                        vis_list[i] = _split_alpha_visibility(
                            partial(packet_any_hit_rec, bvh,
                                    exclude_alpha=True),
                            partial(packet_closest_hit_alpha, alpha_bvh,
                                    k_cands=kc),
                            alpha_punch_fn, alpha_test,
                            r[0], r[1], r[2], r[3], r[4],
                            no_overflow=alpha_bvh.leaf_size <= LEAF_EXTRACT)
                        rest.remove(i)
                        continue
                    rec = _punch_through_closest(
                        pk_closest, alpha_test, r[0], r[1], r[2], r[3],
                        r[4], rest_fn=partial(closest_hit, rbvh))
                    vis_list[i] = jnp.where(r[4] & (rec.tri_id >= 0),
                                            0.0, 1.0)
                elif use_history and depth == 1 and kind == "sun":
                    # Temporal occlusion reuse: retest last sample's
                    # occluder triangle first — if it still blocks, the
                    # lane resolves with NO traversal (any-hit is
                    # order-free, so this is exact); shadowed regions are
                    # temporally stable, so whole packets drop out.
                    vis_list[i], new_history["sun_tri"] = seeded_any(
                        partial(packet_any_hit_rec, bvh),
                        history["tri_table"], history["sun_tri"],
                        r[0], r[1], r[2], r[3], r[4])
                elif proxy is not None and os.environ.get(
                        "DXRPT_PROXY_PACKET"):
                    # Dense-proxy screen ahead of the packet walk — OPT-IN
                    # (default off): the hoped-for mechanism was coherent
                    # shadow regions emptying whole TILES for the packet
                    # engine's phase compaction, but the driver-protocol
                    # A/B at 1080p measured it NEUTRAL-to-negative
                    # (1036.3 ms screened vs 1032.8 plain, ±0.3% spread) —
                    # the d1 packet sun walk is already cheap enough that
                    # the dense pass doesn't amortize. Visibility is
                    # exactly equal either way.
                    from ..accel.proxy import screened_any
                    vis_list[i] = screened_any(
                        lambda o_, d_, tn_, tx_, a_: pk_any(o_, d_, tn_,
                                                            tx_, a_),
                        proxy, r[0], r[1], r[2], r[3], r[4])
                else:
                    vis_list[i] = pk_any(r[0], r[1], r[2], r[3], r[4])
                rest.remove(i)
        if rest:
            sub = _flush_shadow(rbvh, [reqs[i] for i in rest],
                                [plan[i] for i in rest], alpha_test,
                                proxy=proxy, cut=cut)
            for j, i in enumerate(rest):
                vis_list[i] = sub[j]
        state = _apply_vertex(s, sky_cube, depth, flags, state, mid, vis_list)

    radiance = jnp.clip(state["total"], 0.0, FP16Max)
    if return_history:
        return radiance, new_history
    return radiance


class StagedTracer:
    """Host-orchestrated wavefront: each traversal / shading stage is its own
    jitted dispatch, mirroring the reference's per-pass command-list model
    (DXRPathTracer::Render DispatchRays + compute passes, DXRPathTracer.cpp:
    1538-1700) instead of one giant XLA program.

    Why: inlining the whole sample into one jit compiles EVERY traversal
    while_loop separately (primary + bounce closest-hit compile twice though
    they are the same program; measured 308 s compile at 960x540 with batched
    shadows). Staged, each executable is keyed by (lane count, alpha,
    first_hit) and COMPILED ONCE, then reused across depths, progressive
    samples, and row slabs (all slabs share shapes). Stage boundaries
    materialize SoA arrays in HBM (~tens of MB, ~sub-ms at HBM bandwidth) and
    dispatch asynchronously, so steady-state cost matches the monolith while
    compile time drops by the reuse factor.

    Numerics are identical to `trace_paths` by construction: both drivers
    call the same _shade_vertex/_flush_shadow/_apply_vertex helpers.
    """

    def __init__(self):
        self._jits = {}

    def _jit(self, key, builder):
        fn = self._jits.get(key)
        if fn is None:
            fn = self._jits[key] = builder()
        return fn

    # -- traversal stages (reused across depths/samples/slabs) --
    def _closest(self, use_alpha: bool):
        def build():
            @partial(jax.jit, static_argnames=("settings",))
            def run(bvh, scene, settings, o, d, tn, tx, act):
                acc = _make_alpha_test(scene, settings) if use_alpha else None
                return closest_hit(bvh, o, d, tn, tx, act, accept_fn=acc)
            return run
        return self._jit(("closest", use_alpha), build)

    def _any(self, use_alpha: bool, n_split: int):
        """Batched shadow stage: concatenates `n_split` same-length request
        tuples, runs ONE any_hit, splits the result — all inside the jit so
        the host never dispatches eager concat/slice ops (each eager op on
        the tunneled device costs ~10 ms serialized; see PERF_NOTES.md)."""
        def build():
            @partial(jax.jit, static_argnames=("settings",))
            def run(bvh, scene, settings, reqs):
                acc = _make_alpha_test(scene, settings) if use_alpha else None
                if len(reqs) == 1:
                    o, d, tn, tx, act = reqs[0]
                    return (any_hit(bvh, o, d, tn, tx, act, accept_fn=acc),)
                cat = [jnp.concatenate([r[k] for r in reqs], axis=0)
                       for k in range(5)]
                v = any_hit(bvh, *cat, accept_fn=acc)
                n = reqs[0][0].shape[0]
                return tuple(v[j * n:(j + 1) * n] for j in range(len(reqs)))
            return run
        return self._jit(("any", use_alpha, n_split), build)

    # -- shading stages (small elementwise programs, one per depth) --
    def _shade(self, depth: int, flags_key):
        def build():
            @partial(jax.jit, static_argnames=(
                "settings", "depth", "total_num_pixels", "first_set_idx"))
            def run(scene, sky_cube, settings, frame, depth, state, rec,
                    pixel_idx, total_num_pixels, first_set_idx, cmj_idx):
                flags = dict(_depth_schedule(settings))[depth]
                return _shade_vertex(scene, sky_cube, settings, frame, depth,
                                     flags, state, rec, pixel_idx,
                                     total_num_pixels, first_set_idx, cmj_idx)
            return run
        return self._jit(("shade", depth, flags_key), build)

    def _apply(self, depth: int, flags_key):
        def build():
            @partial(jax.jit, static_argnames=("settings", "depth"))
            def run(sky_cube, settings, depth, state, mid, vis_list):
                flags = dict(_depth_schedule(settings))[depth]
                return _apply_vertex(settings, sky_cube, depth, flags, state,
                                     mid, tuple(vis_list))
            return run
        return self._jit(("apply", depth, flags_key), build)

    def trace(self, scene, bvh, sky_cube, settings: AppSettings,
              frame: FrameConstants, ray_o, ray_d, t_max, pixel_idx,
              total_num_pixels: int, first_set_idx: int = 1,
              initial_is_diffuse: bool = False, t_min0=0.0, active0=None,
              sample_idx=None):
        """Staged equivalent of trace_paths (same signature/semantics)."""
        s = settings
        n = ray_o.shape[0]
        cmj_idx = frame.curr_sample_idx if sample_idx is None else sample_idx
        has_alpha = _make_alpha_test(scene, s) is not None

        def build_init():
            @partial(jax.jit, static_argnames=("t0", "idiff"))
            def run(ray_o, ray_d, t_max, active0, t0, idiff):
                return _path_state0(ray_o.shape[0], ray_o, ray_d, t_max,
                                    t0, active0, idiff)
            return run

        state = self._jit(("init",), build_init)(
            ray_o, ray_d, t_max, active0,
            float(t_min0), bool(initial_is_diffuse))

        for depth, flags in _depth_schedule(s):
            flags_key = tuple(sorted(flags.items()))
            rec = self._closest(flags["use_any_hit"] and has_alpha)(
                bvh, scene, s, state["ray_o"], state["ray_d"],
                state["t_min"], state["t_max"], state["active"])
            state, reqs, mid = self._shade(depth, flags_key)(
                scene, sky_cube, s, frame, depth, state, rec, pixel_idx,
                total_num_pixels, first_set_idx, cmj_idx)
            if flags["early_stop"]:
                break
            plan = _shadow_plan(scene, s, depth, has_alpha, flags)
            vis_list = self._flush(bvh, scene, s, reqs, plan)
            state = self._apply(depth, flags_key)(
                sky_cube, s, depth, state, mid, vis_list)

        def build_finish():
            return jax.jit(lambda total: jnp.clip(total, 0.0, FP16Max))

        return self._jit(("finish",), build_finish)(state["total"])

    def _flush(self, bvh, scene, settings, shadow_reqs, plan):
        """One jitted any_hit dispatch per shadow request (concat batching
        measured slower — see _flush_shadow)."""
        vis_out = []
        for r, (_kind, use_alpha) in zip(shadow_reqs, plan):
            stage = self._any(use_alpha, 1)
            vis_out.append(stage(bvh, scene, settings, (r,))[0])
        return vis_out


# Max rays per traversal tile. A frame's wavefront runs as a sequence of tiles
# via lax.map: bounds peak memory (leaf-gather temporaries are O(tile)),
# sidesteps TPU kernel faults observed on multi-hundred-k-lane integrator
# programs, and lets each tile's traversal while_loop exit as soon as *its*
# rays finish instead of waiting on the frame's single worst ray.
TILE_RAYS = 524288


def raygen(settings: AppSettings, frame: FrameConstants, width: int,
           height: int, row_offset=0, total_height=None):
    """RaygenShader's primary-ray setup (RayTrace.hlsl:92-127): CMJ pixel
    jitter (set 0) + InvViewProjection un-projection with y-flip. Returns
    (ray_start, ray_dir, ray_len, pixel_idx) flat over height*width rays."""
    s = settings
    f32 = jnp.float32
    th = total_height if total_height is not None else height

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=f32), jnp.arange(width, dtype=f32),
                          indexing="ij")
    yy = yy + jnp.asarray(row_offset, f32)
    pixel_idx = (yy * width + xx).reshape(-1).astype(jnp.uint32)

    # set 0: pixel jitter
    jitter = cmj.sample_cmj_2d(frame.curr_sample_idx, int(s.sqrt_num_samples),
                               int(s.sqrt_num_samples), pixel_idx)
    px = xx.reshape(-1) + jitter[..., 0]
    py = yy.reshape(-1) + jitter[..., 1]

    ncd_x = px / (width * 0.5) - 1.0
    ncd_y = -(py / (th * 0.5) - 1.0)

    ivp = frame.inv_view_projection

    def unproject(z):
        # Explicit row-vector transform (x, y, z, 1) @ ivp. Written as mul/add
        # rather than a matmul: JAX's default matmul precision on TPU is
        # bfloat16, which catastrophically cancels the tiny far-plane w
        # (~0.01 from differences of ~100) to exactly 0 -> inf/NaN rays.
        out = (ncd_x[..., None] * ivp[0] + ncd_y[..., None] * ivp[1]
               + z * ivp[2] + ivp[3])
        return out[..., :3] / out[..., 3:4]

    ray_start = unproject(0.0)
    ray_end = unproject(1.0)
    seg = ray_end - ray_start
    ray_len = jnp.sqrt(jnp.maximum(dot(seg, seg), 1e-30))
    ray_dir = seg / ray_len[..., None]
    return ray_start, ray_dir, ray_len, pixel_idx


def _packet_tile_dims(height: int, width: int):
    """Pick an 128-pixel tile (ty, tx) that divides the image, preferring
    square-ish footprints (best packet coherence)."""
    for ty in (8, 16, 4, 32, 2, 64, 1, 128):
        tx = 128 // ty
        if height % ty == 0 and width % tx == 0:
            return ty, tx
    return None


def _tile_order(x, height, width, ty, tx):
    """Row-major (H*W, ...) -> packet-tiled order (each 128 consecutive
    lanes = one ty x tx pixel tile). Pure reshape/transpose (no gather)."""
    trail = x.shape[1:]
    x = x.reshape(height // ty, ty, width // tx, tx, *trail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(height * width, *trail)


def _untile_order(x, height, width, ty, tx):
    """Inverse of _tile_order."""
    trail = x.shape[1:]
    x = x.reshape(height // ty, width // tx, ty, tx, *trail)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(height * width, *trail)


def render_sample(scene, bvh, sky_cube, settings: AppSettings, frame: FrameConstants,
                  width: int, height: int, accum, row_offset=0,
                  total_height=None, bvh2=None, sun_bvh=None, ray_bvh=None,
                  accum_sample_idx=None, history=None, raster=None,
                  alpha_bvh=None, proxy=None, cut=None):
    """One progressive sample: raygen + trace + running-mean accumulation
    (RaygenShader, RayTrace.hlsl:92-149). Returns the new accumulation image
    (height, width, 3) f32.

    For multi-chip row sharding (parallel/mesh.py), `height` is the local row
    count, `row_offset` the shard's first global row (traced OK), and
    `total_height` the full image height — pixel indices and NDC stay global so
    a sharded render matches single-chip to rounding (fusion-order ULPs).

    For SAMPLE sharding (parallel/mesh.make_sample_parallel_step), the caller
    rewrites frame.curr_sample_idx to the device's GLOBAL sample index (CMJ
    decorrelation + jitter) and passes the device-LOCAL accumulated sample
    count as `accum_sample_idx` so the running mean stays a true mean of the
    samples this shard has actually taken.

    history (optional): temporal hit-reuse state (see trace_paths) — OPAQUE
    (N,) i32 arrays in packet-tile lane order plus the (T, 9) tri_table.
    When given, returns (accum', history'); only the packet branch consumes
    it (other branches pass it through unchanged). The caller must reset it
    (ids to -1) on any restart, exactly like the accumulation image.
    """
    s = settings
    f32 = jnp.float32
    th = total_height if total_height is not None else height
    n = width * th

    ray_start, ray_dir, ray_len, pixel_idx = raygen(
        s, frame, width, height, row_offset, th)

    n_local = width * height
    n_tiles = max(1, -(-n_local // TILE_RAYS))
    while n_tiles > 1 and n_local % n_tiles != 0:
        n_tiles += 1  # image sizes are highly composite; terminates quickly
    pk_dims = (_packet_tile_dims(height, width)
               if (s.enable_packet_traversal and n_tiles == 1
                   and n_local % 128 == 0) else None)
    if n_tiles > 1:
        tile = n_local // n_tiles

        def trace_tile(args):
            t_o, t_d, t_len, t_pix = args
            return trace_paths(scene, bvh, sky_cube, s, frame,
                               t_o, t_d, t_len, t_pix, n, first_set_idx=1,
                               sun_bvh=sun_bvh, ray_bvh=ray_bvh, proxy=proxy,
                               cut=cut)

        radiance = jax.lax.map(trace_tile, (
            ray_start.reshape(n_tiles, tile, 3),
            ray_dir.reshape(n_tiles, tile, 3),
            ray_len.reshape(n_tiles, tile),
            pixel_idx.reshape(n_tiles, tile),
        ))
    elif pk_dims is not None:
        # Packet-tiled lane order: each 128 consecutive lanes = one ty x tx
        # pixel tile, making depth-1 rays packet-coherent (accel/packet.py).
        ty, tx = pk_dims
        out = trace_paths(
            scene, bvh, sky_cube, s, frame,
            _tile_order(ray_start, height, width, ty, tx),
            _tile_order(ray_dir, height, width, ty, tx),
            _tile_order(ray_len, height, width, ty, tx),
            _tile_order(pixel_idx, height, width, ty, tx),
            n, first_set_idx=1, packet_coherent=True, bvh2=bvh2,
            sun_bvh=sun_bvh, ray_bvh=ray_bvh, history=history,
            alpha_bvh=alpha_bvh, proxy=proxy, cut=cut,
            raster=raster if (raster is not None
                              and (raster.ty, raster.tx) == (ty, tx))
            else None)
        if history is not None:
            radiance, history = out
        else:
            radiance = out
        radiance = _untile_order(radiance, height, width, ty, tx)
    else:
        radiance = trace_paths(scene, bvh, sky_cube, s, frame,
                               ray_start, ray_dir, ray_len, pixel_idx, n,
                               first_set_idx=1, sun_bvh=sun_bvh,
                               ray_bvh=ray_bvh, proxy=proxy, cut=cut)
    radiance = radiance.reshape(height, width, 3)

    acc_idx = (frame.curr_sample_idx if accum_sample_idx is None
               else accum_sample_idx)
    lerp_factor = acc_idx.astype(f32) / (acc_idx.astype(f32) + 1.0)
    new_accum = radiance + (accum - radiance) * lerp_factor
    if history is not None:
        return new_accum, history
    return new_accum
