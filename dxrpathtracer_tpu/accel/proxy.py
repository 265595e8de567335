"""Dense-proxy pre-pass for per-ray traversals — gather-free first stage.

The depth>=2 block (bounce closest-hit + terminal any-hit) dominates the
frame (~2/3 at 1080p, PERF_NOTES round-3 s6 decomposition) and runs at the
platform's serialized-gather ceiling: every alternative ROW-FETCH engine has
been measured slower (PERF_NOTES rounds 2-4). This module attacks the block
from the other side — fewer lanes/rows in the lockstep walk — with a stage
that fetches NOTHING per lane:

    test every lane against the K largest-area opaque triangles as one
    fused (N, K) broadcast Moller-Trumbore. The triangle rows are a ~5 KB
    broadcast constant, so the stage costs pure VPU math (~66M MT pairs at
    518k lanes / K=128 ~= a few ms) and ZERO gathered rows.

In architectural scenes the largest triangles (floors, walls, ceilings)
catch most scattered rays:

  - terminal / shadow any-hit: a proxy hit IS a definitive occlusion (the
    proxy set is a subset of the scene; any-hit is order-free), so blocked
    lanes never enter the BVH walk at all — the walk starts with a reduced
    active set and its compaction phases halve the lockstep width
    immediately (accel/traverse.py phase conds trigger at entry).
  - bounce closest-hit: the proxy's min-t is an EXACT upper bound achieved
    by a real triangle, so the walk runs with t_max = t_proxy and ordered
    descent prunes every subtree beyond it; lanes whose true hit IS the
    proxy triangle reduce to a (pruned) verification walk.

Exactness: identical results up to equal-t tie order (the proxy triangle
wins a bit-equal-t tie against a different main-walk triangle; the unseeded
walk takes whichever its descent order found first) — the same divergence
class as the software raster's, pinned by tests/test_proxy.py. Alpha-flagged
triangles are excluded from the proxy set, so FORCE_OPAQUE semantics are
preserved on every ray class that uses it (the per-ray depth>=2 paths are
FORCE_OPAQUE by the reference's MaxAnyHitPathLength=1 default,
AppSettings.cs:146; alpha-tested dispatches never see the proxy).

Reference mapping: this stage has no DXR counterpart — hardware MIMD
traversal needs no lockstep rescue (RayTrace.hlsl:407-438 just calls
TraceRay). It is a TPU-native restructuring in the same family as the
sun-space grid (accel/sunspace.py) and the software raster
(render/swraster.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3e38)


def _register(cls, meta=()):
    data = tuple(f.name for f in dataclasses.fields(cls) if f.name not in meta)
    jax.tree_util.register_dataclass(cls, data_fields=list(data),
                                     meta_fields=list(meta))
    return cls


@dataclasses.dataclass(frozen=True)
class DenseProxy:
    """K proxy triangles as broadcast-ready SoA columns: (1, K) each of
    v0/e1/e2 xyz plus original triangle ids. ~5 KB at K=128 — lives in
    registers/VMEM as an XLA broadcast constant, never gathered."""

    v0x: jax.Array; v0y: jax.Array; v0z: jax.Array  # noqa: E702
    e1x: jax.Array; e1y: jax.Array; e1z: jax.Array  # noqa: E702
    e2x: jax.Array; e2y: jax.Array; e2z: jax.Array  # noqa: E702
    tri_id: jax.Array  # (1, K) i32 original triangle indices

    @property
    def k(self):
        return self.tri_id.shape[1]


_register(DenseProxy)


def build_dense_proxy(positions, tri_idx, tri_alpha=None, k: int = 128):
    """Select the K largest-area triangles (host numpy, once per scene) and
    pack them for the broadcast test. tri_alpha (optional (T,) bool) masks
    alpha-tested triangles OUT of the set — a proxy hit must be a definitive
    FORCE_OPAQUE occlusion. Returns None for scenes with < 8 eligible
    triangles (nothing worth a pre-pass)."""
    # v0/e1/e2 in FLOAT32, matching accel/lbvh's leaf packer bit-for-bit
    # (e1 = sv1 - sv0 in f32) so a proxy t and the walk's t of the same
    # triangle are the identical fp expression on identical inputs; area
    # ranking alone runs in f64.
    pos = np.asarray(positions, np.float32)
    tri = np.asarray(tri_idx)
    v0 = pos[tri[:, 0]]
    e1 = pos[tri[:, 1]] - v0
    e2 = pos[tri[:, 2]] - v0
    area2 = np.linalg.norm(np.cross(e1.astype(np.float64),
                                    e2.astype(np.float64)), axis=1)
    if tri_alpha is not None:
        area2 = np.where(np.asarray(tri_alpha, bool), -1.0, area2)
    k = min(k, int((area2 > 0).sum()))
    if k < 8:
        return None
    sel = np.argpartition(area2, -k)[-k:].astype(np.int32)
    sel = sel[np.argsort(-area2[sel], kind="stable")]
    cols = dict(
        v0x=v0[sel, 0], v0y=v0[sel, 1], v0z=v0[sel, 2],
        e1x=e1[sel, 0], e1y=e1[sel, 1], e1z=e1[sel, 2],
        e2x=e2[sel, 0], e2y=e2[sel, 1], e2z=e2[sel, 2])
    return DenseProxy(
        tri_id=jnp.asarray(sel[None, :]),
        **{n: jnp.asarray(c[None, :]) for n, c in cols.items()})


def proxy_closest(proxy: DenseProxy, ray_o, ray_d, t_min, t_max, active):
    """Min-t proxy hit per lane: one fused (N, K) Moller-Trumbore with the
    EXACT expression order of accel/traverse._intersect_leaf (bit-parity of
    each t with the walk's own test of the same triangle). Returns
    (t, tri_id, u, v) with t == t_max / tri_id == -1 where no proxy hit.
    Ties take the lowest slot = the LARGEST-area triangle (selection order),
    deterministic regardless of K."""
    ox, oy, oz = (ray_o[:, c:c + 1] for c in range(3))
    dx, dy, dz = (ray_d[:, c:c + 1] for c in range(3))
    px = dy * proxy.e2z - dz * proxy.e2y
    py = dz * proxy.e2x - dx * proxy.e2z
    pz = dx * proxy.e2y - dy * proxy.e2x
    det = proxy.e1x * px + proxy.e1y * py + proxy.e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - proxy.v0x
    ty = oy - proxy.v0y
    tz = oz - proxy.v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * proxy.e1z - tz * proxy.e1y
    qy = tz * proxy.e1x - tx * proxy.e1z
    qz = tx * proxy.e1y - ty * proxy.e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (proxy.e2x * qx + proxy.e2y * qy + proxy.e2z * qz) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t >= t_min[:, None]) & (t < t_max[:, None])
          & active[:, None])
    key = jnp.where(ok, t, _BIG)
    best = jnp.min(key, axis=1)
    kk = proxy.k
    slot = jnp.arange(kk, dtype=jnp.int32)[None, :]
    min_slot = jnp.min(jnp.where(key <= best[:, None], slot, kk), axis=1)
    first = slot == min_slot[:, None]
    win = best < _BIG
    out_tri = jnp.where(win, jnp.sum(jnp.where(first, proxy.tri_id, 0),
                                     axis=1), -1)
    out_u = jnp.sum(jnp.where(first, u, 0.0), axis=1)
    out_v = jnp.sum(jnp.where(first, v, 0.0), axis=1)
    return (jnp.where(win, best, t_max), out_tri,
            jnp.where(win, out_u, 0.0), jnp.where(win, out_v, 0.0))


def proxy_blocked(proxy: DenseProxy, ray_o, ray_d, t_min, t_max, active):
    """Any-hit form: (N,) bool, True where some proxy triangle occludes the
    segment. A True verdict is definitive (subset of the scene); False means
    the exact walk must decide."""
    ox, oy, oz = (ray_o[:, c:c + 1] for c in range(3))
    dx, dy, dz = (ray_d[:, c:c + 1] for c in range(3))
    px = dy * proxy.e2z - dz * proxy.e2y
    py = dz * proxy.e2x - dx * proxy.e2z
    pz = dx * proxy.e2y - dy * proxy.e2x
    det = proxy.e1x * px + proxy.e1y * py + proxy.e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - proxy.v0x
    ty = oy - proxy.v0y
    tz = oz - proxy.v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * proxy.e1z - tz * proxy.e1y
    qy = tz * proxy.e1x - tx * proxy.e1z
    qz = tx * proxy.e1y - ty * proxy.e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (proxy.e2x * qx + proxy.e2y * qy + proxy.e2z * qz) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t >= t_min[:, None]) & (t < t_max[:, None]))
    return active & jnp.any(ok, axis=1)


def seeded_closest(closest_fn, proxy: DenseProxy, ray_o, ray_d, t_min,
                   t_max, active):
    """Proxy-seeded closest hit. The walk runs with
    t_max = proxy_t * (1 + 1e-5): the slight inflation lets the walk find
    the proxy triangle ITSELF (it is in the main table), so found hits are
    bit-equal to the unseeded walk — the dense stage's own fp evaluation of
    the same triangle can differ by a few ULPs (different vectorization
    shapes), and an exact bound would sometimes prune the winner. A finite
    initial bound only prunes MORE subtrees; it never changes the minimum
    while the winner's t stays under it. Only when the walk still misses
    (the two evaluations disagree by > 1e-5 relative — fp-degenerate
    slivers) does the proxy record substitute; divergence vs the plain walk
    is then confined to that near-tie window (pinned in tests)."""
    from .traverse import HitRecord
    pt, ptri, pu, pv = proxy_closest(proxy, ray_o, ray_d, t_min, t_max,
                                     active)
    bound = jnp.where(ptri >= 0, pt * (1.0 + 1e-5), pt)
    rec = closest_fn(ray_o, ray_d, t_min, bound, active)
    hit = rec.tri_id >= 0
    return HitRecord(t=jnp.where(hit, rec.t, pt),
                     tri_id=jnp.where(hit, rec.tri_id, ptri),
                     u=jnp.where(hit, rec.u, pu),
                     v=jnp.where(hit, rec.v, pv))


def screened_any(any_fn, proxy: DenseProxy, ray_o, ray_d, t_min, t_max,
                 active, cut=None):
    """Proxy-screened any-hit visibility: proxy-blocked lanes resolve to 0
    with no traversal; the walk runs only for the rest (its compaction
    phases shrink the lockstep width at entry).

    cut (AABBCut, optional): the complementary DEFINITELY-CLEAR screen —
    lanes whose segment misses every covering box provably hit nothing and
    resolve to 1 with no traversal either. Together the two broadcast
    stages leave the exact walk only the ambiguous middle."""
    blocked = proxy_blocked(proxy, ray_o, ray_d, t_min, t_max, active)
    act = active & ~blocked
    if cut is not None:
        act = act & ~cut_clear(cut, ray_o, ray_d, t_min, t_max, act)
    vis = any_fn(ray_o, ray_d, t_min, t_max, act)
    return jnp.where(blocked, 0.0, vis)


# ---------------------------------------------------------------------------
# AABB-cut "definitely clear" screen — the other half of the pre-pass.
#
# The dense proxy resolves DEFINITELY-BLOCKED lanes (a proxy hit is a real
# occluder). This stage resolves DEFINITELY-CLEAR lanes: partition the
# triangle set into C morton-contiguous chunks (= LBVH subtrees) and keep
# each chunk's covering AABB as a (1, C) broadcast constant. A segment that
# misses ALL C boxes provably intersects no triangle — the lane never enters
# the walk (any-hit: vis = 1; closest: the miss record inactive lanes
# already produce). Open-sky scenes (the SunTemple-class courtyard — the
# worst scene in TIMING.md's matrix) are exactly where the proxy's blocked
# fraction collapses and this clear fraction takes over.
#
# Like the proxy, the stage costs ZERO gathered rows: one fused (N, C) slab
# test (~3 KB of broadcast constants at C=128). Conservative on both sides:
# boxes are expanded outward at build (f64 -> directed f32 + extent epsilon)
# and the hit predicate keeps fp-marginal lanes AMBIGUOUS (the exact walk
# decides them), so a True verdict is safe by construction.
#
# Reference mapping: no DXR counterpart (hardware MIMD traversal exits a
# missing ray in a handful of node tests, RayTrace.hlsl:407-438 TraceRay);
# this is lockstep-width rescue in the same family as the proxy above.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AABBCut:
    """C covering AABBs as broadcast-ready SoA columns, (1, C) f32 each."""

    lox: jax.Array; loy: jax.Array; loz: jax.Array  # noqa: E702
    hix: jax.Array; hiy: jax.Array; hiz: jax.Array  # noqa: E702

    @property
    def c(self):
        return self.lox.shape[1]


_register(AABBCut)


def build_aabb_cut(positions, tri_idx, c: int = 128):
    """Morton-sort triangle centroids, split the order into `c` contiguous
    chunks, box each chunk (host numpy, once per scene). Every triangle is
    in exactly one chunk, so missing all boxes is a definitive scene miss.
    Boxes are expanded outward by 1e-5 x scene diagonal (+ f64->f32 directed
    rounding slack) so build-side fp can never shrink coverage."""
    from .lbvh import morton_codes_30

    pos = np.asarray(positions, np.float64)
    tri = np.asarray(tri_idx)
    t = tri.shape[0]
    if t < 8:
        return None
    c = int(min(c, max(1, t // 4)))
    v = pos[tri]                      # (T, 3, 3)
    cent = v.mean(axis=1)
    order = np.argsort(morton_codes_30(cent.astype(np.float32)),
                       kind="stable")
    bounds_lo = np.empty((c, 3), np.float64)
    bounds_hi = np.empty((c, 3), np.float64)
    edges = np.linspace(0, t, c + 1).astype(np.int64)
    for i in range(c):
        chunk = v[order[edges[i]:edges[i + 1]]]
        bounds_lo[i] = chunk.min(axis=(0, 1))
        bounds_hi[i] = chunk.max(axis=(0, 1))
    diag = np.linalg.norm(pos[tri.reshape(-1)].max(0)
                          - pos[tri.reshape(-1)].min(0))
    eps = 1e-5 * max(diag, 1e-6)
    lo = (bounds_lo - eps).astype(np.float32)
    hi = (bounds_hi + eps).astype(np.float32)
    # directed rounding: f64->f32 cast may round toward the interior
    lo = np.where(lo > bounds_lo, np.nextafter(lo, -np.inf), lo)
    hi = np.where(hi < bounds_hi, np.nextafter(hi, np.inf), hi)
    return AABBCut(
        lox=jnp.asarray(lo[None, :, 0]), loy=jnp.asarray(lo[None, :, 1]),
        loz=jnp.asarray(lo[None, :, 2]), hix=jnp.asarray(hi[None, :, 0]),
        hiy=jnp.asarray(hi[None, :, 1]), hiz=jnp.asarray(hi[None, :, 2]))


def probe_clear_fraction(cut: AABBCut, positions, tri_idx, m: int = 4096,
                         seed: int = 0) -> float:
    """Host estimate of the fraction of surface-hemisphere rays the cut
    resolves as definitely-clear — the population the depth>=2 screens see.
    Used by the session to enable the screen only where it pays: the stage
    is pure per-lane cost, so on closed interiors (clear fraction ~0) it
    can only lose, while open-sky scenes resolve a large fraction of their
    walk lanes for free. Deterministic (fixed seed), numpy-only, runs once
    per scene build (~ms)."""
    rng = np.random.default_rng(seed)
    pos = np.asarray(positions, np.float64)
    tri = np.asarray(tri_idx)
    pick = rng.integers(0, tri.shape[0], m)
    a = pos[tri[pick, 0]]
    b = pos[tri[pick, 1]]
    c = pos[tri[pick, 2]]
    r1 = np.sqrt(rng.random(m))
    r2 = rng.random(m)
    p = a * (1 - r1)[:, None] + b * (r1 * (1 - r2))[:, None] + (
        c * (r1 * r2)[:, None])
    n = np.cross(b - a, c - a)
    nl = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(nl, 1e-20)
    # uniform hemisphere about the geometric normal, random facing side
    d = rng.normal(size=(m, 3))
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    side = np.where(rng.random(m) < 0.5, 1.0, -1.0)[:, None]
    flip = np.sign(np.sum(d * n, axis=1, keepdims=True))
    d = d * np.where(flip == 0, 1.0, flip) * side
    diag = np.linalg.norm(pos.max(0) - pos.min(0))
    o = p + n * side * (1e-4 * diag)
    lo = np.stack([np.asarray(cut.lox)[0], np.asarray(cut.loy)[0],
                   np.asarray(cut.loz)[0]], axis=1)  # (C, 3)
    hi = np.stack([np.asarray(cut.hix)[0], np.asarray(cut.hiy)[0],
                   np.asarray(cut.hiz)[0]], axis=1)
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (lo[None] - o[:, None]) * inv[:, None]   # (m, C, 3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    enter = np.minimum(t0, t1).max(axis=2)
    exit_ = np.maximum(t0, t1).min(axis=2)
    hit = (enter <= exit_) & (exit_ >= 0.0)
    return float((~hit.any(axis=1)).mean())


def cut_clear(cut: AABBCut, ray_o, ray_d, t_min, t_max, active):
    """(N,) bool: True where the segment misses EVERY covering box — a
    definitive no-intersection verdict. The slab predicate errs toward
    "ambiguous": the enter/exit comparison carries a relative + absolute
    slack, so fp-marginal overlaps stay with the exact walk."""
    eps = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(ray_d) < eps,
                          jnp.where(ray_d < 0.0, -eps, eps), ray_d)
    ox, oy, oz = (ray_o[:, c:c + 1] for c in range(3))
    ix, iy, iz = (inv[:, c:c + 1] for c in range(3))
    t0x = (cut.lox - ox) * ix
    t1x = (cut.hix - ox) * ix
    t0y = (cut.loy - oy) * iy
    t1y = (cut.hiy - oy) * iy
    t0z = (cut.loz - oz) * iz
    t1z = (cut.hiz - oz) * iz
    enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min[:, None]))
    exit_ = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), t_max[:, None]))
    slack = 1e-4 * jnp.abs(exit_) + 1e-6
    maybe_hit = enter <= exit_ + slack
    return active & ~jnp.any(maybe_hit, axis=1)
