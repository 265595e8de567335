#!/usr/bin/env python3
"""Lane-count miscompile sweep: derive the traversal quarantine band from
measurement instead of folklore.

Round-3 found an axon/Mosaic wrong-result class (PERF_NOTES.md session 9):
per-ray traversals over the theInn tables compiled SILENTLY WRONG for
dispatch lane counts in a contiguous band (36864..98304 bad; 32768 and
131072 good) — every lane returned one triangle at t~0. The mitigation
(accel/traverse.py lane quarantine) pads dispatches inside hard-coded
bounds measured on ONE scene. This tool turns that into a sweep-derived
gate (VERDICT.md round-3, next-round #3):

  for each scene preset x table width (W8 packet table, W32 per-ray table):
    compile + run closest_hit at each lane count in GRID (quarantine pad
    DISABLED) with two ray populations (render-like camera rays and
    bake-like surface rays), compare exactly against the same rays
    dispatched at REF_N = 524288 (a production shape verified correct by
    tools/crosscheck_tpu.py and, here, against a numpy brute-force oracle
    on a subset);
    any_hit is swept on a reduced grid (same failure class, fewer shapes).

Outputs:
  artifacts/lane_sweep_<backend>.json — full per-point results
  dxrpathtracer_tpu/data/lane_quarantine.json — derived band bounds that
    accel/traverse.py loads at import (falls back to the round-3 constants
    when absent). Bounds are the union of bad points over ALL tables,
    expanded to the nearest verified-good grid points.

Run ON THE TPU (this is a device-miscompile detector; the CPU backend is
the correctness reference and needs no quarantine):
    python tools/sweep_lane_bands.py [--scenes A,B] [--quick]
Results append after every scene so an interrupted run keeps its progress.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Quarantine OFF for the sweep, and no foreign cache entries.
os.environ["DXRPT_NO_LANE_PAD"] = "1"

REF_N = int(os.environ.get("DXRPT_SWEEP_REF_N", 524288))
# production slab shape, verified by crosscheck + oracle
GRID_CLOSEST = [4096, 8192, 16384, 24576, 32768, 36864, 49152, 57600, 65536,
                73728, 81920, 98304, 114688, 122880, 131072, 147456, 163840,
                262144]
GRID_ANY = [16384, 36864, 57600, 65536, 98304, 131072]


def make_rays(scene_host, n, kind, seed=0, preset=None):
    """Host-numpy ray populations. kind='render': jittered PRIMARY rays
    from the scene's preset camera (the production render population);
    kind='bake': origins ON triangle surfaces, cosine-hemisphere dirs
    (the population that black-baked Stronghold@192)."""
    rng = np.random.default_rng(seed)
    pos = scene_host["positions"]
    tri = scene_host["tri_idx"]
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    center, ext = (lo + hi) / 2, (hi - lo)
    if kind == "render":
        from dxrpathtracer_tpu.render.camera import FirstPersonCamera
        cam = FirstPersonCamera(aspect=16 / 9)
        if preset is not None:
            cam.set_position(preset.camera_position)
            cam.set_x_rotation(preset.camera_rotation[0])
            cam.set_y_rotation(preset.camera_rotation[1])
        ivp = np.asarray(cam.inv_view_projection(), np.float64)
        # jittered samples over a virtual 1080p grid — the real raygen
        # mapping (integrator.raygen), vectorized in numpy
        W, H = 1920, 1080
        px = rng.uniform(0, W, n)
        py = rng.uniform(0, H, n)
        ncd = np.stack([px / (W * 0.5) - 1.0, -(py / (H * 0.5) - 1.0)], 1)

        def unproject(z):
            out = (ncd[:, 0:1] * ivp[0] + ncd[:, 1:2] * ivp[1]
                   + z * ivp[2] + ivp[3])
            return out[:, :3] / out[:, 3:4]

        start = unproject(0.0)
        end = unproject(1.0)
        seg = end - start
        d = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        return start.astype(np.float32), d.astype(np.float32)
    t_id = rng.integers(0, len(tri), n)
    u = rng.uniform(0, 1, n)
    v = rng.uniform(0, 1, n)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    a, b, c = pos[tri[t_id, 0]], pos[tri[t_id, 1]], pos[tri[t_id, 2]]
    o = a + (b - a) * u[:, None] + (c - a) * v[:, None]
    nrm = np.cross(b - a, c - a)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    z = rng.uniform(0, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(z)
    up = np.where(np.abs(nrm[:, 1:2]) < 0.9,
                  np.array([[0., 1., 0.]]), np.array([[1., 0., 0.]]))
    tan = np.cross(up, nrm)
    tan /= np.maximum(np.linalg.norm(tan, axis=1, keepdims=True), 1e-12)
    bit = np.cross(nrm, tan)
    d = (tan * (r * np.cos(phi))[:, None] + bit * (r * np.sin(phi))[:, None]
         + nrm * np.sqrt(np.maximum(1 - z, 0))[:, None])
    o = o + nrm * 1e-4 * np.linalg.norm(ext)
    return o.astype(np.float32), d.astype(np.float32)


def brute_check(v0, v1, v2, o, d, t_max, ref_t, ref_tri, k=256):
    """Numpy Moller-Trumbore oracle over ALL triangles for the first k rays;
    validates the REF_N dispatch itself. Returns mismatch count."""
    bad = 0
    for i in range(k):
        e1 = v1 - v0
        e2 = v2 - v0
        p = np.cross(d[i], e2)
        det = np.einsum("ij,ij->i", e1, p)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o[i] - v0
        u = np.einsum("ij,ij->i", tv, p) * inv
        q = np.cross(tv, e1)
        v = q @ d[i] * inv
        t = np.einsum("ij,ij->i", e2, q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 1e-4) & (t < t_max)
        if hit.any():
            tb = t[hit].min()
            if not (abs(tb - ref_t[i]) <= 1e-3 * max(1.0, abs(tb))
                    and ref_tri[i] >= 0):
                bad += 1
        elif ref_tri[i] >= 0:
            bad += 1
    return bad


# Round-3's manually-bisected bad points (PERF_NOTES session 9): per-ray
# closest over the theInn W8+W32 tables, degenerate for these lane counts.
# The derived band always covers them — a partial sweep must never SHRINK
# the quarantine below evidence from earlier sessions.
# 8192 joined 2026-08-21: first seen bad on the Stronghold W8 render
# slice (197/8192 lanes) the same night the canary probe measured the
# band "clean" — the failure is compile-session-dependent.
KNOWN_BAD = [8192, 24576, 36864, 49152, 57600, 65536, 73728, 98304]


def _point_ok(p):
    """Re-evaluate a sweep point under the fraction criterion (older
    artifacts stored strict equality, which flags near-tie fp noise)."""
    n = p["n"]
    lim = max(128, int(0.005 * n))
    ok = True
    if "closest_mismatch" in p:
        ok = ok and p["closest_mismatch"] <= lim
    if "any_mismatch" in p:
        ok = ok and p["any_mismatch"] <= lim
    return ok


def derive_band(points, backend):
    """Union quarantine band: covers every measured-bad lane count AND the
    round-3 known-bad list, bounded by the nearest measured-good points."""
    # HISTORY IS NEVER OVERRIDDEN by a clean re-measurement: the round-5
    # sweep proved this bug class FLAKY ACROSS COMPILES — the canary probe
    # measured 36864 clean the same night this sweep measured it BAD on
    # the same table, and 49152 (round-3 degenerate) measured clean while
    # 8192 (never bad before) went bad. A shape that was EVER degenerate
    # stays quarantined; only bad points accumulate.
    bad_ns = sorted({p["n"] for p in points
                     if p.get("kind") != "ref" and not _point_ok(p)}
                    | set(KNOWN_BAD))
    good_ns = sorted({p["n"] for p in points
                      if p.get("kind") != "ref" and _point_ok(p)})
    # a lane count measured bad ANYWHERE is never a band edge
    good_ns = [n for n in good_ns if n not in bad_ns]
    if not bad_ns:
        return None
    lo_cands = [n for n in good_ns if n < min(bad_ns)]
    hi_cands = [n for n in good_ns if n > max(bad_ns)]
    # Padded dispatches land exactly ON band_hi, so band_hi choice is a
    # compiled-program shape: keep the incumbent edge (131072, the round-3
    # verified-good shape every production pad already compiles at) when
    # measurements allow it, so a re-derivation doesn't invalidate the
    # whole warm XLA cache for a cosmetically-smaller pad.
    incumbent = 131072
    band_hi = min(hi_cands) if hi_cands else REF_N
    if incumbent in hi_cands:
        band_hi = incumbent
    return dict(band_lo=max(lo_cands) if lo_cands else 0,
                band_hi=band_hi,
                bad_points=bad_ns, backend=backend,
                source="tools/sweep_lane_bands.py")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="Sponza,SunTemple,BoxTest,WhiteFurnace,Stronghold")
    ap.add_argument("--quick", action="store_true",
                    help="one scene, short grid (smoke test)")
    ap.add_argument("--widths", default="8,32")
    ap.add_argument("--out", default=None)
    ap.add_argument("--derive-only", action="store_true",
                    help="re-derive the quarantine band from an existing "
                         "artifact (no device work)")
    args = ap.parse_args()

    if args.derive_only:
        path = args.out or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "lane_sweep_tpu.json")
        with open(path) as f:
            results = json.load(f)
        derived = derive_band(results["points"], results.get("backend", "?"))
        results["derived_band"] = derived
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"derived band: {derived}")
        if derived:
            qpath = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "dxrpathtracer_tpu", "data", "lane_quarantine.json")
            with open(qpath, "w") as f:
                json.dump(derived, f, indent=1)
            print(f"wrote {qpath}")
        return

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.accel.traverse import closest_hit, any_hit_rec
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import load_scene

    backend = jax.default_backend()
    grid_c = [4096, 36864, 131072] if args.quick else GRID_CLOSEST
    grid_a = [36864] if args.quick else GRID_ANY
    scenes = args.scenes.split(",")[:1] if args.quick else args.scenes.split(",")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"lane_sweep_{backend}.json")

    results = {"backend": backend, "ref_n": REF_N, "points": [],
               "grid_closest": grid_c, "grid_any": grid_a}

    for scene_name in scenes:
        scene, _preset = load_scene(Scenes[scene_name])
        preset = _preset
        pos = np.asarray(scene.positions)
        tri = np.asarray(scene.tri_idx)
        v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
        scene_host = {"positions": pos, "tri_idx": tri}
        t_max_val = float(np.linalg.norm(pos.max(0) - pos.min(0)) * 4.0)

        for width in [int(w) for w in args.widths.split(",")]:
            bvh = build_bvh(v0, v1, v2, width=width)
            print(f"== {scene_name} W{width}: rows={bvh.num_rows} ==",
                  flush=True)
            for pop in ("render", "bake"):
                o_np, d_np = make_rays(scene_host, REF_N, pop,
                                       seed=hash((scene_name, pop)) % 2**31,
                                       preset=preset)
                o = jnp.asarray(o_np)
                d = jnp.asarray(d_np)
                tmin = jnp.full((REF_N,), 1e-4, jnp.float32)
                tmax = jnp.full((REF_N,), t_max_val, jnp.float32)

                t0 = time.time()
                ref = closest_hit(bvh, o, d, tmin, tmax)
                ref_t = np.asarray(ref.t)
                ref_tri = np.asarray(ref.tri_id)
                uniq = len(np.unique(ref_tri[ref_tri >= 0]))
                print(f"  ref {pop}: hit={np.mean(ref_tri >= 0):.3f} "
                      f"uniq={uniq} ({time.time()-t0:.0f}s)", flush=True)
                nb = brute_check(v0, v1, v2, o_np, d_np, t_max_val,
                                 ref_t, ref_tri,
                                 k=64 if len(v0) > 100_000 else 256)
                results["points"].append(dict(
                    scene=scene_name, width=width, pop=pop, n=REF_N,
                    kind="ref", ok=bool(nb == 0), brute_mismatch=int(nb)))
                if nb:
                    print(f"  !! REF ITSELF BAD ({nb} brute mismatches)",
                          flush=True)

                ref_any = None
                for n in sorted(set(grid_c + grid_a)):
                    do_c = n in grid_c
                    do_a = n in grid_a
                    row = dict(scene=scene_name, width=width, pop=pop, n=n)
                    t0 = time.time()
                    if do_c:
                        rec = closest_hit(bvh, o[:n], d[:n], tmin[:n], tmax[:n])
                        bad = int(np.sum(
                            (np.asarray(rec.tri_id) != ref_tri[:n])
                            | (np.asarray(rec.t) != ref_t[:n])))
                        row["closest_mismatch"] = bad
                        # Shape-dependent fp rounding legitimately flips
                        # near-tie winners at the ~0.02% level (measured:
                        # 7-90 of 524288 across ALL lane counts, including
                        # verified-good ones); the miscompile signature is
                        # catastrophic (~100% of lanes, one degenerate tri).
                        # A max(128, 0.5%) threshold separates them by
                        # 2-3 orders of magnitude either side.
                        row["ok"] = bad <= max(128, int(0.005 * n))
                    if do_a:
                        if ref_any is None:
                            va, _ = any_hit_rec(bvh, o, d, tmin, tmax)
                            ref_any = np.asarray(va)
                        va, _ = any_hit_rec(bvh, o[:n], d[:n], tmin[:n],
                                            tmax[:n])
                        bad_a = int(np.sum(np.asarray(va) != ref_any[:n]))
                        row["any_mismatch"] = bad_a
                        row["ok"] = (row.get("ok", True)
                                     and bad_a <= max(128, int(0.005 * n)))
                    row["sec"] = round(time.time() - t0, 1)
                    results["points"].append(row)
                    print(f"  n={n:7d} {'OK ' if row['ok'] else 'BAD'} "
                          f"c={row.get('closest_mismatch', '-')} "
                          f"a={row.get('any_mismatch', '-')} "
                          f"({row['sec']}s)", flush=True)
                # checkpoint after every population
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                with open(out_path, "w") as f:
                    json.dump(results, f, indent=1)

    # ---- derive quarantine bounds ----
    derived = derive_band(results["points"], backend)
    results["derived_band"] = derived
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out_path}")
    print(f"bad lane counts: "
          f"{derived['bad_points'] if derived else 'NONE'}")
    if derived:
        print(f"derived quarantine band: ({derived['band_lo']}, "
              f"{derived['band_hi']})")
        qpath = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "dxrpathtracer_tpu", "data", "lane_quarantine.json")
        if backend != "cpu":
            with open(qpath, "w") as f:
                json.dump(derived, f, indent=1)
            print(f"wrote {qpath} (loaded by accel/traverse.py)")
    else:
        print("no bad points found on this backend/grid")
        qpath = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "dxrpathtracer_tpu", "data", "lane_quarantine.json")
        if backend != "cpu":
            # empty band: quarantine padding disabled entirely
            with open(qpath, "w") as f:
                json.dump({"band_lo": 0, "band_hi": 0,
                           "bad_points": [], "backend": backend,
                           "source": "tools/sweep_lane_bands.py (clean)"},
                          f, indent=1)
            print(f"wrote EMPTY band to {qpath} — padding disabled")


if __name__ == "__main__":
    main()
