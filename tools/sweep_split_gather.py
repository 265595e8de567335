#!/usr/bin/env python3
"""Validate the re-enabled 4-way split gather across real tables x shapes.

Round 2 shipped this latency-overlap row fetch and the then-current axon
stack MISCOMPILED it (lanes >= 128 all-missed for n <= ~576 — silently).
The round-5 canary (artifacts/canary.json) measured the bug gone; the
split fetch ships behind accel/traverse._SPLIT_GATHER_DEFAULT, and THIS
SWEEP IS THE GATE for flipping that default: for every scene table and a grid of dispatch lane
counts covering every HISTORICAL bad shape (the round-2 split-gather band
AND the round-3/4 lane-quarantine band), run the per-ray closest hit with
the split fetch and with the single-gather fallback and demand BIT-EQUAL
(t, tri_id) — the fallback engine is the incumbent whose correctness the
whole test pyramid pins. Packet traversal is swept the same way at its
%128 shapes. Results append to artifacts/split_gather_sweep.json.

Run ON THE TPU: python tools/sweep_split_gather.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [256, 576, 1024, 6912, 16384, 24576, 36864, 57600, 65536, 98304,
         131072, 262144, 518400]
SIZES_QUICK = [576, 6912, 36864, 131072, 518400]
PACKET_SIZES = [256, 6912 // 128 * 128, 36864, 131072, 518400]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scenes", default="Sponza,Stronghold")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dxrpathtracer_tpu.accel.lbvh import build_bvh_for_scene
    from dxrpathtracer_tpu.accel import traverse as trav
    from dxrpathtracer_tpu.accel import packet as pk
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import load_scene

    sizes = SIZES_QUICK if args.quick else SIZES
    rng = np.random.default_rng(7)
    report = {"date": time.strftime("%Y-%m-%d %H:%M"),
              "jax": jax.__version__,
              "backend": jax.default_backend(),
              "sizes": sizes, "tables": {}}
    bad_total = 0

    for scene_name in args.scenes.split(","):
        scene, _preset = load_scene(Scenes[scene_name])
        pos = np.asarray(scene.positions)
        tri = np.asarray(scene.tri_idx)
        lo, hi = pos.min(0), pos.max(0)
        span = hi - lo

        def rays(n):
            o = (lo + rng.uniform(0.1, 0.9, (n, 3)) * span).astype(np.float32)
            d = rng.normal(size=(n, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            return jnp.asarray(o), jnp.asarray(d)

        for width in (8, 32):
            bvh = build_bvh_for_scene(scene, positions=pos, tri_idx=tri,
                                      width=width)
            key = f"{scene_name}_W{width}"
            rows = {}
            for n in sizes:
                o, d = rays(n)
                tmin = jnp.zeros((n,), jnp.float32)
                tmax = jnp.full((n,), 3e38, jnp.float32)

                os.environ["DXRPT_SPLIT_GATHER"] = "1"
                r_split = jax.jit(lambda o_, d_, tn_, tx_: trav.closest_hit(
                    bvh, o_, d_, tn_, tx_))(o, d, tmin, tmax)
                t_s = np.asarray(r_split.t)
                i_s = np.asarray(r_split.tri_id)

                os.environ["DXRPT_SPLIT_GATHER"] = "0"
                r_single = jax.jit(lambda o_, d_, tn_, tx_: trav.closest_hit(
                    bvh, o_, d_, tn_, tx_))(o, d, tmin, tmax)
                os.environ.pop("DXRPT_SPLIT_GATHER", None)
                t_r = np.asarray(r_single.t)
                i_r = np.asarray(r_single.tri_id)

                bad = int(((t_s != t_r) | (i_s != i_r)).sum())
                rows[str(n)] = bad
                bad_total += bad
                print(f"{key} n={n}: mismatches {bad} "
                      f"(hit frac {float((i_r >= 0).mean()):.3f})",
                      flush=True)
            report["tables"][key] = rows

        # packet engine, W8 table only (its production table)
        bvh8 = build_bvh_for_scene(scene, positions=pos, tri_idx=tri,
                                   width=8)
        rows = {}
        for n in PACKET_SIZES:
            o, d = rays(n)
            tmin = jnp.zeros((n,), jnp.float32)
            tmax = jnp.full((n,), 3e38, jnp.float32)
            os.environ["DXRPT_SPLIT_GATHER"] = "1"
            a = jax.jit(lambda o_, d_, tn_, tx_: pk.packet_closest_hit(
                bvh8, o_, d_, tn_, tx_))(o, d, tmin, tmax)
            t_s, i_s = np.asarray(a.t), np.asarray(a.tri_id)
            os.environ["DXRPT_SPLIT_GATHER"] = "0"
            b = jax.jit(lambda o_, d_, tn_, tx_: pk.packet_closest_hit(
                bvh8, o_, d_, tn_, tx_))(o, d, tmin, tmax)
            os.environ.pop("DXRPT_SPLIT_GATHER", None)
            t_r, i_r = np.asarray(b.t), np.asarray(b.tri_id)
            bad = int(((t_s != t_r) | (i_s != i_r)).sum())
            rows[str(n)] = bad
            bad_total += bad
            print(f"{scene_name}_packet n={n}: mismatches {bad}", flush=True)
        report["tables"][f"{scene_name}_packet"] = rows

    report["bad_total"] = bad_total
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "split_gather_sweep.json")
    hist = []
    if os.path.exists(out):
        with open(out) as f:
            hist = json.load(f)
    hist.append(report)
    with open(out, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"total mismatches: {bad_total} -> {out}")
    sys.exit(0 if bad_total == 0 else 1)


if __name__ == "__main__":
    main()
