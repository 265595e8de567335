"""Decompose the SponzaAlpha premium on the current device.

Three interleaved sessions at the same resolution:
  A  SponzaAlpha, alpha testing ON  (production semantics)
  B  SponzaAlpha, max_any_hit_path_length=0 (FORCE_OPAQUE everywhere:
     same geometry/BVH, no punch-through rounds, no alpha shadow taps)
  C  opaque Sponza stand-in         (raster primary engages, no cards)

A-B isolates the punch-through + alpha-shadow cost; B-C isolates the card
geometry + raster-primary-disabled cost. VERDICT r3 #5 wants the total
premium (A vs C) down from 2.46x to <=1.5x.

Usage: python tools/probe_alpha_premium.py [--frames 6] [--width 960]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    args = ap.parse_args()

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.scene.registry import sponza_alpha_standin

    os.environ.pop("DXRPT_ALPHA_SPLIT", None)  # split is default-off
    alpha_scene, preset = sponza_alpha_standin()

    base = AppSettings(current_scene=Scenes.Sponza, benchmark_mode=True,
                       max_path_length=3)
    sessions = {}
    sessions["A_alpha_on"] = RenderSession(
        settings=base, width=args.width, height=args.height,
        scene=alpha_scene, preset=preset)
    sessions["B_alpha_off"] = RenderSession(
        settings=base.replace(max_any_hit_path_length=0),
        width=args.width, height=args.height,
        scene=alpha_scene, preset=preset)
    sessions["C_opaque"] = RenderSession(
        settings=base, width=args.width, height=args.height)

    def frame(s):
        fr = s.frame_constants(s.sample_idx)
        s._accum_slabs = s._step(s.scene, s.bvh, s._accum_slabs,
                                 s._sky_cube_dev, fr, s.settings)
        s.sample_idx += 1

    def sync(s):
        float(s._accum_slabs[-1][0, 0, 0])

    for name, s in sessions.items():
        t0 = time.time()
        frame(s)
        sync(s)
        print(f"# {name}: compile+first-frame {time.time()-t0:.1f}s",
              flush=True)

    times = {k: [] for k in sessions}
    for rep in range(args.frames):
        for name, s in sessions.items():
            sync(s)
            t0 = time.time()
            frame(s)
            sync(s)
            times[name].append(time.time() - t0)

    print(f"\n# SponzaAlpha premium decomposition "
          f"{args.width}x{args.height}, interleaved of {args.frames}:")
    meds = {}
    for name in sessions:
        ts = sorted(times[name])
        meds[name] = ts[len(ts) // 2]
        print(f"{name:12s}: best {ts[0]*1e3:8.1f} ms  "
              f"median {meds[name]*1e3:8.1f} ms")
    a, b, c = (meds[k] for k in ("A_alpha_on", "B_alpha_off", "C_opaque"))
    print(f"\npremium total (A/C): {a/c:.2f}x")
    print(f"  punch+alpha-shadow (A-B): {(a-b)*1e3:8.1f} ms")
    print(f"  cards+no-raster    (B-C): {(b-c)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
