"""Interleaved A/B: alpha-triangle subdivision levels on SponzaAlpha.

The round-3 VERDICT (#5) requires cutting the alpha-test premium
(911.6 vs 371.0 ms @540p = 2.46x; the reference pays +12%,
Timing.txt:6-8). scene/alphasplit.py attacks it at load time: transparent
sub-triangles dropped, opaque ones promoted to FORCE_OPAQUE, and — the
structural win — BVH leaves that hug branch geometry so empty card regions
never produce candidate hits (and therefore no punch-through rounds).

Frame times drift +-25% across TPU sessions (PERF_NOTES), so every variant
renders in THIS process and timings are interleaved round-robin.

Usage:  python tools/ab_alphasplit.py [--levels 0,4,6] [--frames 6]
        (level 0 = split disabled)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_session(level, width, height):
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.scene.registry import sponza_alpha_standin

    old = {k: os.environ.get(k)
           for k in ("DXRPT_ALPHA_SPLIT", "DXRPT_ALPHA_SPLIT_LEVEL")}
    try:
        if level == 0:
            os.environ.pop("DXRPT_ALPHA_SPLIT", None)
            os.environ.pop("DXRPT_ALPHA_SPLIT_LEVEL", None)
        else:
            os.environ["DXRPT_ALPHA_SPLIT"] = "1"
            os.environ["DXRPT_ALPHA_SPLIT_LEVEL"] = str(level)
        scene, preset = sponza_alpha_standin()
        settings = AppSettings(current_scene=Scenes.Sponza,
                               benchmark_mode=True, max_path_length=3)
        t0 = time.time()
        sess = RenderSession(settings=settings, width=width, height=height,
                             scene=scene, preset=preset)
        print(f"# level={level}: tris={sess.scene_host.num_triangles} "
              f"bvh_rows={sess.bvh.num_rows} init {time.time()-t0:.1f}s",
              flush=True)
        return sess
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def frame(sess):
    fr = sess.frame_constants(sess.sample_idx)
    sess._accum_slabs = sess._step(sess.scene, sess.bvh, sess._accum_slabs,
                                   sess._sky_cube_dev, fr, sess.settings)
    sess.sample_idx += 1


def sync(sess):
    float(sess._accum_slabs[-1][0, 0, 0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="0,4,6")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    sessions = {lv: build_session(lv, args.width, args.height)
                for lv in levels}
    # compile + warm every variant before any timing
    for lv, s in sessions.items():
        t0 = time.time()
        frame(s)
        sync(s)
        print(f"# level={lv}: compile+first-frame {time.time()-t0:.1f}s",
              flush=True)

    times = {lv: [] for lv in levels}
    for rep in range(args.frames):
        for lv in levels:
            s = sessions[lv]
            sync(s)
            t0 = time.time()
            frame(s)
            sync(s)
            times[lv].append(time.time() - t0)

    print(f"\n# SponzaAlpha {args.width}x{args.height}, interleaved "
          f"best/median of {args.frames}:")
    for lv in levels:
        ts = sorted(times[lv])
        best, med = ts[0], ts[len(ts) // 2]
        print(f"level={lv}: best {best*1e3:8.1f} ms  median {med*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
