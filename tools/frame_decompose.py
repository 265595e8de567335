#!/usr/bin/env python3
"""Decompose the full-frame time at a given resolution on the current device.

Times render_frame at max_path_length 1/2/3 (the passes are cumulative:
L1 = raygen + primary closest + d1 sun + sky/shade; L2 adds bounce closest +
d2 sun + terminal handling; L3 adds the second bounce) and reports the
deltas, plus a no-shadow variant isolating NEE cost. This targets the
non-traversal remainder: traversal costs are known from tools/perf_probe.py
and PERF_NOTES.md; whatever the sweep can't attribute is shading/raygen/
accumulation/compaction.

Usage: python tools/frame_decompose.py [WIDTH HEIGHT [SCENE]]
(SCENE defaults to Sponza; any Scenes enum name works, e.g. SunTemple.)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    scene_name = sys.argv[3] if len(sys.argv) > 3 else "Sponza"

    import jax
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes

    def timed_frame(sess, reps=4, trials=3):
        # enqueue `reps` frames per sync: one dispatch+readback pays the
        # ~35-73 ms tunnel RTT floor (tools/_timing.py) — the round-3
        # version of this tool synced per frame and every number under
        # ~100 ms carried up to a full RTT of error
        sess.render_frame()
        float(np.asarray(sess.accum[0, 0, 0]))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            for _ in range(reps):
                sess.render_frame(force=True)
            float(np.asarray(sess.accum[0, 0, 0]))
            best = min(best, (time.time() - t0) / reps)
        return best

    results = {}
    for label, kw in [
        ("L1", dict(max_path_length=1)),
        ("L2", dict(max_path_length=2)),
        ("L3", dict(max_path_length=3)),
        ("L3 sun off", dict(max_path_length=3, enable_sun=False)),
    ]:
        settings = AppSettings(current_scene=Scenes[scene_name],
                               sqrt_num_samples=100, **kw)
        t0 = time.time()
        sess = RenderSession(settings=settings, width=width, height=height)
        dt = timed_frame(sess)
        results[label] = dt
        print(f"{label:12s} {dt*1e3:9.1f} ms/frame "
              f"(setup+compile {time.time()-t0-dt*3:.0f}s)", flush=True)
        del sess

    if "L3" in results and "L2" in results and "L1" in results:
        print(f"\ndelta L2-L1 (bounce1 closest + its NEE): "
              f"{(results['L2']-results['L1'])*1e3:.1f} ms")
        print(f"delta L3-L2 (bounce2 closest + its NEE): "
              f"{(results['L3']-results['L2'])*1e3:.1f} ms")
    if "L3 sun off" in results:
        print(f"delta L3 - sun-off (all sun NEE traversals): "
              f"{(results['L3']-results['L3 sun off'])*1e3:.1f} ms")


if __name__ == "__main__":
    main()
