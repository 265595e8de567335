#!/usr/bin/env python3
"""A/B: session row-slab size at a given resolution (DXRPT_MAX_SLAB_RAYS).

The session splits frames into row slabs of <= MAX_SLAB_RAYS rays (default
4*131072) because round-1 measured device faults on programs with >~4 large
internal ray tiles. Each slab dispatch re-pays the traversal while_loops'
fixed per-iteration cost, so fewer/larger slabs could win ~5-10% at 1080p —
IF the larger programs still compile and run correctly on the axon stack
(they are also candidates for the remote-compile HTTP 413 limit and the
round-9 lane-count quarantine, both handled inside accel/).

In-process interleaved timing (cross-process drift is +-25%; only
interleaved A/Bs are trustworthy on the tunnel), correctness-checked
against the default-slab image.

Usage: python tools/ab_slab_size.py [WIDTH HEIGHT] [SLAB_RAYS ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_session(width, height, slab_rays):
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    os.environ["DXRPT_MAX_SLAB_RAYS"] = str(slab_rays)
    settings = AppSettings(current_scene=Scenes.Sponza, benchmark_mode=True,
                           max_path_length=3)
    return RenderSession(settings=settings, width=width, height=height)


def time_frames(sess, frames=2):
    t0 = time.time()
    for _ in range(frames):
        frame = sess.frame_constants(sess.sample_idx)
        sess._accum_slabs = sess._step(sess.scene, sess.bvh,
                                       sess._accum_slabs, sess._sky_cube_dev,
                                       frame, sess.settings)
        sess.sample_idx += 1
    float(sess._accum_slabs[-1][0, 0, 0])  # tiny-readback sync
    return (time.time() - t0) / frames


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    sizes = ([int(a) for a in sys.argv[3:]]
             or [4 * 131072, 8 * 131072, 2073600])

    sessions = {}
    base = 4 * 131072
    if base not in sizes:
        sizes.insert(0, base)
    for sz in sizes:
        t0 = time.time()
        try:
            sess = make_session(width, height, sz)
            dt = time_frames(sess, frames=1)  # compile + first frame
            sessions[sz] = sess
            print(f"# slab={sz}: {len(sess._accum_slabs)} slabs of "
                  f"{sess._slab_h} rows, compile+first {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"# slab={sz}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # correctness: every variant's 1-sample image must match the base
    if base in sessions:
        ref = None
        for sz, sess in sessions.items():
            img = np.concatenate([np.asarray(s) for s in sess._accum_slabs],
                                 axis=0)
            assert np.isfinite(img).all(), f"slab={sz}: non-finite"
            if sz == base:
                ref = img
        for sz, sess in sessions.items():
            if sz == base or ref is None:
                continue
            img = np.concatenate([np.asarray(s) for s in sess._accum_slabs],
                                 axis=0)
            err = float(np.max(np.abs(img - ref)))
            print(f"# slab={sz}: max|diff| vs base = {err:.3e}", flush=True)

    # interleaved best-of-3 x 2 frames
    best = {sz: float("inf") for sz in sessions}
    for trial in range(3):
        for sz, sess in sessions.items():
            best[sz] = min(best[sz], time_frames(sess, frames=2))
    for sz in sorted(best):
        print(f"slab={sz:>8}: {best[sz]*1e3:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
