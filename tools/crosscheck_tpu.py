#!/usr/bin/env python3
"""TPU-vs-CPU render crosscheck: the miscompile detector.

The axon TPU stack has produced SILENTLY WRONG traversal results from
specific while_loop body shapes (e.g. a split-gather+concat that made every
lane >= 128 miss for N <= ~576 while N = 1024 was correct — found 2026-08-16
via the WhiteFurnace scene). CPU-only CI cannot catch that class of bug, so
this tool renders small frames of each scene on BOTH backends in separate
subprocesses and compares them. Run it after any traversal/integrator change
that will ship to TPU.

Usage: python tools/crosscheck_tpu.py [--scenes BoxTest,WhiteFurnace,Sponza]
Exit code 0 = all scenes match within tolerance.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, json, os
sys.path.insert(0, {repo!r})
import jax
if {cpu!r} == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # The CPU run is the CORRECTNESS REFERENCE: never let it execute
    # persistent-cache XLA:CPU AOT entries (foreign-host entries load with
    # only an error log but can run with silently wrong numerics — the
    # round-3 "+prefer-no-scatter" loads; same policy as tests/conftest.py).
    os.environ["DXRPT_NO_COMPILATION_CACHE"] = "1"
import numpy as np
from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
scene = preset = None
name = {scene!r}
if name == "SponzaAlpha":
    # alpha-tested configuration (real BC4 opacity, K-candidate path)
    from dxrpathtracer_tpu.scene.registry import sponza_alpha_standin
    scene, preset = sponza_alpha_standin(num_cards=96)
    name = "Sponza"
sess = RenderSession(
    settings=AppSettings(current_scene=getattr(Scenes, name),
                         sqrt_num_samples=2),
    width={w}, height={h}, scene=scene, preset=preset)
img = np.asarray(sess.render_to_completion())
np.save({out!r}, img)
print(json.dumps({{"platform": jax.devices()[0].platform,
                   "mean": float(img.mean())}}))
"""

# Bake-path variant: the render crosscheck alone MISSED a real wrong-result
# class (2026-08-18: Stronghold@192 bake produced ZERO valid texels on TPU
# while CPU gave 0.68 — per-scene x per-shape, jit-only). Bakes route rays
# through the same traversal but at different lane counts and with the
# TBN/CMJ/firefly program around them, so they need their own check.
_CHILD_BAKE = r"""
import sys, json, os
sys.path.insert(0, {repo!r})
import jax
if {cpu!r} == "cpu":
    jax.config.update("jax_platforms", "cpu")
    os.environ["DXRPT_NO_COMPILATION_CACHE"] = "1"  # see _CHILD
import numpy as np
from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
from dxrpathtracer_tpu.bake.baker import Baker
sess = RenderSession(
    settings=AppSettings(current_scene=getattr(Scenes, {scene!r}),
                         sqrt_num_samples=4),
    width=8, height=8)
baker = Baker(sess, resolution={res})
for _ in range(2):
    baker.bake_step()
acc = np.asarray(baker.accum)
np.save({out!r}, acc)
print(json.dumps({{"platform": jax.devices()[0].platform,
                   "mean": float(acc.mean()),
                   "valid_frac": float((acc[..., 3] > 0).mean())}}))
"""


def render(scene, platform, w, h, out, bake_res=None):
    tpl = _CHILD if bake_res is None else _CHILD_BAKE
    code = tpl.format(repo=REPO, cpu=platform, scene=scene, w=w, h=h,
                      out=out, res=bake_res)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(f"{scene}/{platform} failed:\n{r.stderr[-2000:]}")
    info = json.loads(r.stdout.strip().splitlines()[-1])
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="BoxTest,WhiteFurnace",
                    help="comma list; Sponza is slow (LBVH build ~1 min)")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--bake", type=int, default=0, metavar="RES",
                    help="crosscheck the BAKE path at this lightmap "
                         "resolution instead of the render path (e.g. 128)")
    args = ap.parse_args()

    import numpy as np

    bake_res = args.bake or None
    ok = True
    for scene in args.scenes.split(","):
        with tempfile.TemporaryDirectory() as td:
            f_tpu = os.path.join(td, "tpu.npy")
            f_cpu = os.path.join(td, "cpu.npy")
            i_tpu = render(scene, "tpu", args.width, args.height, f_tpu,
                           bake_res=bake_res)
            i_cpu = render(scene, "cpu", args.width, args.height, f_cpu,
                           bake_res=bake_res)
            a, b = np.load(f_tpu), np.load(f_cpu)
            rmse = float(np.sqrt(np.mean((a - b) ** 2)))
            rel = float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))
            line = (f"{scene}: tpu[{i_tpu['platform']}] mean {i_tpu['mean']:.4f}"
                    f" vs cpu[{i_cpu['platform']}] mean {i_cpu['mean']:.4f}"
                    f"  rmse {rmse:.2e} relmax {rel:.2e}")
            if bake_res:
                line += (f"  valid tpu {i_tpu['valid_frac']:.3f}"
                         f" cpu {i_cpu['valid_frac']:.3f}")
            # Fusion-order ULPs only; anything visible is a miscompile.
            if bake_res:
                # accum holds HDR irradiance SUMS (magnitude ~ spp x tens):
                # normalize the rmse by the reference magnitude.
                good = (rmse / (np.abs(b).max() + 1e-9) < 1e-3 and rel < 1e-2
                        and abs(i_tpu["valid_frac"] - i_cpu["valid_frac"]) < 0.02)
            else:
                good = rmse < 1e-3 and rel < 1e-2
            print(("OK   " if good else "FAIL ") + line)
            ok &= good
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
