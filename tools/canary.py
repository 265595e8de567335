#!/usr/bin/env python3
"""Canary harness for stack-blocked winners (VERDICT round-3, next-round #7).

Several measured-better designs are disabled because the CURRENT axon/Mosaic
stack miscompiles, faults, or rejects them (PERF_NOTES.md "re-test when the
stack updates"). This tool re-runs each blocked variant as an isolated
subprocess probe and records whether the block still reproduces:

  split_gather     round-2 miscompile: 4 sub-gathers + concat inside a
                   while body silently returned misses for lanes >= 128 at
                   n <= ~576 (correct eager; ~1.3x faster when it works)
  component_major  transposed record consumption in the while body measured
                   2.7x/step in XLA but FAULTS the device
  sunspace_4096    a 4096^2 sun-grid index crashes the axon remote-compile
                   (HTTP 413 request-size limit); 512^2 ships instead
  laxmap_8_tiles   lax.map over >= 8 large ray tiles intermittently faults
                   the device (session slab dispatch exists because of this)
  lane_band        the 36864-lane traversal dispatch was silently degenerate
                   on Sponza-class tables (accel/traverse.py quarantine)

Each probe prints PASS (block is gone AT THE PROBE'S SHAPES — run the
matching full gate sweep before flipping any default: round 5 proved a
lane_band PASS can coexist with same-night sweep failures at other
population points, and a split_gather PASS-AND-FASTER with an e2e bench
regression) or BLOCKED (status quo). Wrong-result probes compare against an in-probe reference.

Run on the TPU: `python tools/canary.py [--probes a,b]`. Results append to
artifacts/canary.json with the jax/libtpu versions, so the history shows
WHEN a stack update unblocked something.

Timed-negative alternates (packet unrolls, MXU walk/drain, Pallas body,
history reuse, staged dispatch) are NOT probed here — they run and are
simply slower; re-measure them with tools/ab_*.py when the canaries move.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = r"""
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args):
    fn(*args)  # compile
    t0 = time.time()
    for _ in range(3):
        out = fn(*args)
    # block via tiny readback (block_until_ready unreliable on the tunnel)
    jax.tree_util.tree_leaves(out)[0].ravel()[0:1].block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.time() - t0) / 3
"""

PROBES = {}


def probe(name):
    def deco(fn):
        PROBES[name] = fn
        return fn
    return deco


@probe("split_gather")
def _split_gather():
    return _COMMON.format(repo=REPO) + r"""
# Dependent-gather while loop; variant B splits the 128-wide row gather into
# 4 independent 32-wide sub-gathers + concat (the round-2 latency-overlap
# design that miscompiled: lanes >= 128 all-miss for n <= ~576).
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((36570, 128)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, 36570, 36570).astype(np.int32))

def walk(gather):
    def body(s):
        row, acc, it = s
        rec = gather(row)
        acc = acc + rec[:, 7]
        row = jnp.take(nxt, row) ^ (it & 1)
        return row, acc, it + 1
    def run(row0):
        out = jax.lax.while_loop(lambda s: s[2] < 40, body,
                                 (row0, jnp.zeros_like(row0, jnp.float32),
                                  jnp.int32(0)))
        return out[1]
    return jax.jit(run)

g_single = walk(lambda r: jnp.take(table, r, axis=0))

def split(r):
    parts = [jnp.take(table[:, 32 * k:32 * (k + 1)], r, axis=0)
             for k in range(4)]
    return jnp.concatenate(parts, axis=1)

g_split = walk(split)

ok = True
for n in (256, 512, 576, 1024, 131072):
    row0 = jnp.asarray(rng.integers(0, 36570, n).astype(np.int32))
    a = np.asarray(g_single(row0))
    b = np.asarray(g_split(row0))
    bad = int((a != b).sum())
    print(f"n={n}: mismatches {bad}")
    ok &= bad == 0
if ok:
    t_a = timed(g_single, jnp.asarray(rng.integers(0, 36570, 131072).astype(np.int32)))
    t_b = timed(g_split, jnp.asarray(rng.integers(0, 36570, 131072).astype(np.int32)))
    print(f"timing single {t_a*1e3:.2f} ms vs split {t_b*1e3:.2f} ms")
    print("RESULT: PASS" + (" AND FASTER" if t_b < t_a * 0.95 else ""))
else:
    print("RESULT: BLOCKED (wrong results persist)")
"""


@probe("component_major")
def _component_major():
    return _COMMON.format(repo=REPO) + r"""
# Component-major (transposed) record consumption inside the while body:
# measured 2.7x faster per step when it worked, but faults the device.
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((36570, 128)).astype(np.float32))
nxt = jnp.asarray(rng.integers(0, 36570, 36570).astype(np.int32))

def body(s):
    row, acc, it = s
    rec = jnp.take(table, row, axis=0)          # (m, 128)
    rec_t = rec.T                                # (128, m) transposed use
    acc = acc + rec_t[7] + rec_t[19] * rec_t[33]
    row = jnp.take(nxt, row) ^ (it & 1)
    return row, acc, it + 1

@jax.jit
def run(row0):
    out = jax.lax.while_loop(lambda s: s[2] < 40, body,
                             (row0, jnp.zeros_like(row0, jnp.float32),
                              jnp.int32(0)))
    return out[1]

row0 = jnp.asarray(rng.integers(0, 36570, 131072).astype(np.int32))
t = timed(run, row0)
print(f"transposed-body walk: {t*1e3:.2f} ms (no fault)")
print("RESULT: PASS")
"""


@probe("sunspace_4096")
def _sunspace_4096():
    return _COMMON.format(repo=REPO) + r"""
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.app.settings import Scenes
from dxrpathtracer_tpu.accel.sunspace import build_sun_grid_for_scene, sun_any_hit
scene, preset = load_scene(Scenes.Sponza)
pos = np.asarray(scene.positions)
tri = np.asarray(scene.tri_idx)
sun = np.asarray(preset.sun_direction, np.float32)
sun /= np.linalg.norm(sun)
grid = build_sun_grid_for_scene(scene, sun, positions=pos, tri_idx=tri,
                                grid_size=4096)
n = 8192
rng = np.random.default_rng(0)
t_id = rng.integers(0, len(tri), n)
a = pos[tri[t_id, 0]]
o = jnp.asarray(a + 0.05)
d = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
vis = sun_any_hit(grid, o, d, jnp.full((n,), 1e-4, jnp.float32),
                  jnp.full((n,), 3e38, jnp.float32),
                  jnp.ones((n,), bool))
print("4096^2 sun grid compiled+ran, vis mean", float(np.asarray(vis).mean()))
print("RESULT: PASS")
"""


@probe("laxmap_8_tiles")
def _laxmap():
    return _COMMON.format(repo=REPO) + r"""
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((36570, 128)).astype(np.float32))

def tile_fn(args):
    row, x = args
    rec = jnp.take(table, row, axis=0)
    return (rec * x[:, None]).sum(1)

@jax.jit
def run(rows, xs):
    return jax.lax.map(tile_fn, (rows, xs))

rows = jnp.asarray(rng.integers(0, 36570, (8, 131072)).astype(np.int32))
xs = jnp.asarray(rng.standard_normal((8, 131072)).astype(np.float32))
out = run(rows, xs)
print("8-tile lax.map ok, mean", float(np.asarray(out).mean()))
print("RESULT: PASS")
"""


@probe("lane_band")
def _lane_band():
    return _COMMON.format(repo=REPO) + r"""
import os
os.environ["DXRPT_NO_LANE_PAD"] = "1"
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.app.settings import Scenes
from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.traverse import closest_hit
scene, preset = load_scene(Scenes.Sponza)
pos = np.asarray(scene.positions)
tri = np.asarray(scene.tri_idx)
bvh = build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]], width=32)
from tools.sweep_lane_bands import make_rays
o, d = make_rays({"positions": pos, "tri_idx": tri}, 131072, "render",
                 preset=preset)
o = jnp.asarray(o); d = jnp.asarray(d)
tmin = jnp.full((131072,), 1e-4, jnp.float32)
tmax = jnp.full((131072,), 1e4, jnp.float32)
ref = closest_hit(bvh, o, d, tmin, tmax)
ok = True
for n in (36864, 65536, 98304):
    r = closest_hit(bvh, o[:n], d[:n], tmin[:n], tmax[:n])
    bad = int((np.asarray(r.tri_id) != np.asarray(ref.tri_id)[:n]).sum())
    print(f"n={n}: mismatches {bad}")
    ok &= bad == 0
print("RESULT: " + ("PASS (band clean on this table — re-run "
                    "tools/sweep_lane_bands.py to shrink the quarantine)"
                    if ok else "BLOCKED (band persists)"))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default=",".join(PROBES))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    import jax
    results = {"date": time.strftime("%Y-%m-%d %H:%M"),
               "jax": jax.__version__,
               "backend": jax.default_backend(), "probes": {}}
    for name in args.probes.split(","):
        code = PROBES[name]()
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code], text=True,
                               capture_output=True, timeout=args.timeout,
                               cwd=REPO)
            tail = (r.stdout + r.stderr).strip().splitlines()
            verdict = next((ln for ln in reversed(tail)
                            if ln.startswith("RESULT:")), None)
            if r.returncode != 0:
                status = "BLOCKED (fault/crash)"
            elif verdict and "PASS" in verdict:
                status = verdict[len("RESULT: "):]
            else:
                status = "BLOCKED"
            detail = "\n".join(tail[-8:])
        except subprocess.TimeoutExpired:
            status = "BLOCKED (timeout/hang)"
            detail = ""
        results["probes"][name] = {"status": status, "sec": round(time.time() - t0, 1),
                                   "detail": detail}
        print(f"[{name}] {status} ({results['probes'][name]['sec']}s)", flush=True)

    path = os.path.join(REPO, "artifacts", "canary.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(results)
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
