#!/usr/bin/env python3
"""Generate a committed held-out denoiser eval pair set for one scene.

VERDICT r4 #8: the learned denoiser (render/learned_denoise.py — the OIDN
RTLightmap replacement, OidnDenoiser.cpp:39-94) was trained on BoxTest +
Stronghold bakes; its held-out eval covered only a BoxTest config. This
tool bakes a third scene family on the device (noisy snapshots at the
requested spp values + a converged reference) and saves the pairs as an
npz that tests/test_denoise_eval.py evaluates on every run — CPU-cheap at
test time, honest device bakes at generation time.

    python tools/make_denoise_eval.py --scene SunTemple --resolution 192 \
        --noisy-spp 1,2,4 --ref-spp 96 \
        --out tests/data/denoise_eval_suntemple_192.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="SunTemple")
    ap.add_argument("--resolution", type=int, default=192)
    ap.add_argument("--noisy-spp", default="1,2,4")
    ap.add_argument("--ref-spp", type=int, default=96)
    ap.add_argument("--out",
                    default="tests/data/denoise_eval_suntemple_192.npz")
    args = ap.parse_args()

    from tools.train_denoiser import bake_dataset
    noisy_spps = [int(s) for s in args.noisy_spp.split(",")]
    pairs = bake_dataset(args.scene, args.resolution, noisy_spps,
                         args.ref_spp)
    arrs = {"count": np.int32(len(pairs)),
            "spps": np.asarray(noisy_spps, np.int32),
            "scene": np.bytes_(args.scene)}
    for i, tup in enumerate(pairs):
        for k, a in zip(("noisy", "ref", "albedo", "normal", "valid"), tup):
            arrs[f"{k}{i}"] = a.astype(np.float16) if k in (
                "noisy", "ref", "albedo", "normal") else a
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **arrs)
    size = os.path.getsize(args.out) / 1e6
    print(f"{args.out}: {len(pairs)} pairs @{args.resolution} "
          f"({size:.1f} MB)")


if __name__ == "__main__":
    main()
