"""Train the learned lightmap denoiser (render/learned_denoise.py).

The reference ships Intel OIDN's pretrained RTLightmap CNN
(OidnDenoiser.cpp:39-94); there is no pretrained lightmap denoiser for this
stack, so this script trains one FROM THIS FRAMEWORK'S OWN RENDERER: it
bakes (noisy low-spp, converged) lightmap pairs plus albedo/normal surface
maps for a set of scenes, then optimizes the residual CNN with Adam on a
masked log-space L1 loss. Runs end-to-end on the TPU (bakes + training) —
the MXU trains the net that later denoises on the same chip.

Usage:
  python tools/train_denoiser.py \
      --scenes BoxTest,Stronghold --resolution 192 \
      --noisy-spp 1,2,4 --ref-spp 96 --steps 3000 \
      --out dxrpathtracer_tpu/data/denoiser_weights.npz

The shipped weights' provenance is recorded in PERF_NOTES.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bake_dataset(scene_name, resolution, noisy_spps, ref_spp):
    """Returns (list[(noisy, ref, albedo, normal, valid)]) for one scene."""
    import jax.numpy as jnp  # noqa: F401  (device init before session)
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.bake.baker import Baker

    settings = AppSettings(current_scene=Scenes[scene_name],
                           sqrt_num_samples=16)
    sess = RenderSession(settings=settings, width=8, height=8)
    baker = Baker(sess, resolution=resolution)
    snaps = {}
    t0 = time.time()
    for i in range(ref_spp):
        baker.bake_step()
        if (i + 1) in noisy_spps:
            snaps[i + 1] = np.asarray(baker.lightmap())
        if (i + 1) % 16 == 0:
            print(f"  {scene_name}: sample {i + 1}/{ref_spp} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    ref = np.asarray(baker.lightmap())
    valid = np.asarray(baker.accum[..., 3] > 0.0)
    if not valid.any():
        print(f"  WARNING: {scene_name} bake produced ZERO valid texels — "
              f"pairs will be unusable (investigate before training)",
              file=sys.stderr)
    albedo = np.asarray(baker.surface_maps["albedo"])
    normal = np.asarray(baker.surface_maps["normal"])
    return [(snaps[s], ref, albedo, normal, valid) for s in sorted(snaps)]


def make_patches(pairs, patch, count, rng):
    """Random flipped/rotated crops with enough bake coverage.
    Returns (feat (N,P,P,10), log_ref (N,P,P,3), mask (N,P,P,1)) arrays."""
    import jax.numpy as jnp
    from dxrpathtracer_tpu.render.learned_denoise import (_despike,
                                                          make_features)

    feats, refs, masks = [], [], []
    # despike once per source image (inference applies the same prefilter)
    prepped = []
    for noisy, ref, albedo, normal, valid in pairs:
        dsp = np.asarray(_despike(jnp.asarray(noisy)))
        feat, _ = make_features(jnp.asarray(dsp), jnp.asarray(albedo),
                                jnp.asarray(normal), jnp.asarray(valid))
        prepped.append((np.asarray(feat), ref, valid))

    tries = 0
    while len(feats) < count and tries < count * 20:
        tries += 1
        feat, ref, valid = prepped[rng.integers(len(prepped))]
        h, w = valid.shape
        y = rng.integers(0, h - patch + 1)
        x = rng.integers(0, w - patch + 1)
        v = valid[y:y + patch, x:x + patch]
        if v.mean() < 0.3:
            continue
        f = feat[y:y + patch, x:x + patch]
        r = np.log1p(np.maximum(ref[y:y + patch, x:x + patch], 0.0))
        k = rng.integers(4)
        f, r, v = (np.rot90(a, k) for a in (f, r, v))
        if rng.integers(2):
            f, r, v = (a[:, ::-1] for a in (f, r, v))
        feats.append(np.ascontiguousarray(f))
        refs.append(np.ascontiguousarray(r))
        masks.append(np.ascontiguousarray(v[..., None].astype(np.float32)))
    return (np.stack(feats), np.stack(refs), np.stack(masks))


def train(feats, refs, masks, steps, batch, lr, seed, log_every=200):
    import jax
    import jax.numpy as jnp
    import optax
    from dxrpathtracer_tpu.render.learned_denoise import (apply_net,
                                                          init_params)

    params = init_params(jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def loss_fn(p, f, r, m):
        res = apply_net(p, f)
        # channels 3:6 are log1p(guided) — the baseline the residual refines
        out = jnp.maximum(f[..., 3:6] + res, 0.0)  # log-space prediction
        return jnp.sum(jnp.abs(out - r) * m) / (jnp.sum(m) * 3.0 + 1e-6)

    @jax.jit
    def step(p, s, f, r, m):
        loss, grads = jax.value_and_grad(loss_fn)(p, f, r, m)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    n = feats.shape[0]
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for i in range(steps):
        idx = rng.integers(0, n, batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(feats[idx]),
            jnp.asarray(refs[idx]), jnp.asarray(masks[idx]))
        if (i + 1) % log_every == 0 or i == 0:
            print(f"  step {i + 1}/{steps} loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    return params


def evaluate(params, pairs):
    """Held-in eval: log-RMSE vs converged for noisy / guided / learned."""
    import jax.numpy as jnp
    from dxrpathtracer_tpu.render.denoise import guided_bilateral_denoise
    from dxrpathtracer_tpu.render.learned_denoise import learned_denoise

    def log_rmse(a, b, m):
        d = (np.log1p(np.maximum(a, 0)) - np.log1p(np.maximum(b, 0)))[m]
        return float(np.sqrt(np.mean(d * d)))

    for noisy, ref, albedo, normal, valid in pairs:
        if not valid.any():
            print("  eval: SKIPPED pair with empty valid mask", file=sys.stderr)
            continue
        base = log_rmse(noisy, ref, valid)
        gui = log_rmse(np.asarray(guided_bilateral_denoise(
            jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
            valid=jnp.asarray(valid))), ref, valid)
        lrn = log_rmse(np.asarray(learned_denoise(
            noisy, albedo, normal, valid=jnp.asarray(valid),
            params=params)), ref, valid)
        print(f"  eval: noisy {base:.4f}  guided {gui:.4f}  "
              f"learned {lrn:.4f}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="BoxTest,Stronghold")
    ap.add_argument("--resolution", type=int, default=192)
    ap.add_argument("--noisy-spp", default="1,2,4")
    ap.add_argument("--ref-spp", type=int, default=96)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--patches", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset-cache", default=None,
                    help="npz path: reuse baked pairs if present")
    ap.add_argument("--out", default="dxrpathtracer_tpu/data/denoiser_weights.npz")
    args = ap.parse_args()

    noisy_spps = [int(s) for s in args.noisy_spp.split(",")]
    pairs = []
    if args.dataset_cache and os.path.exists(args.dataset_cache):
        with np.load(args.dataset_cache) as z:
            n = int(z["count"])
            pairs = [tuple(z[f"{k}{i}"] for k in
                           ("noisy", "ref", "albedo", "normal", "valid"))
                     for i in range(n)]
        print(f"# reusing {n} baked pairs from {args.dataset_cache}",
              file=sys.stderr)
    else:
        for scene in args.scenes.split(","):
            print(f"# baking {scene} @{args.resolution} "
                  f"(ref {args.ref_spp} spp)", file=sys.stderr)
            pairs += bake_dataset(scene, args.resolution, noisy_spps,
                                  args.ref_spp)
        if args.dataset_cache:
            arrs = {"count": np.int32(len(pairs))}
            for i, tup in enumerate(pairs):
                for k, a in zip(("noisy", "ref", "albedo", "normal", "valid"),
                                tup):
                    arrs[f"{k}{i}"] = a
            np.savez_compressed(args.dataset_cache, **arrs)

    rng = np.random.default_rng(args.seed)
    feats, refs, masks = make_patches(pairs, args.patch, args.patches, rng)
    print(f"# {feats.shape[0]} patches of {args.patch}^2", file=sys.stderr)

    params = train(feats, refs, masks, args.steps, args.batch, args.lr,
                   args.seed)
    from dxrpathtracer_tpu.render.learned_denoise import save_params
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(params, args.out)
    print(f"# wrote {args.out}", file=sys.stderr)
    evaluate(params, pairs)


if __name__ == "__main__":
    main()
