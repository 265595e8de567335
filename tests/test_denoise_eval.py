"""Denoiser evaluation harness (VERDICT r2 item 7): a fixed noisy low-spp
bake, RMSE against the converged bake, for median / a-trous / the
surface-map-guided joint bilateral. The guided filter must win — it is the
OIDN-class replacement (OidnDenoiser.cpp:39-94 intent)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
from dxrpathtracer_tpu.bake.baker import Baker
from dxrpathtracer_tpu.render.denoise import (atrous_denoise,
                                              guided_bilateral_denoise,
                                              median_filter_3x3)


@pytest.fixture(scope="module")
def bakes():
    settings = AppSettings(current_scene=Scenes.BoxTest, sqrt_num_samples=16)
    sess = RenderSession(settings=settings, width=32, height=32)
    baker = Baker(sess, resolution=64)
    noisy = None
    for i in range(48):
        baker.bake_step()
        if i == 2:  # 3-spp snapshot = the noisy input
            noisy = np.asarray(baker.lightmap())
    converged = np.asarray(baker.lightmap())
    valid = np.asarray(baker.accum[..., 3] > 0.0)
    albedo = np.asarray(baker.surface_maps["albedo"])
    normal = np.asarray(baker.surface_maps["normal"])
    return noisy, converged, valid, albedo, normal


def _rmse(a, b, mask):
    """log1p-space RMSE: the right HDR metric — in linear space a single
    rare-path firefly in the 64-spp REFERENCE itself (measured: one texel
    at 1018 vs p99 17.5) dominates every method's score identically."""
    la = np.log1p(np.maximum(a, 0.0))
    lb = np.log1p(np.maximum(b, 0.0))
    d = (la - lb)[mask]
    return float(np.sqrt(np.mean(d * d)))


def test_guided_beats_median_and_atrous(bakes):
    noisy, converged, valid, albedo, normal = bakes
    base = _rmse(noisy, converged, valid)
    med = _rmse(np.asarray(median_filter_3x3(jnp.asarray(noisy))),
                converged, valid)
    atr = _rmse(np.asarray(atrous_denoise(jnp.asarray(noisy),
                                          valid=jnp.asarray(valid))),
                converged, valid)
    gui = _rmse(np.asarray(guided_bilateral_denoise(
        jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
        valid=jnp.asarray(valid))), converged, valid)
    print(f"\nRMSE vs converged: noisy {base:.4f} median {med:.4f} "
          f"atrous {atr:.4f} guided {gui:.4f}")
    assert gui < base, "guided filter must improve on the raw bake"
    assert gui < med, "guided filter must beat the median filter"
    assert gui < atr, "guided filter must beat the unguided a-trous"


def test_guided_preserves_geometry_edges():
    """Synthetic bleed test: two flat regions with different normals and
    different constant irradiance + noise; after filtering, each region's
    mean must stay put (no cross-surface bleeding through the normal
    guide)."""
    rng = np.random.default_rng(0)
    h = w = 64
    img = np.zeros((h, w, 3), np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    albedo = np.full((h, w, 3), 0.5, np.float32)
    img[:, : w // 2] = 1.0
    img[:, w // 2:] = 5.0
    normal[:, : w // 2] = (0, 0, 1)
    normal[:, w // 2:] = (1, 0, 0)
    img += rng.normal(0, 0.2, img.shape).astype(np.float32)
    out = np.asarray(guided_bilateral_denoise(
        jnp.asarray(img), jnp.asarray(albedo), jnp.asarray(normal)))
    left = out[:, : w // 2 - 4].mean()
    right = out[:, w // 2 + 4:].mean()
    assert abs(left - 1.0) < 0.1, left
    assert abs(right - 5.0) < 0.1, right
    # and noise within each region must shrink
    assert out[:, : w // 2 - 4].std() < img[:, : w // 2 - 4].std() * 0.5


_WEIGHTS = __import__("os").path.join(
    __import__("os").path.dirname(__import__(
        "dxrpathtracer_tpu.render.learned_denoise",
        fromlist=["x"]).__file__).replace("render", "data"),
    "denoiser_weights.npz")


@pytest.mark.skipif(not __import__("os").path.exists(_WEIGHTS),
                    reason="shipped denoiser weights not present")
def test_learned_beats_guided(bakes):
    """The trained CNN (render/learned_denoise.py — the OIDN RTLightmap
    equivalent) must beat the guided bilateral on the eval bake."""
    from dxrpathtracer_tpu.render.learned_denoise import learned_denoise
    noisy, converged, valid, albedo, normal = bakes
    gui = _rmse(np.asarray(guided_bilateral_denoise(
        jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
        valid=jnp.asarray(valid))), converged, valid)
    lrn = _rmse(np.asarray(learned_denoise(
        noisy, albedo, normal, valid=jnp.asarray(valid))), converged, valid)
    print(f"\nlog-RMSE: guided {gui:.4f} learned {lrn:.4f}")
    assert lrn < gui, (lrn, gui)


def test_learned_identity_at_init_and_tiling():
    """Architecture invariants that hold without trained weights: at init
    (zero final layer) the net's output equals the GUIDED bilateral output
    exactly — training starts from the strongest classical baseline — and
    tiled inference matches the single-shot path."""
    import jax
    from dxrpathtracer_tpu.render.denoise import guided_bilateral_denoise
    from dxrpathtracer_tpu.render.learned_denoise import (
        denoise_with_params, init_params, learned_denoise)
    p = init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = np.abs(rng.normal(1.0, 0.5, (192, 192, 3))).astype(np.float32)
    alb = np.full_like(img, 0.5)
    nrm = np.zeros_like(img)
    nrm[..., 2] = 1.0
    valid = np.ones(img.shape[:2], bool)
    out = np.asarray(denoise_with_params(p, jnp.asarray(img),
                                         jnp.asarray(alb), jnp.asarray(nrm),
                                         jnp.asarray(valid)))
    guided = np.asarray(guided_bilateral_denoise(
        jnp.asarray(img), jnp.asarray(alb), jnp.asarray(nrm),
        valid=jnp.asarray(valid)))
    # expm1(log1p(guided)) costs ~1 ulp; the residual itself is exactly 0
    assert np.abs(out - guided).max() < 1e-5
    # tiled == full when the overlap covers the combined receptive field
    # (net 22 px + guided a-trous 30 px + despike 1 px = 53): each interior
    # texel then sees identical context in its tile.
    full = np.asarray(learned_denoise(img, alb, nrm, valid=jnp.asarray(valid),
                                      params=p, tile=4096))
    tiled = np.asarray(learned_denoise(img, alb, nrm, valid=jnp.asarray(valid),
                                       params=p, tile=160, overlap=56))
    assert np.abs(full - tiled).max() < 1e-5


_SUNTEMPLE_NPZ = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "data",
    "denoise_eval_suntemple_192.npz")


@pytest.mark.skipif(not __import__("os").path.exists(_SUNTEMPLE_NPZ),
                    reason="SunTemple eval pairs not generated "
                           "(tools/make_denoise_eval.py)")
def test_held_out_suntemple_family():
    """Third scene family for the denoiser eval (VERDICT r4 #8): committed
    device-baked SunTemple pairs at 192 (1/2/4 spp vs 96-spp reference,
    tools/make_denoise_eval.py). The guided bilateral must improve on the
    raw bake at every spp; the learned net (trained on BoxTest+Stronghold
    only — SunTemple is fully held out) must beat the guided filter, the
    same bar the in-family eval sets."""
    from dxrpathtracer_tpu.render.learned_denoise import learned_denoise
    with np.load(_SUNTEMPLE_NPZ) as z:
        n = int(z["count"])
        spps = [int(s) for s in z["spps"]]
        rows = []
        for i in range(n):
            noisy = z[f"noisy{i}"].astype(np.float32)
            ref = z[f"ref{i}"].astype(np.float32)
            albedo = z[f"albedo{i}"].astype(np.float32)
            normal = z[f"normal{i}"].astype(np.float32)
            valid = z[f"valid{i}"].astype(bool)
            base = _rmse(noisy, ref, valid)
            gui = _rmse(np.asarray(guided_bilateral_denoise(
                jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
                valid=jnp.asarray(valid))), ref, valid)
            lrn = _rmse(np.asarray(learned_denoise(
                noisy, albedo, normal, valid=jnp.asarray(valid))), ref, valid)
            rows.append((spps[i], base, gui, lrn))
    print("\nSunTemple held-out log-RMSE (spp / noisy / guided / learned):")
    for spp, base, gui, lrn in rows:
        print(f"  {spp} spp: {base:.4f} / {gui:.4f} / {lrn:.4f}")
    for spp, base, gui, lrn in rows:
        assert gui < base, (spp, gui, base)
        assert lrn < gui, (spp, lrn, gui)
