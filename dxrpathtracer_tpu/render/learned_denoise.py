"""Learned lightmap denoiser — the neural OIDN-class option.

The reference bridges to Intel Open Image Denoise's pretrained RTLightmap
CNN (OidnDenoiser.cpp:39-94: GPU readback -> CPU oidn filter -> re-upload,
with a FlushGPU stall, DXRPathTracer.cpp:2559-2609). That library does not
exist on TPU, so this module IS the equivalent: a compact residual CNN over
the same inputs OIDN's RTLightmap consumes (HDR irradiance + albedo +
normal auxiliary features), trained on pairs of low-spp / converged bakes
rendered by THIS framework (tools/train_denoiser.py), running entirely on
device — no host round trip, no pipeline stall.

Design notes (TPU-first):
  - NHWC 3x3 convolutions with dyadic dilations (1,2,4,2,1): XLA lowers
    them onto the MXU as implicit GEMMs; the dilation ladder buys a ~29px
    receptive field from 5 layers — the reach the a-trous filter gets from
    its dyadic taps, but with learned, feature-conditioned weights.
  - The net predicts a RESIDUAL in log1p space ON TOP OF the guided
    joint-bilateral output (render/denoise.py): at init (zero final layer)
    the output equals the guided filter exactly, so training starts from
    the strongest classical baseline and can only be asked to improve it —
    the measured alternative (residual on the raw noisy input) trained to
    slightly WORSE than the guided filter (PERF_NOTES.md round 3).
  - Isolated fireflies are despiked first with the same selective median
    the guided bilateral uses (render/denoise.py): an impulse 8x over the
    local median is sample noise, not structure, and nets trained on
    finite data handle them badly.
  - Large maps (the 4096^2 bake, DXRPathTracer.cpp:111) are processed in
    overlapping tiles so peak activation memory stays bounded.

Weights ship in dxrpathtracer_tpu/data/denoiser_weights.npz (see the
training log in PERF_NOTES.md). `learned_denoise` loads them lazily; pass
`params` explicitly to use freshly trained weights.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, dilation) per hidden layer; every kernel is 3x3.
ARCH = ((32, 1), (48, 2), (48, 4), (32, 2), (16, 1))
# log1p(noisy) 3 + log1p(guided) 3 + albedo 3 + normal 3 + valid 1
IN_CHANNELS = 13
OUT_CHANNELS = 3   # residual in log1p space, added to log1p(guided)

_WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "denoiser_weights.npz")
_cached_params = None


def init_params(key):
    """He-normal initialized parameter pytree: [(w, b), ...] NHWC convs."""
    params = []
    cin = IN_CHANNELS
    for cout, _dil in ARCH:
        key, sub = jax.random.split(key)
        w = (jax.random.normal(sub, (3, 3, cin, cout), jnp.float32)
             * np.sqrt(2.0 / (9 * cin)))
        params.append((w, jnp.zeros((cout,), jnp.float32)))
        cin = cout
    key, sub = jax.random.split(key)
    # final layer starts at zero -> the net starts as the identity
    params.append((jnp.zeros((3, 3, cin, OUT_CHANNELS), jnp.float32),
                   jnp.zeros((OUT_CHANNELS,), jnp.float32)))
    return params


def _conv(x, w, b, dilation):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def apply_net(params, features):
    """(N, H, W, IN_CHANNELS) features -> (N, H, W, 3) log-space residual."""
    x = features
    for (w, b), (_c, dil) in zip(params[:-1], ARCH):
        x = jax.nn.relu(_conv(x, w, b, dil))
    w, b = params[-1]
    return _conv(x, w, b, 1)


def make_features(img, albedo, normal, valid):
    """Stack the OIDN-RTLightmap input set: log1p noisy HDR, log1p of the
    GUIDED joint-bilateral output (the baseline the residual refines),
    albedo + normal guides, coverage. img/albedo/normal (H, W, 3);
    valid (H, W) or None. Returns (features, log1p(guided))."""
    from .denoise import guided_bilateral_denoise
    h, w = img.shape[:2]
    log_in = jnp.log1p(jnp.maximum(img, 0.0))
    guided = guided_bilateral_denoise(img, albedo, normal, valid=valid)
    log_g = jnp.log1p(jnp.maximum(guided, 0.0))
    v = (jnp.ones((h, w, 1), jnp.float32) if valid is None
         else valid.astype(jnp.float32)[..., None])
    return jnp.concatenate([log_in, log_g, albedo, normal, v], axis=-1), log_g


def denoise_with_params(params, img, albedo, normal, valid=None):
    """Single-shot (untiled) denoise; see `learned_denoise` for the API."""
    feat, log_g = make_features(img, albedo, normal, valid)
    res = apply_net(params, feat[None])[0]
    out = jnp.expm1(jnp.maximum(log_g + res, 0.0))
    if valid is not None:
        out = jnp.where(valid[..., None], out, img)
    return out


# receptive field: net 2 * sum(dilations) + 2 = 22 px, plus the guided
# bilateral's a-trous reach 2 * (1+2+4+8) = 30 px and its 3x3 despike;
# 64 of overlap covers the combined 53 px (identity-at-init tiles are
# exact by construction — the residual is zero everywhere).
_TILE = 512
_OVERLAP = 64


def _despike(img):
    """Selective firefly removal shared with the guided bilateral
    (render/denoise.py): replace texels whose luminance exceeds 8x the
    local 3x3 median by that median."""
    from .denoise import _LUMA, median_filter_3x3
    med = median_filter_3x3(img)
    luma = jnp.asarray(_LUMA)
    lum_img = jnp.einsum("hwc,c->hw", jnp.maximum(img, 0.0), luma)
    lum_med = jnp.einsum("hwc,c->hw", jnp.maximum(med, 0.0), luma)
    return jnp.where((lum_img > 8.0 * (lum_med + 1e-4))[..., None], med, img)


def load_params(path=None):
    """Load the shipped (or an explicit) weight file into the pytree."""
    global _cached_params
    if path is None:
        if _cached_params is not None:
            return _cached_params
        path = _WEIGHTS_PATH
    with np.load(path) as z:
        n = int(z["num_layers"])
        params = [(jnp.asarray(z[f"w{i}"]), jnp.asarray(z[f"b{i}"]))
                  for i in range(n)]
    if params[0][0].shape[2] != IN_CHANNELS:
        raise ValueError(
            f"denoiser weights at {path} expect {params[0][0].shape[2]} input "
            f"channels but this build uses {IN_CHANNELS} — retrain with "
            f"tools/train_denoiser.py")
    if path == _WEIGHTS_PATH:
        _cached_params = params
    return params


def save_params(params, path):
    arrs = {"num_layers": np.int32(len(params))}
    for i, (w, b) in enumerate(params):
        arrs[f"w{i}"] = np.asarray(w)
        arrs[f"b{i}"] = np.asarray(b)
    np.savez_compressed(path, **arrs)


def learned_denoise(img, albedo, normal, valid=None, params=None,
                    tile=_TILE, overlap=_OVERLAP):
    """Denoise an HDR lightmap with the trained CNN.

    img: (H, W, 3) noisy irradiance; albedo/normal: (H, W, 3) surface maps
    (bake/surface_map.py); valid: (H, W) coverage mask. Maps larger than
    `tile` are processed in overlapping tiles (interior crops stitched
    back) so the 4096^2 bake fits in HBM.
    """
    if params is None:
        params = load_params()
    img = _despike(jnp.asarray(img))
    h, w = img.shape[:2]
    if max(h, w) <= tile:
        return denoise_with_params(params, img, jnp.asarray(albedo),
                                   jnp.asarray(normal),
                                   None if valid is None
                                   else jnp.asarray(valid))

    albedo = jnp.asarray(albedo)
    normal = jnp.asarray(normal)
    vmask = None if valid is None else jnp.asarray(valid)
    overlap = min(overlap, (tile - 1) // 2)  # keep the stride positive
    step = tile - 2 * overlap
    out = jnp.zeros_like(img)
    for y0 in range(0, h, step):
        for x0 in range(0, w, step):
            ty0 = max(y0 - overlap, 0)
            tx0 = max(x0 - overlap, 0)
            ty1 = min(y0 + step + overlap, h)
            tx1 = min(x0 + step + overlap, w)
            sub = denoise_with_params(
                params, img[ty0:ty1, tx0:tx1],
                albedo[ty0:ty1, tx0:tx1], normal[ty0:ty1, tx0:tx1],
                None if vmask is None else vmask[ty0:ty1, tx0:tx1])
            iy0, ix0 = y0 - ty0, x0 - tx0
            iy1 = iy0 + min(step, h - y0)
            ix1 = ix0 + min(step, w - x0)
            out = out.at[y0:y0 + (iy1 - iy0),
                         x0:x0 + (ix1 - ix0)].set(sub[iy0:iy1, ix0:ix1])
    if vmask is not None:
        out = jnp.where(vmask[..., None], out, img)
    return out
