"""Post-processing: bloom + filmic tone mapping, fused in XLA.

Parity with DXRPathTracer/PostProcessing.hlsl:18-127 and PostProcessor.cpp:43-92:
  bloom  — 2x2 average downscale to half res (GatherRed/Green/Blue average),
           then 2 iterations of separable Gaussian blur with taps i in [-7, 7)
           and *unnormalized* weights (Blur(..., nrmlize=false))
  tonemap— color + bilinear-upscaled bloom * BloomMagnitude * exp2(BloomExposure),
           exposure exp2(Exposure)/FP16Scale, then HP Duiker filmic ALU curve
           (output is sRGB-encoded by the curve itself)

Everything is jittable elementwise/conv work — XLA fuses the whole chain into a
couple of kernels; no temp render-target pool needed (PostProcessHelper.cpp
becomes a no-op concept on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import FP16Scale


def _gaussian_weights(sigma):
    """CalcGaussianWeight for taps -7..6 (PostProcessing.hlsl:19-23,33-52)."""
    i = np.arange(-7, 7, dtype=np.float32)
    g = 1.0 / np.sqrt(2.0 * 3.14159 * sigma * sigma)
    return (g * np.exp(-(i * i) / (2.0 * sigma * sigma))).astype(np.float32)


def _blur_1d(img, weights, axis):
    """Unnormalized 14-tap blur with clamp addressing along `axis`."""
    out = jnp.zeros_like(img)
    size = img.shape[axis]
    idx = jnp.arange(size)
    for k, off in enumerate(range(-7, 7)):
        shifted = jnp.take(img, jnp.clip(idx + off, 0, size - 1), axis=axis)
        out = out + shifted * weights[k]
    return out


def bloom_pass(color, bloom_blur_sigma: float):
    """(H, W, 3) radiance -> (H/2, W/2, 3) blurred bloom source."""
    h, w = color.shape[:2]
    half = color[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
    weights = jnp.asarray(_gaussian_weights(float(bloom_blur_sigma)))
    for _ in range(2):
        half = _blur_1d(half, weights, axis=1)  # horizontal
        half = _blur_1d(half, weights, axis=0)  # vertical
    return half


def tone_map_filmic_alu(color):
    """HP Duiker film-stock curve approximation (PostProcessing.hlsl:55-60).
    The curve bakes in sRGB encoding."""
    color = jnp.maximum(0.0, color - 0.004)
    return ((color * (6.2 * color + 0.5))
            / (color * (6.2 * color + 1.7) + 0.06))


def _upscale_bilinear_2x(img, out_h, out_w):
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bilinear")


def post_process(color, exposure: float, bloom_exposure: float,
                 bloom_magnitude: float, bloom_blur_sigma: float,
                 enable_bloom: bool = True):
    """Full chain (PostProcessor::Render): returns display-ready sRGB in [0, 1]."""
    h, w = color.shape[:2]
    out = color
    if enable_bloom and h >= 2 and w >= 2:
        bloom = bloom_pass(color, bloom_blur_sigma)
        bloom_up = _upscale_bilinear_2x(bloom, h, w)
        out = out + bloom_up * bloom_magnitude * (2.0 ** bloom_exposure)
    out = out * ((2.0 ** exposure) / FP16Scale)
    return tone_map_filmic_alu(out)


def resolve_weighted(samples, exposure: float):
    """Firefly-resistant MSAA-style resolve (Resolve.hlsl:33-65): inverse-
    luminance-weighted average over the sample axis (leading axis)."""
    exposure_w = (2.0 ** (exposure + 2.0)) / FP16Scale
    s = jnp.maximum(samples, 0.0)
    lum = (s[..., 0] * 0.299 + s[..., 1] * 0.587 + s[..., 2] * 0.114) * exposure_w
    wgt = 1.0 / (1.0 + lum)
    summed = jnp.sum(s * wgt[..., None], axis=0)
    total = jnp.maximum(jnp.sum(wgt, axis=0), 1e-5)
    return jnp.maximum(summed / total[..., None], 0.0)
