"""Denoisers for the progressive render / lightmap bake.

median_filter_3x3 — parity with DenoiseMedian.hlsl:52-103 ("GPU Median
Denoise"): per texel, collect the 3x3 clamped neighborhood, order by Rec.601
luminance with a *stable* sort (the HLSL uses insertion sort), output the
median (index 4). The reference dispatches 8x8 thread groups; here the whole
image is one fused XLA elementwise program (VPU-bound, no kernel needed).

atrous_denoise — the OIDN-bridge replacement (OidnDenoiser.cpp:39-94 wraps
Intel Open Image Denoise's RTLightmap HDR filter; that library doesn't exist
on TPU). An edge-avoiding À-trous wavelet smoother [Dammertz et al. 2010]
with luminance-guided range weights: runs entirely on device, no
GPU->CPU->GPU round trip (the reference stalls the whole GPU to read the
lightmap back for OIDN, DXRPathTracer.cpp:2559-2609).
"""

import jax.numpy as jnp
import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def median_filter_3x3(img):
    """(H, W, 3) -> (H, W, 3) luminance-median of the 3x3 neighborhood."""
    h, w = img.shape[:2]
    yy = jnp.arange(h)
    xx = jnp.arange(w)

    stack = []
    for dy in (-1, 0, 1):
        ys = jnp.clip(yy + dy, 0, h - 1)
        row = jnp.take(img, ys, axis=0)
        for dx in (-1, 0, 1):
            xs = jnp.clip(xx + dx, 0, w - 1)
            stack.append(jnp.take(row, xs, axis=1))
    neigh = jnp.stack(stack, axis=0)  # (9, H, W, 3)

    lum = jnp.einsum("nhwc,c->nhw", neigh, jnp.asarray(_LUMA))
    order = jnp.argsort(lum, axis=0, stable=True)  # insertion sort is stable
    med_idx = order[4]  # (H, W)
    return jnp.take_along_axis(neigh, med_idx[None, ..., None], axis=0)[0]


def atrous_denoise(img, iterations: int = 4, sigma_l: float = 4.0,
                   valid=None):
    """Edge-avoiding À-trous wavelet denoise of an HDR (H, W, 3) image.

    iterations: number of dyadic-dilation passes (radius grows 1,2,4,8...).
    sigma_l: luminance range sigma (relative, in log-luminance space).
    valid: optional (H, W) mask of texels that hold data (bake coverage);
           invalid texels have zero weight and get in-filled.
    """
    h, w = img.shape[:2]
    # B3-spline 5-tap kernel
    k1d = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    taps = [(i, j) for i in range(-2, 3) for j in range(-2, 3)]

    out = img
    lum0 = jnp.log1p(jnp.einsum("hwc,c->hw", jnp.maximum(out, 0.0), jnp.asarray(_LUMA)))
    vmask = jnp.ones((h, w), jnp.float32) if valid is None else valid.astype(jnp.float32)

    yy = jnp.arange(h)
    xx = jnp.arange(w)
    for it in range(iterations):
        step = 1 << it
        lum = jnp.log1p(jnp.einsum("hwc,c->hw", jnp.maximum(out, 0.0), jnp.asarray(_LUMA)))
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((h, w), jnp.float32)
        for dy, dx in taps:
            ys = jnp.clip(yy + dy * step, 0, h - 1)
            xs = jnp.clip(xx + dx * step, 0, w - 1)
            sample = jnp.take(jnp.take(out, ys, axis=0), xs, axis=1)
            slum = jnp.take(jnp.take(lum, ys, axis=0), xs, axis=1)
            svalid = jnp.take(jnp.take(vmask, ys, axis=0), xs, axis=1)
            wk = k1d[dy + 2] * k1d[dx + 2]
            range_w = jnp.exp(-jnp.square(slum - lum) * sigma_l)
            wgt = wk * range_w * svalid
            acc = acc + sample * wgt[..., None]
            wacc = wacc + wgt
        filled = acc / jnp.maximum(wacc, 1e-8)[..., None]
        # Texels with no valid support keep their value (later passes reach them)
        out = jnp.where((wacc > 1e-8)[..., None], filled, out)
    return out
