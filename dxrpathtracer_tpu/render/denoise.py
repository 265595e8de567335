"""Denoisers for the progressive render / lightmap bake.

median_filter_3x3 — parity with DenoiseMedian.hlsl:52-103 ("GPU Median
Denoise"): per texel, collect the 3x3 clamped neighborhood, order by Rec.601
luminance with a *stable* sort (the HLSL uses insertion sort), output the
median (index 4). The reference dispatches 8x8 thread groups; here the whole
image is one fused XLA elementwise program (VPU-bound, no kernel needed).

atrous_denoise — an edge-avoiding À-trous wavelet smoother [Dammertz et al.
2010] with luminance-guided range weights.

guided_bilateral_denoise — the OIDN-bridge replacement (OidnDenoiser.cpp:
39-94 wraps Intel Open Image Denoise's RTLightmap HDR filter; that library
doesn't exist on TPU): a joint-bilateral filter guided by the bake's OWN
surface maps (albedo + normal G-buffer, bake/surface_map.py — the same
auxiliary features OIDN's RTLightmap consumes). Geometry-aware guidance
means lighting discontinuities that coincide with surface changes are kept
while same-surface Monte-Carlo noise is averaged hard; measured on the
4-spp BoxTest bake it beats both the median filter and the unguided
à-trous on RMSE-vs-converged (tests/test_denoise_eval.py). Runs entirely
on device — no GPU->CPU->GPU round trip (the reference stalls the whole
GPU to read the lightmap back for OIDN, DXRPathTracer.cpp:2559-2609).
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


def guided_bilateral_denoise(img, albedo, normal, valid=None,
                             iterations: int = 4, sigma_l: float = 0.5,
                             sigma_n: float = 32.0, sigma_a: float = 16.0):
    """Surface-map-guided joint-bilateral denoise of an HDR lightmap.

    img: (H, W, 3) noisy irradiance; albedo/normal: (H, W, 3) surface maps
    (bake/surface_map.py); valid: (H, W) coverage mask. À-trous dyadic
    dilation like atrous_denoise, but the range term is driven by the
    GUIDES: normals (cos^sigma_n-like falloff keeps geometric edges),
    albedo (material borders), and only weakly by luminance (sigma_l small
    so noise is averaged instead of preserved — the exact failure mode of
    the unguided filter on low-spp bakes).
    """
    h, w = img.shape[:2]
    k1d = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    taps = [(i, j) for i in range(-2, 3) for j in range(-2, 3)]

    # Selective despike first: a bilateral treats an isolated firefly as a
    # luminance edge and PRESERVES it (measured: RMSE barely moved on a
    # 3-spp bake while the median crushed it). A FULL median prefilter
    # would fix that but adds its own edge bias everywhere; instead only
    # texels whose luminance exceeds 8x the local median are replaced by
    # the median value — impulses die, structure is untouched.
    med = median_filter_3x3(img)
    luma = jnp.asarray(_LUMA)
    lum_img = jnp.einsum("hwc,c->hw", jnp.maximum(img, 0.0), luma)
    lum_med = jnp.einsum("hwc,c->hw", jnp.maximum(med, 0.0), luma)
    spike = lum_img > 8.0 * (lum_med + 1e-4)
    out = jnp.where(spike[..., None], med, img)
    vmask = (jnp.ones((h, w), jnp.float32) if valid is None
             else valid.astype(jnp.float32))
    yy = jnp.arange(h)
    xx = jnp.arange(w)

    def shift(a, ys, xs):
        return jnp.take(jnp.take(a, ys, axis=0), xs, axis=1)

    for it in range(iterations):
        step = 1 << it
        lum = jnp.log1p(jnp.einsum("hwc,c->hw", jnp.maximum(out, 0.0),
                                   jnp.asarray(_LUMA)))
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((h, w), jnp.float32)
        for dy, dx in taps:
            ys = jnp.clip(yy + dy * step, 0, h - 1)
            xs = jnp.clip(xx + dx * step, 0, w - 1)
            sample = shift(out, ys, xs)
            slum = shift(lum, ys, xs)
            snrm = shift(normal, ys, xs)
            salb = shift(albedo, ys, xs)
            svalid = shift(vmask, ys, xs)
            wk = k1d[dy + 2] * k1d[dx + 2]
            w_l = jnp.exp(-jnp.square(slum - lum) * sigma_l)
            n_dot = jnp.sum(snrm * normal, axis=-1)
            w_n = jnp.exp(-(1.0 - jnp.clip(n_dot, 0.0, 1.0)) * sigma_n)
            da = jnp.sum(jnp.square(salb - albedo), axis=-1)
            w_a = jnp.exp(-da * sigma_a)
            wgt = wk * w_l * w_n * w_a * svalid
            acc = acc + sample * wgt[..., None]
            wacc = wacc + wgt
        filled = acc / jnp.maximum(wacc, 1e-8)[..., None]
        out = jnp.where((wacc > 1e-8)[..., None], filled, out)
    return out
