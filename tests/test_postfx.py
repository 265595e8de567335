"""Post-processing parity tests (PostProcessing.hlsl / Resolve.hlsl)."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.core.constants import FP16Scale
from dxrpathtracer_tpu.render import postfx


def test_filmic_alu_scalar():
    # Direct scalar evaluation of the Duiker curve (PostProcessing.hlsl:55-60)
    for c in (0.0, 0.004, 0.18, 1.0, 4.0):
        x = max(0.0, c - 0.004)
        expect = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
        got = float(postfx.tone_map_filmic_alu(jnp.asarray([c]))[0])
        assert abs(got - expect) < 1e-6
    # Monotone, bounded in [0, ~1)
    xs = jnp.linspace(0.0, 100.0, 256)
    ys = np.asarray(postfx.tone_map_filmic_alu(xs))
    assert (np.diff(ys) >= -1e-7).all()
    assert ys.max() <= 1.0 + 1e-6


def test_post_process_exposure():
    img = jnp.full((4, 4, 3), FP16Scale, jnp.float32)  # 1.0 in physical units
    out = np.asarray(postfx.post_process(img, exposure=0.0, bloom_exposure=-10.0,
                                         bloom_magnitude=0.0, bloom_blur_sigma=2.5,
                                         enable_bloom=False))
    x = 1.0 - 0.004
    expect = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    assert np.allclose(out, expect, atol=1e-5)


def test_bloom_spreads_energy():
    img = jnp.zeros((32, 32, 3), jnp.float32).at[16, 16].set(1000.0 * FP16Scale)
    with_bloom = np.asarray(postfx.post_process(
        img, exposure=-2.0, bloom_exposure=0.0, bloom_magnitude=1.0,
        bloom_blur_sigma=2.5))
    without = np.asarray(postfx.post_process(
        img, exposure=-2.0, bloom_exposure=0.0, bloom_magnitude=1.0,
        bloom_blur_sigma=2.5, enable_bloom=False))
    # Bloom adds energy away from the bright pixel
    assert with_bloom[10, 16].sum() > without[10, 16].sum()


def test_resolve_weighted_downweights_fireflies():
    samples = jnp.asarray(np.stack([
        np.full((2, 2, 3), 1.0, np.float32) * FP16Scale,
        np.full((2, 2, 3), 1.0, np.float32) * FP16Scale,
        np.full((2, 2, 3), 1e6, np.float32) * FP16Scale,  # firefly sample
    ]))
    out = np.asarray(postfx.resolve_weighted(samples, exposure=0.0))
    naive = float(np.asarray(samples).mean())
    assert out.mean() < naive * 0.01  # firefly strongly suppressed


def test_gaussian_weights_match_hlsl():
    sigma = 2.5
    w = postfx._gaussian_weights(sigma)
    assert w.shape == (14,)
    for k, i in enumerate(range(-7, 7)):
        g = 1.0 / np.sqrt(2.0 * 3.14159 * sigma * sigma)
        assert abs(w[k] - g * np.exp(-(i * i) / (2 * sigma * sigma))) < 1e-7
