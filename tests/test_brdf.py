"""BRDF math parity tests (BRDF.hlsl:16-261)."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.core import brdf


def test_fresnel_limits():
    spec = jnp.asarray([[0.04, 0.04, 0.04]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # Normal incidence: F = F0
    f0 = np.asarray(brdf.fresnel(spec, n, n))
    assert np.allclose(f0, 0.04, atol=1e-6)
    # Grazing: F -> 1
    graze = jnp.asarray([[1.0, 0.0, 0.001]])
    graze = graze / jnp.linalg.norm(graze)
    fg = np.asarray(brdf.fresnel(spec, n, graze))
    assert (fg > 0.95).all()
    # Low-albedo fade: spec < 0.1% albedo kills fresnel entirely
    tiny = jnp.asarray([[0.0005, 0.0005, 0.0005]])
    ft = np.asarray(brdf.fresnel(tiny, n, graze))
    assert (ft <= 0.5).all()  # 333 * 3 * 0.0005 = 0.4995 scale


def test_ggx_specular_symmetry_and_peak():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    m = 0.3
    # Peak at l == reflect direction == n for normal view
    s_peak = float(brdf.ggx_specular(m, n, n, v, v)[0])
    l_off = jnp.asarray([[0.3, 0.0, 0.954]])
    l_off = l_off / jnp.linalg.norm(l_off)
    h_off = (v + l_off) / jnp.linalg.norm(v + l_off)
    s_off = float(brdf.ggx_specular(m, n, h_off, v, l_off)[0])
    assert s_peak > s_off > 0.0
    # v <-> l reciprocity
    s1 = float(brdf.ggx_specular(m, n, h_off, v, l_off)[0])
    s2 = float(brdf.ggx_specular(m, n, h_off, l_off, v)[0])
    assert abs(s1 - s2) < 1e-5


def test_smith_g2_le_g1():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    rng = np.random.default_rng(0)
    for _ in range(20):
        l = rng.normal(size=3)
        l[2] = abs(l[2])
        l /= np.linalg.norm(l)
        v = rng.normal(size=3)
        v[2] = abs(v[2])
        v /= np.linalg.norm(v)
        lj = jnp.asarray([l], dtype=jnp.float32)
        vj = jnp.asarray([v], dtype=jnp.float32)
        a2 = 0.25
        g1 = float(brdf.smith_ggx_masking(n, lj, vj, a2)[0])
        g2 = float(brdf.smith_ggx_masking_shadowing(n, lj, vj, a2)[0])
        assert g2 <= g1 + 1e-5
        assert 0.0 <= g2 and g1 <= 2.0


def test_env_brdf_scale_bias_ranges():
    ndv = jnp.linspace(0.01, 1.0, 64)
    for sr in (0.05, 0.3, 0.7, 1.0):
        scale, bias = brdf.ggx_environment_brdf_scale_bias(ndv, sr)
        s = np.asarray(scale)
        b = np.asarray(bias)
        assert (s >= 0).all() and (s <= 1).all()
        assert (b >= 0).all() and (b <= 1).all()


def test_calc_lighting_scalar_reference():
    """CalcLighting vs direct scalar evaluation of BRDF.hlsl:241-261."""
    normal = np.array([0.0, 0.0, 1.0], np.float32)
    light = np.array([0.3, 0.1, 0.94], np.float32)
    light /= np.linalg.norm(light)
    pos = np.array([1.0, 2.0, 0.0], np.float32)
    campos = np.array([1.0, 1.0, 5.0], np.float32)
    diff = np.array([0.5, 0.4, 0.3], np.float32)
    spec = np.array([0.04, 0.04, 0.04], np.float32)
    irr = np.array([3.0, 2.5, 2.0], np.float32)
    rough = 0.2

    got = np.asarray(brdf.calc_lighting(
        jnp.asarray(normal[None]), jnp.asarray(light[None]), jnp.asarray(irr[None]),
        jnp.asarray(diff[None]), jnp.asarray(spec[None]), rough,
        jnp.asarray(pos[None]), jnp.asarray(campos[None]),
        jnp.ones((1, 3), jnp.float32)))[0]

    # scalar re-derivation
    lighting = diff / 3.14159
    view = campos - pos
    view /= np.linalg.norm(view)
    ndl = max(float(normal @ light), 0.0)
    h = view + light
    h /= np.linalg.norm(h)
    ldh = max(float(light @ h), 0.0)
    fres = (spec + (1 - spec) * (1 - ldh) ** 5) * min(float(spec @ (np.ones(3) * 333)), 1.0)
    ndh = max(float(normal @ h), 0.0)
    ndv = max(float(normal @ view), 0.0)
    m2 = rough * rough
    x = ndh * ndh * (m2 - 1) + 1
    d = m2 / (np.pi * x * x)
    vis = (1 / (ndl + np.sqrt(m2 + (1 - m2) * ndl * ndl))) * \
          (1 / (ndv + np.sqrt(m2 + (1 - m2) * ndv * ndv)))
    expect = (lighting + d * vis * fres) * ndl * irr
    assert np.allclose(got, expect, rtol=1e-4)
