"""Distribution tests for the sampling library (Sampling.hlsl parity)."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.core import sampling


def _grid(n):
    u = (np.arange(n, dtype=np.float32) + 0.5) / n
    u1, u2 = np.meshgrid(u, u, indexing="ij")
    return jnp.asarray(u1.reshape(-1)), jnp.asarray(u2.reshape(-1))


def test_concentric_disk_in_unit_disk():
    u1, u2 = _grid(32)
    d = np.asarray(sampling.square_to_concentric_disk(u1, u2))
    r = np.linalg.norm(d, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Area preservation: mean radius^2 of uniform disk samples is 1/2
    assert abs((r ** 2).mean() - 0.5) < 0.01
    # Determinism + corner cases
    corner = np.asarray(sampling.square_to_concentric_disk(
        jnp.asarray([0.5, 0.0, 1.0]), jnp.asarray([0.5, 0.0, 1.0])))
    assert np.isfinite(corner).all()


def test_cosine_hemisphere_moments():
    u1, u2 = _grid(64)
    d = np.asarray(sampling.sample_cosine_hemisphere(u1, u2))
    assert (d[:, 2] >= 0).all()
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # For pdf = cos/pi: E[cos theta] = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_sphere_and_hemisphere():
    u1, u2 = _grid(64)
    s = np.asarray(sampling.sample_direction_sphere(u1, u2))
    assert np.allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-5)
    assert abs(s.mean(axis=0)).max() < 0.02
    h = np.asarray(sampling.sample_direction_hemisphere(u1, u2))
    assert (h[:, 2] >= 0).all()
    assert abs(h[:, 2].mean() - 0.5) < 0.01


def test_cone_within_angle():
    u1, u2 = _grid(32)
    cos_max = np.cos(0.3)
    c = np.asarray(sampling.sample_direction_cone(u1, u2, cos_max))
    assert (c[:, 2] >= cos_max - 1e-6).all()
    assert np.allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-5)


def test_ggx_vndf_properties():
    u1, u2 = _grid(48)
    n = u1.shape[0]
    # A fixed grazing-ish view direction
    wo = jnp.broadcast_to(jnp.asarray([0.45, 0.2, 0.87]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    for rough in (0.1, 0.5, 1.0):
        m = np.asarray(sampling.sample_ggx_visible_normal(
            wo, rough, rough, u1, u2))
        assert np.allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-4)
        assert (m[:, 2] >= 0).all()
        # visible normals: dot(wo, m) >= 0
        assert (np.sum(np.asarray(wo) * m, axis=-1) >= -1e-5).all()


def test_ggx_vndf_reflection_energy():
    """E[G2/G1] over VNDF samples must equal the directional albedo of
    single-scattering height-correlated GGX (the quantity the white-furnace
    test visualizes, RayTrace.hlsl:353-356) — verified against an independent
    uniform-hemisphere integral of D*G2/(4 ndv ndl) * ndl computed in numpy."""
    from dxrpathtracer_tpu.core import brdf
    u1, u2 = _grid(64)
    n = u1.shape[0]
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    n_ts = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))

    def independent_albedo(alpha, n_mc=200000):
        rng = np.random.default_rng(0)
        z = rng.uniform(0, 1, n_mc)
        r = np.sqrt(1 - z * z)
        phi = rng.uniform(0, 2 * np.pi, n_mc)
        l = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
        a2 = alpha * alpha
        h = l + np.array([0, 0, 1.0])
        h /= np.linalg.norm(h, axis=-1, keepdims=True)
        ndh, ndl = h[:, 2], l[:, 2]
        x = ndh * ndh * (a2 - 1) + 1
        d = a2 / (np.pi * x * x)
        g2 = 2 * ndl / (np.sqrt(a2 + (1 - a2) * ndl * ndl) + ndl)
        return (d * g2 / 4.0).mean() * 2 * np.pi

    prev = 1.1
    for rough in (0.1, 0.5, 1.0):
        m = sampling.sample_ggx_visible_normal(wo, rough, rough, u1, u2)
        li = -wo + 2.0 * jnp.sum(wo * m, -1, keepdims=True) * m
        a2 = rough * rough  # reference passes alpha^2 (RayTrace.hlsl:353)
        g1 = brdf.smith_ggx_masking(n_ts, li, wo, a2)
        g2 = brdf.smith_ggx_masking_shadowing(n_ts, li, wo, a2)
        e = float(np.asarray(g2 / jnp.where(g1 == 0, 1.0, g1)).mean())
        expect = independent_albedo(rough)
        assert abs(e - expect) / expect < 0.02, (rough, e, expect)
        assert e < prev + 1e-6  # energy decreases with roughness
        prev = e


def test_pdfs():
    assert abs(sampling.pdf_hemisphere() - 1 / (2 * np.pi)) < 1e-9
    assert abs(sampling.pdf_sphere() - 1 / (4 * np.pi)) < 1e-9
    assert abs(float(sampling.pdf_cosine_hemisphere(1.0)) - 1 / np.pi) < 1e-6
