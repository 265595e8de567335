"""Monte-Carlo direction sampling, vectorized.

Behavioral parity with SampleFramework12/v1.02/Shaders/Sampling.hlsl:20-280 (and its
CPU mirror Graphics/Sampling.cpp): concentric disk mapping, cosine hemisphere,
GGX visible-normal (VNDF) sampling, sphere/hemisphere/cone sampling, and matching
PDFs. All functions operate on batched float32 arrays; branches become masked
selects so one call covers a whole ray wavefront.
"""

import jax.numpy as jnp

from .constants import Pi
from .math3 import saturate


def square_to_concentric_disk(x, y):
    """Shirley-Chiu low-distortion square->disk map (Sampling.hlsl:72-114)."""
    a = 2.0 * x - 1.0
    b = 2.0 * y - 1.0

    def safe_div(p, q):
        return p / jnp.where(q == 0.0, 1.0, q)

    r1 = a
    phi1 = (Pi / 4.0) * safe_div(b, a)
    r2 = b
    phi2 = (Pi / 4.0) * (2.0 - safe_div(a, b))
    r3 = -a
    phi3 = (Pi / 4.0) * (4.0 + safe_div(b, a))
    r4 = -b
    phi4 = jnp.where(b != 0.0, (Pi / 4.0) * (6.0 - safe_div(a, b)), 0.0)

    region12 = a > -b
    r = jnp.where(region12,
                  jnp.where(a > b, r1, r2),
                  jnp.where(a < b, r3, r4))
    phi = jnp.where(region12,
                    jnp.where(a > b, phi1, phi2),
                    jnp.where(a < b, phi3, phi4))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere around +z via concentric disk (Sampling.hlsl:181-196)."""
    uv = square_to_concentric_disk(u1, u2)
    u = uv[..., 0]
    v = uv[..., 1]
    r = u * u + v * v
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r))
    return jnp.stack([u, v, z], axis=-1)


def sample_ggx_visible_normal(wo, ax, ay, u1, u2):
    """GGX VNDF sampling [Heitz17] (Sampling.hlsl:131-154).

    wo: (..., 3) outgoing dir in tangent space (+z up); returns microfacet normal.
    """
    # Stretch the view vector so we sample as though roughness == 1
    v = jnp.stack([wo[..., 0] * ax, wo[..., 1] * ay, wo[..., 2]], axis=-1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # Orthonormal basis around v
    vz = v[..., 2]
    # t1 = normalize(cross(v, z)) when v.z < 0.999 else (1,0,0)
    cross_vz = jnp.stack([v[..., 1], -v[..., 0], jnp.zeros_like(vz)], axis=-1)
    cl = jnp.linalg.norm(cross_vz, axis=-1, keepdims=True)
    t1 = jnp.where((vz < 0.999)[..., None],
                   cross_vz / jnp.where(cl == 0.0, 1.0, cl),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], v.dtype), v.shape))
    t2 = jnp.cross(t1, v)

    # Half-disk-weighted point
    a = 1.0 / (1.0 + vz)
    r = jnp.sqrt(u1)
    lower = u2 < a
    phi = jnp.where(lower, (u2 / a) * Pi, Pi + (u2 - a) / (1.0 - a) * Pi)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(lower, 1.0, vz)

    n = (p1[..., None] * t1 + p2[..., None] * t2
         + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * v)

    # Unstretch
    n = jnp.stack([ax * n[..., 0], ay * n[..., 1], jnp.maximum(0.0, n[..., 2])], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def sample_direction_sphere(u1, u2):
    """Uniform sphere (Sampling.hlsl:157-166)."""
    z = u1 * 2.0 - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * Pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_direction_hemisphere(u1, u2):
    """Uniform hemisphere around +z (Sampling.hlsl:169-178)."""
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * Pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_direction_cone(u1, u2, cos_theta_max):
    """Uniform cone around +z (Sampling.hlsl:199-205)."""
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    phi = u2 * 2.0 * Pi
    return jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1)


def pdf_cosine_hemisphere(cos_theta):
    return cos_theta / Pi


def pdf_cosine_hemisphere_dir(normal, sample_dir):
    return saturate(jnp.sum(normal * sample_dir, axis=-1)) / Pi


def pdf_hemisphere():
    return 1.0 / (Pi * 2.0)


def pdf_sphere():
    return 1.0 / (Pi * 4.0)


def pdf_cone(cos_theta_max):
    return 1.0 / (2.0 * Pi * (1.0 - cos_theta_max))


def pdf_ggx(n, h, v, roughness):
    """SampleDirectionGGX_PDF (Sampling.hlsl:233-242)."""
    n_dot_h = saturate(jnp.sum(n * h, axis=-1))
    h_dot_v = saturate(jnp.sum(h * v, axis=-1))
    m2 = roughness * roughness
    x = n_dot_h * n_dot_h * (m2 - 1.0) + 1.0
    d = m2 / (Pi * x * x)
    return d * n_dot_h / (4.0 * h_dot_v)
