"""Batched 3-vector / matrix helpers.

All vectors are arrays shaped (..., 3), float32. Matrices follow the reference's
DirectXMath row-vector convention (SampleFramework12 SF12_Math.h): points/dirs are
row vectors transformed as ``v @ M``, and composition reads left-to-right
(world -> view -> proj == ``view @ proj`` applied after).
"""

import jax.numpy as jnp


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps=0.0):
    l = jnp.sqrt(jnp.maximum(dot3(v, v, keepdims=True), eps))
    return v / l


def safe_normalize(v):
    """Normalize; zero vectors map to zero (no NaN)."""
    l2 = dot3(v, v, keepdims=True)
    inv = jnp.where(l2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-37)), 0.0)
    return v * inv


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def reflect(i, n):
    """HLSL reflect: i - 2*dot(i,n)*n (i points toward the surface)."""
    return i - 2.0 * dot3(i, n, keepdims=True) * n


def smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def transform_point(p, m):
    """Row-vector transform of (..., 3) points by (4, 4) matrix, with w-divide.

    Written as mul/add, not matmul: JAX's default matmul precision (bfloat16 on
    TPU) is far too coarse for projective transforms.
    """
    out = (p[..., 0:1] * m[0] + p[..., 1:2] * m[1] + p[..., 2:3] * m[2] + m[3])
    return out[..., :3] / out[..., 3:4]


def transform_h(p_h, m):
    """Row-vector transform of (..., 4) homogeneous points; no divide."""
    return (p_h[..., 0:1] * m[0] + p_h[..., 1:2] * m[1]
            + p_h[..., 2:3] * m[2] + p_h[..., 3:4] * m[3])


def transform_dir(d, m):
    """Row-vector transform of (..., 3) directions (no translation)."""
    return (d[..., 0:1] * m[0, :3] + d[..., 1:2] * m[1, :3] + d[..., 2:3] * m[2, :3])


def luminance(rgb):
    """Rec.709 luma as used by the reference resolve/denoise shaders."""
    return dot(rgb, jnp.asarray([0.299, 0.587, 0.114], rgb.dtype))


def orthonormal_basis(n):
    """Build a tangent frame around normal n (branchless Frisvad-style)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1)
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt
