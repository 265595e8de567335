"""Correlated multi-jittered sampling [Kensler 2013], bit-exact with the reference.

Behavioral parity with the reference HLSL sampler
(SampleFramework12/v1.02/Shaders/Sampling.hlsl:282-331) and its CPU mirror
(Graphics/Sampling.cpp:383-437): identical hash recurrences on uint32 with wrapping
arithmetic, so sample points (and therefore images) are comparable bit-for-bit at
f32 precision.

TPU-first design notes: the reference evaluates the sampler per GPU thread inside
the raygen/hit shaders; here each function is fully vectorized over a flat batch of
`pattern` indices (one per pixel/ray), so a whole wavefront's sample points are one
fused elementwise XLA computation. The do/while rejection loop in CMJPermute becomes
a lane-masked `lax.while_loop` — the strata count is static, so on average ~1
iteration runs and XLA keeps the loop tight.
"""

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def _masked_width(l: int) -> int:
    """w = next-pow2(l)-1 computed statically (l is a static stratum count)."""
    w = l - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    return w


def _permute_round(i, p, w):
    """One round of the CMJ permutation hash (Sampling.hlsl:290-304)."""
    i = i ^ p
    i = i * _u32(0xE170893D)
    i = i ^ (p >> 16)
    i = i ^ ((i & w) >> 4)
    i = i ^ (p >> 8)
    i = i * _u32(0x0929EB3F)
    i = i ^ (p >> 23)
    i = i ^ ((i & w) >> 1)
    i = i * (_u32(1) | (p >> 27))
    i = i * _u32(0x6935FA69)
    i = i ^ ((i & w) >> 11)
    i = i * _u32(0x74DCB303)
    i = i ^ ((i & w) >> 2)
    i = i * _u32(0x9E501CC3)
    i = i ^ ((i & w) >> 2)
    i = i * _u32(0xC860A3DF)
    i = i & w
    i = i ^ (i >> 5)
    return i


def cmj_permute(i, l: int, p):
    """CMJPermute(i, l, p): cycle-walking permutation of [0, l).

    `i` and `p` are uint32 arrays (broadcastable); `l` must be a static Python int.
    """
    assert isinstance(l, int) and l >= 1
    w = _u32(_masked_width(l))
    i = _u32(i)
    p = _u32(p)
    i, p = jnp.broadcast_arrays(i, p)
    lv = _u32(l)

    i = _permute_round(i, p, w)  # do { } executes at least once

    def cond(iv):
        return jnp.any(iv >= lv)

    def body(iv):
        return jnp.where(iv >= lv, _permute_round(iv, p, w), iv)

    i = jax.lax.while_loop(cond, body, i)
    return (i + p) % lv


def cmj_rand_float(i, p):
    """CMJRandFloat(i, p) -> float32 in [0, 1) (Sampling.hlsl:309-319)."""
    i = _u32(i)
    p = _u32(p)
    i = i ^ p
    i = i ^ (i >> 17)
    i = i ^ (i >> 10)
    i = i * _u32(0xB36534E5)
    i = i ^ (i >> 12)
    i = i ^ (i >> 21)
    i = i * _u32(0x93FC4795)
    i = i ^ _u32(0xDF6E307F)
    i = i ^ (i >> 17)
    i = i * (_u32(1) | (p >> 18))
    return i.astype(jnp.float32) * jnp.float32(1.0 / 4294967808.0)


def sample_cmj_2d(sample_idx, num_samples_x: int, num_samples_y: int, pattern):
    """SampleCMJ2D: 2D stratified sample for `sample_idx` in pattern `pattern`.

    sample_idx: uint32 array/scalar (traced OK); num_samples_x/y static ints;
    pattern: uint32 array (typically one per pixel). Returns (..., 2) float32.
    """
    n = num_samples_x * num_samples_y
    pattern = _u32(pattern)
    sample_idx = cmj_permute(sample_idx, n, pattern * _u32(0x51633E2D))
    sx = cmj_permute(sample_idx % _u32(num_samples_x), num_samples_x, pattern * _u32(0x68BC21EB))
    sy = cmj_permute(sample_idx // _u32(num_samples_x), num_samples_y, pattern * _u32(0x02E5BE93))
    jx = cmj_rand_float(sample_idx, pattern * _u32(0x967A889B))
    jy = cmj_rand_float(sample_idx, pattern * _u32(0x368CC8B7))
    f32 = lambda v: v.astype(jnp.float32)
    u = (f32(sx) + (f32(sy) + jx) / num_samples_y) / num_samples_x
    v = (f32(sample_idx) + jy) / n
    return jnp.stack([u, v], axis=-1)
