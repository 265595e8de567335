"""Bit-exactness of the CMJ sampler vs an independent scalar implementation.

The scalar reference below re-derives the hash recurrences from the published
CMJ construction [Kensler 2013] as used by the reference shaders
(Sampling.hlsl:282-331); matching it bit-for-bit means our images are
comparable to the reference renderer's.
"""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.core import cmj

M = np.uint32(0xFFFFFFFF)


def _permute_scalar(i, l, p):
    i = np.uint32(i)
    p = np.uint32(p)
    w = np.uint32(l - 1)
    w |= w >> np.uint32(1)
    w |= w >> np.uint32(2)
    w |= w >> np.uint32(4)
    w |= w >> np.uint32(8)
    w |= w >> np.uint32(16)
    while True:
        i ^= p
        i = np.uint32((int(i) * 0xE170893D) & 0xFFFFFFFF)
        i ^= p >> np.uint32(16)
        i ^= (i & w) >> np.uint32(4)
        i ^= p >> np.uint32(8)
        i = np.uint32((int(i) * 0x0929EB3F) & 0xFFFFFFFF)
        i ^= p >> np.uint32(23)
        i ^= (i & w) >> np.uint32(1)
        i = np.uint32((int(i) * int(np.uint32(1) | (p >> np.uint32(27)))) & 0xFFFFFFFF)
        i = np.uint32((int(i) * 0x6935FA69) & 0xFFFFFFFF)
        i ^= (i & w) >> np.uint32(11)
        i = np.uint32((int(i) * 0x74DCB303) & 0xFFFFFFFF)
        i ^= (i & w) >> np.uint32(2)
        i = np.uint32((int(i) * 0x9E501CC3) & 0xFFFFFFFF)
        i ^= (i & w) >> np.uint32(2)
        i = np.uint32((int(i) * 0xC860A3DF) & 0xFFFFFFFF)
        i &= w
        i ^= i >> np.uint32(5)
        if i < l:
            break
    return np.uint32((int(i) + int(p)) % l)


def _rand_float_scalar(i, p):
    i = np.uint32(i)
    p = np.uint32(p)
    i ^= p
    i ^= i >> np.uint32(17)
    i ^= i >> np.uint32(10)
    i = np.uint32((int(i) * 0xB36534E5) & 0xFFFFFFFF)
    i ^= i >> np.uint32(12)
    i ^= i >> np.uint32(21)
    i = np.uint32((int(i) * 0x93FC4795) & 0xFFFFFFFF)
    i ^= np.uint32(0xDF6E307F)
    i ^= i >> np.uint32(17)
    i = np.uint32((int(i) * int(np.uint32(1) | (p >> np.uint32(18)))) & 0xFFFFFFFF)
    return np.float32(np.float32(i) * np.float32(1.0 / 4294967808.0))


def _sample_cmj_scalar(s, nx, ny, p):
    n = nx * ny
    s = _permute_scalar(s, n, (p * 0x51633E2D) & 0xFFFFFFFF)
    sx = _permute_scalar(s % nx, nx, (p * 0x68BC21EB) & 0xFFFFFFFF)
    sy = _permute_scalar(s // nx, ny, (p * 0x02E5BE93) & 0xFFFFFFFF)
    jx = _rand_float_scalar(s, (p * 0x967A889B) & 0xFFFFFFFF)
    jy = _rand_float_scalar(s, (p * 0x368CC8B7) & 0xFFFFFFFF)
    ux = np.float32((np.float32(sx) + (np.float32(sy) + jx) / np.float32(ny)) / np.float32(nx))
    uy = np.float32((np.float32(s) + jy) / np.float32(n))
    return ux, uy


def test_cmj_bit_exact():
    """Bitwise for power-of-two stratum counts (the reference's defaults are
    pow2: SqrtNumSamples=4). For non-pow2 counts XLA's divide-by-constant ->
    reciprocal-multiply rewrite costs at most 1 ULP, which we bound."""
    patterns = np.array([0, 1, 2, 17, 12345, 0xDEADBEEF % (2**32), 999999], np.uint32)
    for nx, ny in [(1, 1), (2, 2), (4, 4), (3, 5)]:
        pow2 = (nx & (nx - 1)) == 0 and (ny & (ny - 1)) == 0
        n = nx * ny
        for s in range(n):
            got = np.asarray(cmj.sample_cmj_2d(jnp.uint32(s), nx, ny,
                                               jnp.asarray(patterns)))
            for k, p in enumerate(patterns):
                ux, uy = _sample_cmj_scalar(s, nx, ny, int(p))
                if pow2:
                    assert got[k, 0] == ux, (nx, ny, s, p, got[k, 0], ux)
                    assert got[k, 1] == uy, (nx, ny, s, p, got[k, 1], uy)
                else:
                    ulp = np.spacing(np.float32(1.0))
                    assert abs(got[k, 0] - ux) <= 2 * ulp
                    assert abs(got[k, 1] - uy) <= 2 * ulp


def test_cmj_stratification():
    """Each of the nx*ny strata is hit exactly once across a full sample set."""
    nx = ny = 4
    n = nx * ny
    pattern = jnp.full((n,), 77, jnp.uint32)
    pts = np.asarray(cmj.sample_cmj_2d(jnp.arange(n, dtype=jnp.uint32), nx, ny, pattern))
    cells = set()
    for x, y in pts:
        assert 0.0 <= x < 1.0 and 0.0 <= y < 1.0
        cells.add((int(x * nx), int(y * ny)))
    assert len(cells) == n


def test_cmj_rand_float_range():
    v = np.asarray(cmj.cmj_rand_float(jnp.arange(4096, dtype=jnp.uint32),
                                      jnp.uint32(123)))
    assert (v >= 0.0).all() and (v < 1.0).all()
    assert 0.4 < v.mean() < 0.6
