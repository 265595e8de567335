"""Pallas traversal-body kernel vs the XLA body: bit-identical results.

Runs the kernel in interpreter mode on CPU (the compiled path is exercised
on the real TPU by tools/crosscheck_tpu.py and the bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit


def _soup(seed, m=2500):
    rng = np.random.default_rng(seed)
    v0 = (rng.standard_normal((m, 3)) * 4).astype(np.float32)
    v1 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.8
    v2 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.8
    return v0, v1, v2


def _rays(seed, n):
    rng = np.random.default_rng(seed)
    o = (rng.standard_normal((n, 3)) * 5).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture()
def pallas_on(monkeypatch):
    monkeypatch.setenv("DXRPT_PALLAS_BODY", "1")


@pytest.mark.parametrize("n", [512, 2048])
def test_closest_bit_identical(pallas_on, n):
    bvh = build_bvh(*_soup(0))
    o, d = _rays(1, n)
    tmax = jnp.full((n,), 1e30)
    got = closest_hit(bvh, o, d, 0.0, tmax)
    import os
    os.environ["DXRPT_PALLAS_BODY"] = "0"
    try:
        ref = closest_hit(bvh, o, d, 0.0, tmax)
    finally:
        os.environ["DXRPT_PALLAS_BODY"] = "1"
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))
    np.testing.assert_array_equal(np.asarray(got.v), np.asarray(ref.v))


def test_any_hit_bit_identical(pallas_on):
    bvh = build_bvh(*_soup(2))
    n = 1024
    o, d = _rays(3, n)
    tmax = jnp.full((n,), 1e30)
    got = np.asarray(any_hit(bvh, o, d, 1e-4, tmax))
    import os
    os.environ["DXRPT_PALLAS_BODY"] = "0"
    try:
        ref = np.asarray(any_hit(bvh, o, d, 1e-4, tmax))
    finally:
        os.environ["DXRPT_PALLAS_BODY"] = "1"
    np.testing.assert_array_equal(got, ref)


def test_active_mask_and_finite_tmax(pallas_on):
    bvh = build_bvh(*_soup(4, 800))
    n = 640
    o, d = _rays(5, n)
    act = jnp.asarray((np.arange(n) % 4) != 0)
    tmax = jnp.full((n,), 3.5)
    got = closest_hit(bvh, o, d, 0.0, tmax, act)
    import os
    os.environ["DXRPT_PALLAS_BODY"] = "0"
    try:
        ref = closest_hit(bvh, o, d, 0.0, tmax, act)
    finally:
        os.environ["DXRPT_PALLAS_BODY"] = "1"
    np.testing.assert_array_equal(np.asarray(got.tri_id), np.asarray(ref.tri_id))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
