"""Packet traversal (accel/packet.py) vs the per-ray traversal: identical
results on the same rays/BVH — the packet path is a pure performance
restructuring for coherent rays, not a new intersector."""

import numpy as np
import jax.numpy as jnp

from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.packet import (PACKET, packet_any_hit,
                                            packet_closest_hit)
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit


def _soup(rng, t, spread=1.0, size=0.3):
    v0 = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _coherent_rays(rng, n):
    """Camera-like coherent bundle: shared origin area, nearby targets."""
    o = np.tile(rng.uniform(-3, -2.5, (1, 3)).astype(np.float32), (n, 1))
    o += rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
    g = int(np.sqrt(n))
    ang = np.stack(np.meshgrid(np.linspace(-0.5, 0.5, g),
                               np.linspace(-0.5, 0.5, g),
                               indexing="ij"), -1).reshape(-1, 2)
    ang = np.tile(ang, (n // ang.shape[0] + 1, 1))[:n]
    tgt = np.concatenate([ang.astype(np.float32),
                          np.zeros((n, 1), np.float32)], axis=1)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d.astype(np.float32)


def _incoherent_rays(rng, n):
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d.astype(np.float32)


def _check_equal(bvh, o, d, t_min, t_max):
    n = o.shape[0]
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    tn = jnp.full((n,), t_min, jnp.float32)
    tx = jnp.full((n,), t_max, jnp.float32)
    ref = closest_hit(bvh, o_d, d_d, tn, tx)
    got = packet_closest_hit(bvh, o_d, d_d, tn, tx)
    ref_tri = np.asarray(ref.tri_id)
    got_tri = np.asarray(got.tri_id)
    # hits must match exactly; on (rare) exact-t ties across leaves the
    # visit order may pick a different triangle — but t must agree.
    same_tri = got_tri == ref_tri
    t_close = np.abs(np.asarray(got.t) - np.asarray(ref.t)) <= 1e-5 * np.maximum(
        1.0, np.abs(np.asarray(ref.t)))
    assert (same_tri | t_close).all()
    assert (same_tri.mean()) > 0.999, same_tri.mean()
    np.testing.assert_allclose(np.asarray(got.t)[same_tri],
                               np.asarray(ref.t)[same_tri], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.u)[same_tri],
                               np.asarray(ref.u)[same_tri], atol=1e-3)

    vref = np.asarray(any_hit(bvh, o_d, d_d, tn, tx))
    vgot = np.asarray(packet_any_hit(bvh, o_d, d_d, tn, tx))
    np.testing.assert_array_equal(vgot, vref)


def test_packet_matches_perray_coherent():
    rng = np.random.default_rng(7)
    v0, v1, v2 = _soup(rng, 700)
    bvh = build_bvh(v0, v1, v2)
    o, d = _coherent_rays(rng, 4 * PACKET)
    _check_equal(bvh, o, d, 1e-4, 3e38)


def test_packet_matches_perray_incoherent():
    """Correctness must hold even for fully incoherent packets (the path
    only loses SPEED on incoherence, never results)."""
    rng = np.random.default_rng(11)
    v0, v1, v2 = _soup(rng, 400)
    bvh = build_bvh(v0, v1, v2)
    o, d = _incoherent_rays(rng, 4 * PACKET)
    _check_equal(bvh, o, d, 1e-4, 3e38)


def test_packet_active_mask_and_tmax():
    rng = np.random.default_rng(13)
    v0, v1, v2 = _soup(rng, 300)
    bvh = build_bvh(v0, v1, v2)
    n = 2 * PACKET
    o, d = _coherent_rays(rng, n)
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    tn = jnp.full((n,), 1e-4, jnp.float32)
    tx = jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    act = jnp.asarray(rng.random(n) < 0.7)
    ref = closest_hit(bvh, o_d, d_d, tn, tx, act)
    got = packet_closest_hit(bvh, o_d, d_d, tn, tx, act)
    np.testing.assert_array_equal(np.asarray(got.tri_id)[~np.asarray(act)],
                                  -1)
    same = np.asarray(got.tri_id) == np.asarray(ref.tri_id)
    assert same.mean() > 0.999
    vref = np.asarray(any_hit(bvh, o_d, d_d, tn, tx, act))
    vgot = np.asarray(packet_any_hit(bvh, o_d, d_d, tn, tx, act))
    np.testing.assert_array_equal(vgot, vref)


def test_packet_all_miss_and_empty_packet():
    rng = np.random.default_rng(17)
    v0, v1, v2 = _soup(rng, 64)
    bvh = build_bvh(v0, v1, v2)
    n = PACKET
    o = np.full((n, 3), 50.0, np.float32)
    d = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    rec = packet_closest_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                             jnp.full((n,), 1e-4, jnp.float32),
                             jnp.full((n,), 3e38, jnp.float32))
    assert (np.asarray(rec.tri_id) == -1).all()
    vis = packet_any_hit(bvh, jnp.asarray(o), jnp.asarray(d),
                         jnp.full((n,), 1e-4, jnp.float32),
                         jnp.full((n,), 3e38, jnp.float32),
                         jnp.zeros((n,), bool))
    assert (np.asarray(vis) == 1.0).all()
