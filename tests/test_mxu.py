"""MXU (fat-leaf, matmul-leaf) traversal vs the per-ray oracle.

The MXU path computes Moller-Trumbore through anchored Plucker-feature
matmuls (accel/mxu.py), so results are not bit-identical to the per-ray
VPU formulation — agreement is pinned to tight tolerances instead: same
hit/miss decisions for essentially all rays, and matching t on hits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.lbvh import (build_bvh_for_scene,
                                          build_split_bvh,
                                          build_split_tables_numpy_sah)
from dxrpathtracer_tpu.accel.mxu import mxu_any_hit, mxu_closest_hit
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit


def _scene_rays(seed, n=512, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3)).astype(np.float32) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _soup(seed, m=3000):
    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal((m, 3)).astype(np.float32) * 4
    v1 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.8
    v2 = v0 + rng.standard_normal((m, 3)).astype(np.float32) * 0.8
    return v0, v1, v2


def _build_both(v0, v1, v2):
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    ref = build_bvh(v0, v1, v2)
    mxu = build_split_bvh(v0, v1, v2)
    return ref, mxu


def _check_agreement(ref_rec, mxu_rec, tol=2e-3, max_mismatch=2e-3):
    rt = np.asarray(ref_rec.t)
    mt = np.asarray(mxu_rec.t)
    rhit = np.asarray(ref_rec.tri_id) >= 0
    mhit = np.asarray(mxu_rec.tri_id) >= 0
    n = rt.shape[0]
    # hit/miss agreement (edge-grazing rays may legitimately differ)
    mismatch = (rhit != mhit).sum()
    assert mismatch <= max(2, max_mismatch * n), (
        f"hit/miss mismatch {mismatch}/{n}")
    both = rhit & mhit
    scale = np.maximum(1.0, np.abs(rt[both]))
    bad_t = np.abs(rt[both] - mt[both]) > tol * scale
    assert bad_t.sum() <= max(2, max_mismatch * n), (
        f"t mismatch {bad_t.sum()}/{both.sum()}, "
        f"max {np.abs(rt[both]-mt[both]).max()}")


def test_split_build_invariants():
    v0, v1, v2 = _soup(0, 2000)
    int_table, leaf_table, depth, root_code = \
        build_split_tables_numpy_sah(v0, v1, v2)
    L = 64
    tid = leaf_table[:, 9 * L:10 * L].view(np.int32)
    real = tid >= 0
    # every triangle appears exactly once across leaves
    ids = tid[real]
    assert sorted(ids.tolist()) == list(range(2000))
    # anchored vertices reconstruct the original triangles
    anchor = leaf_table[:, 10 * L:10 * L + 3]
    li, si = np.nonzero(real)
    v0r = np.stack([leaf_table[li, k * L + si] for k in range(3)], 1) \
        + anchor[li]
    np.testing.assert_allclose(v0r, v0[ids], atol=1e-4)
    # internal codes reference valid rows
    codes = int_table[:, 48:56].view(np.int32)
    valid = int_table[:, 0:8] <= int_table[:, 24:32]
    assert (codes[valid & (codes >= 0)] < int_table.shape[0]).all()
    assert ((~codes[valid & (codes < 0)]) < leaf_table.shape[0]).all()


@pytest.mark.parametrize("seed", [1, 2])
def test_mxu_closest_vs_perray_soup(seed):
    v0, v1, v2 = _soup(seed)
    ref_bvh, mxu_bvh = _build_both(v0, v1, v2)
    o, d = _scene_rays(seed, n=512)
    tmax = jnp.full((512,), 1e30)
    ref = closest_hit(ref_bvh, o, d, 0.0, tmax)
    got = mxu_closest_hit(mxu_bvh, o, d, 0.0, tmax)
    _check_agreement(ref, got)


def test_mxu_any_vs_perray_soup():
    v0, v1, v2 = _soup(3)
    ref_bvh, mxu_bvh = _build_both(v0, v1, v2)
    o, d = _scene_rays(7, n=512)
    tmax = jnp.full((512,), 1e30)
    ref = np.asarray(any_hit(ref_bvh, o, d, 1e-4, tmax))
    got = np.asarray(mxu_any_hit(mxu_bvh, o, d, 1e-4, tmax))
    assert (ref != got).sum() <= 2


def test_mxu_active_mask_and_tmax():
    v0, v1, v2 = _soup(4, 500)
    ref_bvh, mxu_bvh = _build_both(v0, v1, v2)
    o, d = _scene_rays(5, n=256)
    act = jnp.asarray((np.arange(256) % 3) != 0)
    tmax = jnp.full((256,), 4.0)  # finite: distant hits become misses
    ref = closest_hit(ref_bvh, o, d, 0.0, tmax, act)
    got = mxu_closest_hit(mxu_bvh, o, d, 0.0, tmax, act)
    assert not np.asarray(got.tri_id)[~np.asarray(act)].max() >= 0
    _check_agreement(ref, got)


def test_mxu_boxtest_scene_primaries():
    """Primary rays through the BoxTest camera — the coherent case the
    packet tiling produces in render_sample."""
    import jax
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.render.integrator import (raygen, _tile_order,
                                                     _packet_tile_dims)

    settings = AppSettings(current_scene=Scenes.BoxTest)
    sess = RenderSession(settings=settings, width=64, height=32)
    mxu_bvh = build_split_bvh(
        np.asarray(sess.scene_host.positions)[np.asarray(sess.scene_host.tri_idx)[:, 0]],
        np.asarray(sess.scene_host.positions)[np.asarray(sess.scene_host.tri_idx)[:, 1]],
        np.asarray(sess.scene_host.positions)[np.asarray(sess.scene_host.tri_idx)[:, 2]])
    fr = sess.frame_constants(0)
    o, d, length, pix = raygen(settings, fr, 64, 32, 0, 32)
    ty, tx = _packet_tile_dims(32, 64)
    o = _tile_order(o, 32, 64, ty, tx)
    d = _tile_order(d, 32, 64, ty, tx)
    length = _tile_order(length, 32, 64, ty, tx)
    ref = closest_hit(sess.bvh, o, d, 0.0, length)
    got = mxu_closest_hit(mxu_bvh, o, d, 0.0, length)
    _check_agreement(ref, got, max_mismatch=1e-3)
