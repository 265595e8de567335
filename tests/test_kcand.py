"""K-candidate alpha traversal (accel/packet.py collect_alpha mode +
render/integrator._kcand_closest) vs the punch-through reference loop.

The punch loop re-traverses the scene once per rejected alpha hit
(RayTrace.hlsl:485-507's any-hit shader, emulated outside the loop);
the K-candidate walk returns the nearest opaque hit plus each lane's K
nearest alpha-material candidates from ONE traversal, alpha-tests them
outside, and falls back to punch-through only for overflow lanes. These
tests pin exactness of the replacement (including the forced-overflow
path) and that flagged tables stay invisible to the opaque engines.
"""

from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.lbvh import (ALPHA_TID_BIT, build_bvh_for_scene)
from dxrpathtracer_tpu.accel.packet import (packet_closest_hit,
                                            packet_closest_hit_alpha)
from dxrpathtracer_tpu.accel.traverse import closest_hit
from dxrpathtracer_tpu.app.settings import AppSettings
from dxrpathtracer_tpu.render.integrator import (_kcand_closest,
                                                 _make_alpha_test,
                                                 _punch_through_closest)
from dxrpathtracer_tpu.scene.registry import tiny_alpha_scene


@pytest.fixture(scope="module")
def alpha_fixture():
    scene, _ = tiny_alpha_scene()
    sc = jax.device_put(scene)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    bvh = build_bvh_for_scene(scene, positions=pos, tri_idx=tri,
                              flag_alpha=True)
    bvh_plain = build_bvh_for_scene(scene, positions=pos, tri_idx=tri)
    accept = _make_alpha_test(sc, AppSettings())
    return sc, bvh, bvh_plain, accept


def _card_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-3, 3, n), rng.uniform(0.1, 2.5, n),
                  np.full(n, -5.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.1, 0.1, n),
                  np.ones(n)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_flags_marked_and_invisible(alpha_fixture):
    """The flagged table marks exactly the alpha-material triangles, and
    the opaque engines return flag-free tri ids identical to the plain
    table's."""
    sc, bvh, bvh_plain, _ = alpha_fixture
    t_flag = np.asarray(bvh.table)
    t_plain = np.asarray(bvh_plain.table)
    diff = (t_flag.view(np.int32) ^ t_plain.view(np.int32))
    assert (np.unique(diff) == np.array([0, int(ALPHA_TID_BIT)])).all()

    n = 128 * 32
    o, d = _card_rays(n)
    act = jnp.ones((n,), bool)
    for fn in (partial(packet_closest_hit, bvh),
               partial(closest_hit, bvh)):
        rec = fn(o, d, 0.001, 100.0, act)
        ref = packet_closest_hit(bvh_plain, o, d, 0.001, 100.0, act)
        np.testing.assert_array_equal(np.asarray(rec.tri_id),
                                      np.asarray(ref.tri_id))
        assert (np.asarray(rec.tri_id) < int(ALPHA_TID_BIT)).all()


def test_kcand_matches_punch(alpha_fixture):
    sc, bvh, _, accept = alpha_fixture
    n = 128 * 64
    o, d = _card_rays(n, seed=1)
    act = jnp.ones((n,), bool)
    pk = partial(packet_closest_hit, bvh)

    def punch_fn(o_, d_, tn_, tx_, a_, mr_):
        return _punch_through_closest(pk, accept, o_, d_, tn_, tx_, a_,
                                      max_rounds=mr_)

    ref = _punch_through_closest(pk, accept, o, d, 0.001, 100.0, act)
    got = _kcand_closest(partial(packet_closest_hit_alpha, bvh), punch_fn,
                         accept, o, d, jnp.full((n,), 0.001, jnp.float32),
                         jnp.full((n,), 100.0, jnp.float32), act)
    ri, gi = np.asarray(ref.tri_id), np.asarray(got.tri_id)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    mism = (ri != gi) | (np.abs(rt - gt) > 1e-5)
    # punch's t_min nudge may skip a candidate within 4e-6 of a rejected
    # one that the K-buffer legitimately keeps; allow that sliver only
    assert mism.sum() <= max(2, n // 1000), mism.sum()


def test_kcand_overflow_fallback_exact(alpha_fixture):
    """k_cands=1 forces the full-buffer (resumable) fallback on multi-card
    rays; the punch fallback must make the result exact anyway."""
    sc, bvh, _, accept = alpha_fixture
    n = 128 * 32
    o, d = _card_rays(n, seed=2)
    act = jnp.ones((n,), bool)
    pk = partial(packet_closest_hit, bvh)

    def punch_fn(o_, d_, tn_, tx_, a_, mr_):
        return _punch_through_closest(pk, accept, o_, d_, tn_, tx_, a_,
                                      max_rounds=mr_)

    _, cands = packet_closest_hit_alpha(bvh, o, d, 0.001, 100.0, act,
                                        k_cands=1)
    # the fallback class must be exercised: buffer full (drops resume)
    assert int(np.asarray(cands["tri"][:, -1] >= 0).sum()) > 0
    ref = _punch_through_closest(pk, accept, o, d, 0.001, 100.0, act)
    got = _kcand_closest(partial(packet_closest_hit_alpha, bvh, k_cands=1),
                         punch_fn, accept, o, d,
                         jnp.full((n,), 0.001, jnp.float32),
                         jnp.full((n,), 100.0, jnp.float32), act)
    ri, gi = np.asarray(ref.tri_id), np.asarray(got.tri_id)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    mism = (ri != gi) | (np.abs(rt - gt) > 1e-5)
    assert mism.sum() <= max(2, n // 1000), mism.sum()


def test_inleaf_overflow_flagged_and_exact():
    """>LEAF_EXTRACT in-reach candidates inside ONE leaf must set the
    overflow bit (the non-resumable class), and the split resolver must
    still be exact via the restart punch. Scene: 6 coplanar-stacked cards
    a ray pierces in one leaf."""
    import dataclasses
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.render.integrator import (_make_alpha_test,
                                                     _split_alpha_closest)
    from dxrpathtracer_tpu.scene.build import build_scene
    from dxrpathtracer_tpu.scene.procedural import make_plane
    from dxrpathtracer_tpu.scene.textures import (AtlasBuilder,
                                                  default_material_table)

    meshes = [make_plane((20.0, 20.0), (0.0, -2.0, 0.0), material_idx=0)]
    for k in range(6):  # tight stack -> one leaf holds many cards
        meshes.append(make_plane((2.0, 2.0), (0.0, 0.1 * k, 0.0),
                                 material_idx=1))
    builder = AtlasBuilder()
    materials = default_material_table(2, builder)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    mask = (((yy // 8 + xx // 8) % 2).astype(np.float32))[..., None]
    op = np.asarray(materials.opacity).copy()
    op[1] = builder.add("op", mask)
    ho = np.asarray(materials.has_opacity).copy()
    ho[1] = True
    materials = dataclasses.replace(materials, opacity=op, has_opacity=ho,
                                    any_opacity=True)
    scene = build_scene(meshes, materials=materials, atlas_builder=builder)
    sc = jax.device_put(scene)
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    bvh = build_bvh_for_scene(scene, positions=pos, tri_idx=tri,
                              flag_alpha=True)
    tri_mat = np.asarray(scene.tri_material)
    has_op2 = np.asarray(scene.materials.has_opacity, bool)
    aidx = np.where(has_op2[tri_mat])[0].astype(np.int32)
    atr = tri[aidx]
    # leaf_size=12: all 12 card tris can share a leaf -> in-leaf overflow
    bvh_alpha = build_bvh(pos[atr[:, 0]], pos[atr[:, 1]], pos[atr[:, 2]],
                          tri_alpha=has_op2[tri_mat], tri_ids=aidx)
    accept = _make_alpha_test(sc, AppSettings())

    n = 128 * 16
    rng = np.random.default_rng(0)
    o = np.stack([rng.uniform(-1.8, 1.8, n), np.full(n, 5.0),
                  rng.uniform(-1.8, 1.8, n)], -1).astype(np.float32)
    d = np.tile(np.array([[0, -1, 0]], np.float32), (n, 1))
    o, d = jnp.asarray(o), jnp.asarray(d)
    act = jnp.ones((n,), bool)

    _, cands = packet_closest_hit_alpha(bvh_alpha, o, d, 0.001, 100.0, act)
    assert int(np.asarray(cands["overflow"]).sum()) > 0  # class exercised

    pk = partial(packet_closest_hit, bvh)

    def alpha_punch_fn(o_, d_, tn_, tx_, a_, mr_):
        return _punch_through_closest(
            partial(packet_closest_hit, bvh_alpha), accept, o_, d_, tn_,
            tx_, a_, max_rounds=mr_)

    ref = _punch_through_closest(pk, accept, o, d, 0.001, 100.0, act,
                                 max_rounds=8)
    got = _split_alpha_closest(
        partial(packet_closest_hit, bvh, exclude_alpha=True),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=8),
        alpha_punch_fn, accept, o, d,
        jnp.full((n,), 0.001, jnp.float32),
        jnp.full((n,), 100.0, jnp.float32), act, max_rounds=8)
    ri, gi = np.asarray(ref.tri_id), np.asarray(got.tri_id)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    mism = (ri != gi) | (np.abs(rt - gt) > 1e-5)
    assert mism.sum() <= max(2, n // 500), mism.sum()


def test_candidates_sorted_and_stripped(alpha_fixture):
    sc, bvh, _, _ = alpha_fixture
    n = 128 * 32
    o, d = _card_rays(n, seed=3)
    act = jnp.ones((n,), bool)
    rec, cands = packet_closest_hit_alpha(bvh, o, d, 0.001, 100.0, act)
    tri = np.asarray(cands["tri"])
    t = np.asarray(cands["t"])
    valid = tri >= 0
    assert (tri[valid] < int(ALPHA_TID_BIT)).all()
    # slots are nearest-first and padded after the last valid one
    for s in range(t.shape[1] - 1):
        both = valid[:, s] & valid[:, s + 1]
        assert (t[both, s] <= t[both, s + 1]).all()
        assert not (~valid[:, s] & valid[:, s + 1]).any()


def test_split_tables_match_punch(alpha_fixture):
    """The production split-table design (opaque-only walk + tiny alpha
    table + punch-tiny fallback) vs the single-table punch reference."""
    from dxrpathtracer_tpu.accel.lbvh import build_bvh
    from dxrpathtracer_tpu.render.integrator import (_split_alpha_closest,
                                                     _split_alpha_visibility)
    from dxrpathtracer_tpu.scene.registry import tiny_alpha_scene

    scene, _ = tiny_alpha_scene()
    sc, bvh, _, accept = alpha_fixture
    pos = np.asarray(scene.positions)
    tri = np.asarray(scene.tri_idx)
    tri_mat = np.asarray(scene.tri_material)
    has_op = np.asarray(scene.materials.has_opacity, bool)
    aidx = np.where(has_op[tri_mat])[0].astype(np.int32)
    atr = tri[aidx]
    bvh_alpha = build_bvh(pos[atr[:, 0]], pos[atr[:, 1]], pos[atr[:, 2]],
                          tri_alpha=has_op[tri_mat], tri_ids=aidx)
    assert bvh_alpha.has_alpha_flags

    n = 128 * 48
    o, d = _card_rays(n, seed=5)
    act = jnp.ones((n,), bool)
    pk = partial(packet_closest_hit, bvh)

    def alpha_punch_fn(o_, d_, tn_, tx_, a_, mr_):
        return _punch_through_closest(
            partial(packet_closest_hit, bvh_alpha), accept, o_, d_, tn_,
            tx_, a_, max_rounds=mr_)

    ref = _punch_through_closest(pk, accept, o, d, 0.001, 100.0, act)
    got = _split_alpha_closest(
        partial(packet_closest_hit, bvh, exclude_alpha=True),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=4),
        alpha_punch_fn, accept, o, d,
        jnp.full((n,), 0.001, jnp.float32),
        jnp.full((n,), 100.0, jnp.float32), act)
    ri, gi = np.asarray(ref.tri_id), np.asarray(got.tri_id)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    mism = (ri != gi) | (np.abs(rt - gt) > 1e-5)
    assert mism.sum() <= max(2, n // 1000), mism.sum()

    # visibility flavor: blocked iff punch closest found an accepted hit
    from dxrpathtracer_tpu.accel.packet import packet_any_hit_rec
    vis = _split_alpha_visibility(
        partial(packet_any_hit_rec, bvh, exclude_alpha=True),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=4),
        alpha_punch_fn, accept, o, d,
        jnp.full((n,), 0.001, jnp.float32),
        jnp.full((n,), 100.0, jnp.float32), act)
    want_blocked = ri >= 0
    got_blocked = np.asarray(vis) == 0.0
    assert (want_blocked == got_blocked).mean() > 0.999


def test_render_image_raster_opq_alpha(alpha_fixture, monkeypatch):
    """Force the software raster to engage on the alpha scene (it binds
    only opaque triangles and serves as the split design's opaque step):
    the image must match the non-raster split render statistically."""
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import tiny_alpha_scene

    scene, preset = tiny_alpha_scene()
    sets = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=1)
    imgs = []
    for force_raster in (True, False):
        if force_raster:
            monkeypatch.setenv("DXRPT_RASTER_MIN_PIXELS", "1")
        else:
            monkeypatch.delenv("DXRPT_RASTER_MIN_PIXELS", raising=False)
        sess = RenderSession(settings=sets, width=128, height=64,
                             scene=scene, preset=preset)
        if force_raster:
            assert sess._raster_slabs is not None, \
                "raster did not engage on the alpha scene"
        sess.render_to_completion()
        imgs.append(np.asarray(sess.accum))
    a, b = imgs
    assert np.isfinite(a).all() and np.isfinite(b).all()
    npx = (np.abs(a - b).max(-1) > 1e-4).sum()
    assert npx <= a.shape[0] * a.shape[1] * 0.005, npx


def test_force_opaque_mode_sees_cards(monkeypatch):
    """max_any_hit_path_length=0 renders alpha geometry as OPAQUE
    (FORCE_OPAQUE); the alpha-masked raster must NOT serve that primary
    (regression: cards vanished and B-mode timing shifted)."""
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import Scenes
    from dxrpathtracer_tpu.scene.registry import tiny_alpha_scene

    scene, preset = tiny_alpha_scene()
    sets = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=1,
                       max_any_hit_path_length=0)
    imgs = []
    for force_raster in (True, False):
        if force_raster:
            monkeypatch.setenv("DXRPT_RASTER_MIN_PIXELS", "1")
        else:
            monkeypatch.delenv("DXRPT_RASTER_MIN_PIXELS", raising=False)
        sess = RenderSession(settings=sets, width=128, height=64,
                             scene=scene, preset=preset)
        sess.render_to_completion()
        imgs.append(np.asarray(sess.accum))
    a, b = imgs
    npx = (np.abs(a - b).max(-1) > 1e-4).sum()
    assert npx <= a.shape[0] * a.shape[1] * 0.005, npx


def test_render_image_kcand_vs_punch(alpha_fixture, monkeypatch):
    """Full trace_paths image: the split-table K-candidate path
    (DXRPT_SPLIT_ALPHA=1 — the round-4 design, opt-in since the round-5
    end-to-end A/B measured it 22% slower) vs the default punch-through.
    The alpha resolution feeding shading/NEE must agree statistically
    (identical up to near-tie path divergence)."""
    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import Scenes

    scene, preset = tiny_alpha_scene()
    sets = AppSettings(current_scene=Scenes.Sponza, sqrt_num_samples=1)
    imgs = []
    for split in ("1", ""):
        if split:
            monkeypatch.setenv("DXRPT_SPLIT_ALPHA", split)
        else:
            monkeypatch.delenv("DXRPT_SPLIT_ALPHA", raising=False)
        sess = RenderSession(settings=sets, width=96, height=64,
                             scene=scene, preset=preset)
        sess.render_to_completion()
        imgs.append(np.asarray(sess.accum))
    a, b = imgs
    assert np.isfinite(a).all() and np.isfinite(b).all()
    npx = (np.abs(a - b).max(-1) > 1e-4).sum()
    assert npx <= a.shape[0] * a.shape[1] * 0.005, npx
