"""LBVH build + traversal vs brute-force oracle (SURVEY.md §4(a))."""

import numpy as np
import jax
import jax.numpy as jnp

from dxrpathtracer_tpu.accel.brute import brute_force_closest_hit
from dxrpathtracer_tpu.accel.lbvh import LEAF_SIZE, build_bvh
from dxrpathtracer_tpu.accel.traverse import any_hit, closest_hit


def _soup(rng, t, spread=1.0, size=0.3):
    v0 = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-size, size, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(rng, n, spread=3.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d.astype(np.float32)


def test_bvh_structure(mode="sah"):
    """Unified 8-ary record layout invariants (accel/lbvh.py)."""
    rng = np.random.default_rng(3)
    t_count = 300
    v0, v1, v2 = _soup(rng, t_count)
    bvh = build_bvh(v0, v1, v2, mode=mode)
    table = np.asarray(bvh.table)
    assert table.shape == (bvh.num_rows, 128)

    def as_i32(col):
        return np.ascontiguousarray(col).view(np.int32)

    # Walk from the root: every row visited exactly once; child bounds nest.
    seen = np.zeros(bvh.num_rows, bool)
    tri_seen = []
    stack = [bvh.root_code]
    while stack:
        code = stack.pop()
        row = ~code if code < 0 else code
        assert 0 <= row < bvh.num_rows
        assert not seen[row]
        seen[row] = True
        rec = table[row]
        if code < 0:
            # leaf (SoA blocks): collect triangle ids; padded slots degenerate
            L = LEAF_SIZE
            for k in range(bvh.leaf_size):
                tid = as_i32(rec[9 * L + k:9 * L + k + 1])[0]
                if tid >= 0:
                    tri_seen.append(tid)
                else:
                    for comp in range(3, 9):  # e1/e2 components all zero
                        assert rec[comp * L + k] == 0
        else:
            codes = as_i32(rec[48:56])
            for k in range(8):
                lo_c = rec[[0 + k, 8 + k, 16 + k]]
                hi_c = rec[[24 + k, 32 + k, 40 + k]]
                if (lo_c > hi_c).any():
                    continue  # empty child slot
                child = codes[k]
                crow = ~child if child < 0 else child
                if child < 0:
                    # leaf child: its triangles are inside the stored bounds
                    lrec = table[crow]
                    L = LEAF_SIZE
                    for j in range(bvh.leaf_size):
                        if as_i32(lrec[9 * L + j:9 * L + j + 1])[0] >= 0:
                            p0 = lrec[[0 * L + j, 1 * L + j, 2 * L + j]]
                            e1 = lrec[[3 * L + j, 4 * L + j, 5 * L + j]]
                            e2 = lrec[[6 * L + j, 7 * L + j, 8 * L + j]]
                            for p in (p0, p0 + e1, p0 + e2):
                                assert (p >= lo_c - 1e-5).all()
                                assert (p <= hi_c + 1e-5).all()
                stack.append(int(child))
    assert seen.all()
    # Every triangle appears in exactly one leaf slot
    assert sorted(tri_seen) == list(range(t_count))


import pytest


@pytest.mark.parametrize("mode", ["morton", "sah"])
def test_closest_hit_matches_brute_force(mode):
    rng = np.random.default_rng(0)
    v0, v1, v2 = _soup(rng, 500)
    bvh = build_bvh(v0, v1, v2, mode=mode)
    o, d = _rays(rng, 500)

    fn = jax.jit(lambda b, oo, dd: closest_hit(b, oo, dd, 0.0, 1e30))
    rec = fn(bvh, jnp.asarray(o), jnp.asarray(d))
    bt, btri, bu, bv = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)

    t = np.asarray(rec.t)
    tri = np.asarray(rec.tri_id)
    assert ((tri >= 0) == (btri >= 0)).all()
    m = tri >= 0
    assert m.mean() > 0.5  # rays aimed at the soup actually hit
    assert np.allclose(t[m], bt[m], rtol=1e-4, atol=1e-5)
    # Same triangle except exact-tie cases
    assert (tri[m] == btri[m]).mean() > 0.999
    assert np.allclose(np.asarray(rec.u)[m], bu[m], rtol=1e-3, atol=1e-4)


def test_any_hit_matches_brute_force():
    rng = np.random.default_rng(1)
    v0, v1, v2 = _soup(rng, 300)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 400)
    fn = jax.jit(lambda b, oo, dd: any_hit(b, oo, dd, 0.0, 1e30))
    vis = np.asarray(fn(bvh, jnp.asarray(o), jnp.asarray(d)))
    bt, btri, _, _ = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)
    assert ((vis == 0.0) == (btri >= 0)).all()


def test_t_range_respected():
    rng = np.random.default_rng(2)
    v0, v1, v2 = _soup(rng, 200)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 200)
    bt, btri, _, _ = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)
    m = btri >= 0
    # Set t_max just below each brute-force hit: traversal must miss them all
    t_max = np.where(m, bt * 0.99, 1e30).astype(np.float32)
    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), 0.0, jnp.asarray(t_max))
    assert (np.asarray(rec.tri_id)[m] != btri[m]).all() or (
        np.asarray(rec.t)[m] < bt[m] * 0.99).all()
    # t_min beyond the hit skips it
    t_min = np.where(m, bt * 1.01, 0.0).astype(np.float32)
    rec2 = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min), 1e30)
    t2 = np.asarray(rec2.t)
    assert (t2[m] >= bt[m] * 1.005).all()


def test_alpha_test_accept_fn():
    """accept_fn=False for even triangles must make them invisible."""
    rng = np.random.default_rng(4)
    v0, v1, v2 = _soup(rng, 100)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 300)

    def accept(tid, u, v):
        return (tid % 2) == 1

    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), 0.0, 1e30,
                      accept_fn=accept)
    tri = np.asarray(rec.tri_id)
    assert ((tri < 0) | (tri % 2 == 1)).all()
    # Oracle: brute force over odd triangles only
    odd = np.arange(100) % 2 == 1
    bt, btri_odd, _, _ = brute_force_closest_hit(
        v0[odd], v1[odd], v2[odd], o, d, 0.0, 1e30)
    mapped = np.where(btri_odd >= 0, btri_odd * 2 + 1, -1)
    assert (tri == mapped).mean() > 0.999


def test_boxtest_scene_hits():
    from dxrpathtracer_tpu.scene.registry import load_scene
    from dxrpathtracer_tpu.accel.lbvh import LEAF_SIZE, build_bvh_for_scene
    from dxrpathtracer_tpu.app.settings import Scenes
    scene, preset = load_scene(Scenes.BoxTest)
    assert scene.num_triangles == 24  # two boxes x 12 tris (Model.cpp:761-780)
    bvh = build_bvh_for_scene(scene)
    # Ray straight down from above the floating box: hits its top face at y=2.5
    o = jnp.asarray([[0.0, 10.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    rec = closest_hit(bvh, o, d, 0.0, 1e30)
    assert int(rec.tri_id[0]) >= 0
    assert abs(float(rec.t[0]) - 7.5) < 1e-4  # 10 - 2.5


def test_compaction_phases_match_brute_force(monkeypatch):
    """Force multiple compaction phases (accel/traverse.py phase schedule) and
    verify closest-hit + any-hit still match the brute-force oracle."""
    from dxrpathtracer_tpu.accel import traverse as trav
    monkeypatch.setattr(trav, "MIN_COMPACT_SIZE", 64)
    monkeypatch.setattr(trav, "MAX_COMPACT_PHASES", 4)

    rng = np.random.default_rng(7)
    v0, v1, v2 = _soup(rng, 700)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 2000)  # 2000 -> phases of 2000/1000/500/250/125 lanes

    rec = jax.jit(lambda b, oo, dd: closest_hit(b, oo, dd, 0.0, 1e30))(
        bvh, jnp.asarray(o), jnp.asarray(d))
    bt, btri, bu, bv = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)
    tri = np.asarray(rec.tri_id)
    assert ((tri >= 0) == (btri >= 0)).all()
    m = tri >= 0
    assert m.mean() > 0.5
    assert np.allclose(np.asarray(rec.t)[m], bt[m], rtol=1e-4, atol=1e-5)
    assert (tri[m] == btri[m]).mean() > 0.999

    vis = np.asarray(jax.jit(lambda b, oo, dd: any_hit(b, oo, dd, 0.0, 1e30))(
        bvh, jnp.asarray(o), jnp.asarray(d)))
    assert ((vis == 0.0) == (btri >= 0)).all()


def test_bvh_structure_morton():
    test_bvh_structure(mode="morton")


def test_quarantine_pad_equivalence(monkeypatch):
    """The lane-count quarantine (accel/traverse.py: dispatch shapes inside
    the axon TPU wrong-result band are padded with inactive lanes to the
    band's verified-good upper edge) must be semantics-neutral: padded and
    unpadded dispatches agree EXACTLY on every lane. Shrink the band so the
    pad engages at test scale instead of at 36864 lanes."""
    from dxrpathtracer_tpu.accel import traverse as trav
    monkeypatch.setattr(trav, "_PAD_BAND_LO", 512)
    monkeypatch.setattr(trav, "_PAD_BAND_HI", 2048)
    # padding is TPU-only since round 5 (the CPU backend is the
    # correctness reference); force it on so the CPU CI still pins the
    # pad's semantics-neutrality
    monkeypatch.setattr(trav, "_IS_TPU", True)

    rng = np.random.default_rng(11)
    v0, v1, v2 = _soup(rng, 400)
    bvh = build_bvh(v0, v1, v2)
    o, d = _rays(rng, 1280)  # inside the (shrunk) band; 1280 % 128 == 0
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)

    assert trav.quarantine_pad_count(1280) == 768
    rec_pad = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
    monkeypatch.setenv("DXRPT_NO_LANE_PAD", "1")
    assert trav.quarantine_pad_count(1280) == 0
    rec_raw = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
    monkeypatch.delenv("DXRPT_NO_LANE_PAD")

    assert rec_pad.t.shape == (1280,)
    assert np.array_equal(np.asarray(rec_pad.tri_id), np.asarray(rec_raw.tri_id))
    assert np.array_equal(np.asarray(rec_pad.t), np.asarray(rec_raw.t))
    assert np.array_equal(np.asarray(rec_pad.u), np.asarray(rec_raw.u))

    vis_pad = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
    monkeypatch.setenv("DXRPT_NO_LANE_PAD", "1")
    vis_raw = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
    monkeypatch.delenv("DXRPT_NO_LANE_PAD")
    assert vis_pad.shape == (1280,)
    assert np.array_equal(vis_pad, vis_raw)

    from dxrpathtracer_tpu.accel.packet import packet_closest_hit
    rec_ppad = packet_closest_hit(bvh, o_d, d_d, 0.0, 1e30)
    monkeypatch.setenv("DXRPT_NO_LANE_PAD", "1")
    rec_praw = packet_closest_hit(bvh, o_d, d_d, 0.0, 1e30)
    monkeypatch.delenv("DXRPT_NO_LANE_PAD")
    assert rec_ppad.t.shape == (1280,)
    assert np.array_equal(np.asarray(rec_ppad.tri_id),
                          np.asarray(rec_praw.tri_id))
    assert np.array_equal(np.asarray(rec_ppad.t), np.asarray(rec_praw.t))


def test_root_peel_equivalence(monkeypatch):
    """The root peel (accel/traverse.py: step 1 runs OUTSIDE the while_loop
    with the root record broadcast from a static index instead of an
    all-lanes-same-row gather) must be bit-exact vs the unpeeled loop, on
    both W8 and W32 tables, for closest and any hit."""
    rng = np.random.default_rng(17)
    v0, v1, v2 = _soup(rng, 600)
    o, d = _rays(rng, 2048)
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)

    for bvh in (build_bvh(v0, v1, v2), build_bvh(v0, v1, v2, width=32)):
        monkeypatch.setenv("DXRPT_ROOT_PEEL", "1")
        rec_on = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
        vis_on = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
        monkeypatch.setenv("DXRPT_ROOT_PEEL", "0")
        rec_off = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
        vis_off = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
        monkeypatch.delenv("DXRPT_ROOT_PEEL")
        assert np.array_equal(np.asarray(rec_on.tri_id),
                              np.asarray(rec_off.tri_id))
        assert np.array_equal(np.asarray(rec_on.t), np.asarray(rec_off.t))
        assert np.array_equal(np.asarray(rec_on.u), np.asarray(rec_off.u))
        assert np.array_equal(vis_on, vis_off)


def test_compact_schedule_knobs_equivalence(monkeypatch):
    """Deeper compaction schedules (DXRPT_MAX_COMPACT_PHASES /
    DXRPT_MIN_COMPACT_SIZE) and spread dead-lane gather rows
    (DXRPT_SPREAD_DEAD_ROWS) only change WHICH rows finished lanes fetch
    and where phase boundaries fall — every consumer is masked, so results
    must be bit-identical on both table widths, closest and any hit."""
    rng = np.random.default_rng(23)
    v0, v1, v2 = _soup(rng, 600)
    o, d = _rays(rng, 4096)
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)

    for bvh in (build_bvh(v0, v1, v2), build_bvh(v0, v1, v2, width=32)):
        rec_base = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
        vis_base = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
        monkeypatch.setenv("DXRPT_MAX_COMPACT_PHASES", "8")
        monkeypatch.setenv("DXRPT_MIN_COMPACT_SIZE", "256")
        monkeypatch.setenv("DXRPT_SPREAD_DEAD_ROWS", "1")
        rec_deep = closest_hit(bvh, o_d, d_d, 0.0, 1e30)
        vis_deep = np.asarray(any_hit(bvh, o_d, d_d, 0.0, 1e30))
        monkeypatch.delenv("DXRPT_MAX_COMPACT_PHASES")
        monkeypatch.delenv("DXRPT_MIN_COMPACT_SIZE")
        monkeypatch.delenv("DXRPT_SPREAD_DEAD_ROWS")
        assert np.array_equal(np.asarray(rec_deep.tri_id),
                              np.asarray(rec_base.tri_id))
        assert np.array_equal(np.asarray(rec_deep.t), np.asarray(rec_base.t))
        assert np.array_equal(np.asarray(rec_deep.u), np.asarray(rec_base.u))
        assert np.array_equal(vis_deep, vis_base)
