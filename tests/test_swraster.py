"""Software-raster primary visibility (render/swraster.py) vs the BVH
traversal — hit-for-hit parity (VERDICT round-3 #1b: "hit parity is testable
triangle-for-triangle")."""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.history import build_tri_table
from dxrpathtracer_tpu.accel.lbvh import build_bvh
from dxrpathtracer_tpu.accel.traverse import closest_hit
from dxrpathtracer_tpu.app.session import RenderSession
from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
from dxrpathtracer_tpu.render import swraster
from dxrpathtracer_tpu.render.integrator import (_packet_tile_dims,
                                                 _tile_order, raygen)


def _session_rays(scene_name, w, h):
    sess = RenderSession(
        settings=AppSettings(current_scene=Scenes[scene_name],
                             sqrt_num_samples=2),
        width=w, height=h)
    frame = sess.frame_constants(0)
    o, d, length, _pix = raygen(sess.settings, frame, w, h)
    ty, tx = _packet_tile_dims(h, w)
    return sess, (ty, tx), (_tile_order(o, h, w, ty, tx),
                            _tile_order(d, h, w, ty, tx),
                            _tile_order(length, h, w, ty, tx))


def _bins_for(sess, ty, tx, pad_to=None):
    pos = np.asarray(sess.scene_host.positions)
    tri = np.asarray(sess.scene_host.tri_idx)
    tri_table = jnp.asarray(build_tri_table(pos, tri))
    vp = np.asarray(sess.camera.view_projection(), np.float64)
    return swraster.build_raster_bins(
        pos, tri, vp, float(sess.camera.near_clip), sess.width, sess.height,
        sess.height, 0, ty, tx, tri_table, pad_to=pad_to)


def test_raster_matches_bvh_boxtest():
    sess, (ty, tx), (o, d, length) = _session_rays("BoxTest", 96, 64)
    bins, p = _bins_for(sess, ty, tx)
    rec_r = swraster.raster_closest_hit(bins, o, d, 0.0, length, None)
    rec_b = closest_hit(sess.bvh, o, d, jnp.zeros_like(length), length)
    assert int(np.sum(np.asarray(rec_r.tri_id) != np.asarray(rec_b.tri_id))) == 0
    same = np.asarray(rec_b.tri_id) >= 0
    np.testing.assert_allclose(np.asarray(rec_r.t)[same],
                               np.asarray(rec_b.t)[same], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rec_r.u)[same],
                               np.asarray(rec_b.u)[same], atol=1e-5)

    # padding invariance: a fatter pair buffer is semantics-neutral
    bins2, _ = _bins_for(sess, ty, tx, pad_to=swraster.pad_quantum(p) * 2)
    rec_p = swraster.raster_closest_hit(bins2, o, d, 0.0, length, None)
    assert np.array_equal(np.asarray(rec_p.tri_id), np.asarray(rec_r.tri_id))
    assert np.array_equal(np.asarray(rec_p.t), np.asarray(rec_r.t))


def test_raster_matches_bvh_sponza_standin():
    sess, (ty, tx), (o, d, length) = _session_rays("Sponza", 128, 72)
    bins, _ = _bins_for(sess, ty, tx)
    rec_r = swraster.raster_closest_hit(bins, o, d, 0.0, length, None)
    rec_b = closest_hit(sess.bvh, o, d, jnp.zeros_like(length), length)
    idr = np.asarray(rec_r.tri_id)
    idb = np.asarray(rec_b.tri_id)
    # equal-t ties may break differently (module docstring); everything else
    # must match triangle-for-triangle
    mismatch = np.mean(idr != idb)
    assert mismatch <= 5e-4, f"tri mismatch rate {mismatch}"
    same = (idr == idb) & (idb >= 0)
    tr = np.asarray(rec_r.t)[same]
    tb = np.asarray(rec_b.t)[same]
    np.testing.assert_allclose(tr, tb, rtol=1e-4, atol=1e-5)


def test_near_plane_crossing_triangle():
    """A triangle spanning the camera near plane must still be binned
    (host clip at w = near) and hit exactly."""
    # camera at origin looking +z (FirstPersonCamera default orientation)
    from dxrpathtracer_tpu.render.camera import FirstPersonCamera
    w, h = 32, 32
    cam = FirstPersonCamera(aspect=1.0)
    # big floor quad passing under/through the near plane
    pos = np.array([[-5, -1, -5], [5, -1, -5], [0, -1, 20]], np.float32)
    tri = np.array([[0, 1, 2]], np.int32)
    tri_table = jnp.asarray(build_tri_table(pos, tri))
    bvh = build_bvh(pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]])

    from dxrpathtracer_tpu.render.integrator import FrameConstants
    ivp = jnp.asarray(np.asarray(cam.inv_view_projection(), np.float32))
    frame = FrameConstants(
        inv_view_projection=ivp,
        camera_pos_ws=jnp.zeros(3), sun_direction_ws=jnp.array([0., 1., 0.]),
        sun_irradiance=jnp.ones(3), sun_render_color=jnp.ones(3),
        cos_sun_angular_radius=jnp.float32(1.0),
        sin_sun_angular_radius=jnp.float32(0.0),
        curr_sample_idx=jnp.uint32(0))
    s = AppSettings(sqrt_num_samples=2)
    o, d, length, _ = raygen(s, frame, w, h)
    ty, tx = _packet_tile_dims(h, w)
    o_t = _tile_order(o, h, w, ty, tx)
    d_t = _tile_order(d, h, w, ty, tx)
    l_t = _tile_order(length, h, w, ty, tx)

    vp = np.asarray(cam.view_projection(), np.float64)
    bins, _ = swraster.build_raster_bins(
        pos, tri, vp, float(cam.near_clip), w, h, h, 0, ty, tx, tri_table)
    rec_r = swraster.raster_closest_hit(bins, o_t, d_t, 0.0, l_t, None)
    rec_b = closest_hit(bvh, o_t, d_t, jnp.zeros_like(l_t), l_t)
    assert np.asarray(rec_b.hit).sum() > 0  # the floor is visible
    assert np.array_equal(np.asarray(rec_r.tri_id), np.asarray(rec_b.tri_id))


def test_session_raster_image_matches(monkeypatch):
    """End-to-end: a session with raster primaries renders the same image
    as the packet-traversal session (ULP-level shading differences only)."""
    monkeypatch.setenv("DXRPT_RASTER_MIN_PIXELS", "1")
    w, h = 128, 64
    s_on = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             sqrt_num_samples=2, enable_sw_raster=True),
        width=w, height=h)
    assert s_on._raster_slabs is not None, "raster should engage"
    s_off = RenderSession(
        settings=AppSettings(current_scene=Scenes.BoxTest,
                             sqrt_num_samples=2, enable_sw_raster=False),
        width=w, height=h)
    assert s_off._raster_slabs is None
    a = np.asarray(s_on.render_to_completion(max_samples=2))
    b = np.asarray(s_off.render_to_completion(max_samples=2))
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() < 1e-3, f"max diff {np.abs(a - b).max()}"
