"""Per-stage device timing of the split-table alpha design at production
shapes: opaque-only walk, tiny-table candidate walk, taps, punch-tiny
fallback — plus the monolithic punch reference. Localizes the cost that
the whole-frame A/B (probe_alpha_premium) can only see in aggregate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _timing import timed as _timed


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from dxrpathtracer_tpu.app.session import RenderSession
    from dxrpathtracer_tpu.app.settings import AppSettings, Scenes
    from dxrpathtracer_tpu.accel.packet import (packet_any_hit_rec,
                                                packet_closest_hit,
                                                packet_closest_hit_alpha)
    from dxrpathtracer_tpu.render.integrator import (_make_alpha_test,
                                                     _punch_through_closest,
                                                     _packet_tile_dims,
                                                     _tile_order, raygen)
    from dxrpathtracer_tpu.scene.registry import sponza_alpha_standin

    scene, preset = sponza_alpha_standin()
    sess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza,
                                              benchmark_mode=True),
                         width=960, height=540, scene=scene, preset=preset)
    bvh, bvh_alpha = sess.bvh, sess.bvh_alpha
    sc = sess.scene
    accept = _make_alpha_test(sc, sess.settings)
    print(f"# full rows {bvh.num_rows}  alpha rows "
          f"{bvh_alpha.num_rows if bvh_alpha else None}", flush=True)

    # production primary rays in packet-tile order
    fr = sess.frame_constants(0)
    o, d, length, pix = raygen(sess.settings, fr, 960, 540, 0, 540)
    ty, tx = _packet_tile_dims(540, 960)
    o = _tile_order(o, 540, 960, ty, tx)
    d = _tile_order(d, 540, 960, ty, tx)
    length = _tile_order(length, 540, 960, ty, tx)
    n = o.shape[0]
    act = jnp.ones((n,), bool)
    tmin = jnp.full((n,), 1e-3, jnp.float32)

    stages = {}

    def timed(name, fn, reps=8):
        dt = _timed(fn, reps=reps)
        stages[name] = dt
        print(f"{name:28s} {dt*1e3:8.1f} ms", flush=True)
        return fn()

    # control with a known answer (~35 ms round-3): opaque stand-in primary
    osess = RenderSession(settings=AppSettings(current_scene=Scenes.Sponza,
                                               benchmark_mode=True),
                          width=960, height=540)
    obvh = osess.bvh
    pk_ctrl = jax.jit(lambda o_, d_, tn, tx_, a: packet_closest_hit(
        obvh, o_, d_, tn, tx_, a))
    timed("CONTROL opaque primary", lambda: pk_ctrl(o, d, tmin, length, act))

    pk_full = jax.jit(lambda o_, d_, tn, tx_, a: packet_closest_hit(
        bvh, o_, d_, tn, tx_, a))
    pk_opq = jax.jit(lambda o_, d_, tn, tx_, a: packet_closest_hit(
        bvh, o_, d_, tn, tx_, a, exclude_alpha=True))
    timed("closest FORCE_OPAQUE (full)", lambda: pk_full(o, d, tmin, length, act))
    rec = timed("closest opq-only (full)", lambda: pk_opq(o, d, tmin, length, act))

    kc = int(os.environ.get("DXRPT_KCAND", "8"))
    kcand = jax.jit(lambda o_, d_, tn, tx_, a: packet_closest_hit_alpha(
        bvh_alpha, o_, d_, tn, tx_, a, k_cands=kc))
    _, cands = timed(f"tiny kcand walk (K={kc})",
                     lambda: kcand(o, d, tmin, rec.t, act))

    def taps():
        accs = []
        for s in range(kc):
            accs.append(accept(cands["tri"][:, s], cands["u"][:, s],
                               cands["v"][:, s]))
        return jnp.stack(accs)
    timed("taps (K slots)", jax.jit(taps))

    full = cands["tri"][:, -1] >= 0
    np_need = np.asarray(cands["overflow"] | full)
    print(f"# punch fraction: {np_need.mean()*100:.2f}%", flush=True)
    need = jnp.asarray(np_need)

    punch_tiny = jax.jit(lambda a: _punch_through_closest(
        partial(packet_closest_hit, bvh_alpha), accept, o, d, tmin, rec.t, a))
    timed("punch-tiny (need lanes)", lambda: punch_tiny(need))

    punch_full = jax.jit(lambda a: _punch_through_closest(
        partial(packet_closest_hit, bvh), accept, o, d, tmin, length, a))
    timed("punch-full (reference)", lambda: punch_full(act))

    any_opq = jax.jit(lambda o_, d_, tn, tx_, a: packet_any_hit_rec(
        bvh, o_, d_, tn, tx_, a, exclude_alpha=True))
    timed("any-hit opq-only (full)", lambda: any_opq(o, d, tmin, length, act))

    # ---- d1 SUN visibility stages on REAL shadow rays (origins at the
    # resolved primary hit points, one shared sun direction) ----
    from dxrpathtracer_tpu.core.constants import FP32Max
    from dxrpathtracer_tpu.render.integrator import (_split_alpha_closest,
                                                     _split_alpha_visibility)

    def alpha_punch(o_, d_, tn, tx_, a, mr):
        return _punch_through_closest(
            partial(packet_closest_hit, bvh_alpha), accept, o_, d_, tn,
            tx_, a, max_rounds=mr)

    split_rec = jax.jit(lambda: _split_alpha_closest(
        lambda *args: pk_opq(*args),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=kc),
        alpha_punch, accept, o, d, tmin, length, act))()
    hitm = np.asarray(split_rec.tri_id) >= 0
    print(f"# primary hit frac {hitm.mean():.3f}", flush=True)
    hp = o + d * np.asarray(split_rec.t)[:, None]
    sun_d = jnp.broadcast_to(
        jnp.asarray(np.asarray(fr.sun_direction_ws), jnp.float32), (n, 3))
    sun_o = jnp.asarray(hp)
    sun_act = jnp.asarray(hitm)
    stmin = jnp.full((n,), 1e-3, jnp.float32)
    stmax = jnp.full((n,), FP32Max, jnp.float32)

    timed("SUN any-hit opq-only", lambda: any_opq(
        sun_o, sun_d, stmin, stmax, sun_act))
    sun_kcand = jax.jit(lambda: packet_closest_hit_alpha(
        bvh_alpha, sun_o, sun_d, stmin, stmax, sun_act, k_cands=kc))
    _, scands = timed("SUN tiny kcand walk", sun_kcand)
    sovf = np.asarray(scands["overflow"] | (scands["tri"][:, -1] >= 0))
    print(f"# sun punch fraction: {sovf.mean()*100:.2f}%", flush=True)
    sun_vis = jax.jit(lambda: _split_alpha_visibility(
        lambda *args: packet_any_hit_rec(bvh, *args, exclude_alpha=True),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=kc),
        alpha_punch, accept, sun_o, sun_d, stmin, stmax, sun_act,
        no_overflow=True))
    timed("SUN split visibility ALL", sun_vis)
    sun_punch_ref = jax.jit(lambda: _punch_through_closest(
        pk_full, accept, sun_o, sun_d, stmin, stmax, sun_act))
    timed("SUN punch-full (reference)", sun_punch_ref)

    # ---- whole-function jits (what the frame actually pays) ----
    split_closest_whole = jax.jit(lambda: _split_alpha_closest(
        lambda *args: pk_opq(*args),
        partial(packet_closest_hit_alpha, bvh_alpha, k_cands=kc),
        alpha_punch, accept, o, d, tmin, length, act, no_overflow=True))
    timed("WHOLE split closest", split_closest_whole)

    # bisect the composition: opq then kcand (no taps/resolve)
    def opq_then_kcand():
        rec_ = pk_opq(o, d, tmin, length, act)
        return packet_closest_hit_alpha(bvh_alpha, o, d, tmin, rec_.t, act,
                                        k_cands=kc)
    timed("opq -> kcand (no resolve)", jax.jit(opq_then_kcand))

    def kcand_then_taps():
        rec_, cands_ = packet_closest_hit_alpha(
            bvh_alpha, o, d, tmin, length, act, k_cands=kc)
        accs = [accept(cands_["tri"][:, s_], cands_["u"][:, s_],
                       cands_["v"][:, s_]) for s_ in range(kc)]
        return jnp.stack(accs)
    timed("kcand -> taps", jax.jit(kcand_then_taps))

    # building blocks of the fallback composition
    some = jnp.asarray(np.arange(n) % 37 == 0)  # ~2.7% scattered lanes
    nz = jax.jit(lambda m: jnp.nonzero(m, size=131072, fill_value=0)[0])
    timed("nonzero(518k, size=131k)", lambda: nz(some))
    kc131 = jax.jit(lambda idx: packet_closest_hit_alpha(
        bvh_alpha, sun_o[idx], sun_d[idx], stmin[idx], stmax[idx],
        jnp.ones((131072,), bool), k_cands=kc))
    idx0 = nz(some)
    timed("kcand walk @131072", lambda: kc131(idx0))
    kc16 = jax.jit(lambda idx: packet_closest_hit_alpha(
        bvh_alpha, sun_o[idx], sun_d[idx], stmin[idx], stmax[idx],
        jnp.ones((16384,), bool), k_cands=kc))
    idx1 = jnp.asarray(np.arange(16384, dtype=np.int32))
    timed("kcand walk @16384", lambda: kc16(idx1))

    split_total = (stages["closest opq-only (full)"]
                   + stages[f"tiny kcand walk (K={kc})"]
                   + stages["taps (K slots)"]
                   + stages["punch-tiny (need lanes)"])
    print(f"\nsplit primary total ~{split_total*1e3:.1f} ms vs punch-full "
          f"{stages['punch-full (reference)']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
