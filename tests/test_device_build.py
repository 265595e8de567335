"""On-device LBVH builder (accel/device_build.py): bit-identity with the
host reference build, oracle correctness, and the dynamic-geometry
rebuild-inside-one-jit path (the reference's per-frame GPU accel-structure
rebuild capability, DXRPathTracer.cpp:2331-2488)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxrpathtracer_tpu.accel.brute import brute_force_closest_hit
from dxrpathtracer_tpu.accel.device_build import (
    build_bvh_device, build_table_device, lbvh_plan, morton_codes_30_jnp)
from dxrpathtracer_tpu.accel.lbvh import (
    LEAF_SIZE, build_table_numpy, morton_codes_30)
from dxrpathtracer_tpu.accel.traverse import closest_hit


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


def test_morton_codes_match_host():
    rng = np.random.default_rng(7)
    c = rng.uniform(-5, 5, (4096, 3)).astype(np.float32)
    host = morton_codes_30(c)
    dev = np.asarray(morton_codes_30_jnp(jnp.asarray(c)))
    assert (host == dev.astype(np.uint32)).all()


@pytest.mark.parametrize("t_count", [5, 12, 13, 97, 300, 2000])
def test_device_table_bit_identical_to_host(t_count):
    """The jitted build emits the exact (num_rows, 128) table the host
    reference build (build_table_numpy) does — same topology (it is static),
    same bits (sort order, AABB reductions, record packing all agree)."""
    rng = np.random.default_rng(t_count)
    v0, v1, v2 = _soup(rng, t_count)
    host_table, n_rows, n_leaves, depth, root_code = build_table_numpy(
        v0, v1, v2)

    plan = lbvh_plan(t_count)
    assert (plan.num_rows, plan.num_leaves, plan.depth, plan.root_code) == \
        (n_rows, n_leaves, depth, root_code)
    dev_table = np.asarray(jax.jit(
        lambda a, b, c: build_table_device(a, b, c, plan))(
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)))
    assert dev_table.shape == host_table.shape
    # compare raw bits (tables mix floats with bitcast int32 codes/tri ids)
    assert (dev_table.view(np.int32) == host_table.view(np.int32)).all()


def test_device_bvh_matches_brute_force():
    rng = np.random.default_rng(1)
    v0, v1, v2 = _soup(rng, 500)
    bvh = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    o, d = _rays(rng, 500)

    rec = jax.jit(lambda b, oo, dd: closest_hit(b, oo, dd, 0.0, 1e30))(
        bvh, jnp.asarray(o), jnp.asarray(d))
    bt, btri, _, _ = brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 1e30)

    tri = np.asarray(rec.tri_id)
    assert ((tri >= 0) == (btri >= 0)).all()
    m = tri >= 0
    assert m.mean() > 0.5
    assert np.allclose(np.asarray(rec.t)[m], bt[m], rtol=1e-4, atol=1e-5)
    assert (tri[m] == btri[m]).mean() > 0.999


def test_plan_is_count_keyed_and_reusable():
    """Two different geometries with the same triangle count share one plan
    (and therefore one compiled build)."""
    rng = np.random.default_rng(2)
    plan = lbvh_plan(321)
    for seed in (3, 4):
        v0, v1, v2 = _soup(np.random.default_rng(seed), 321)
        host_table, *_ = build_table_numpy(v0, v1, v2)
        dev = np.asarray(build_table_device(
            jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), plan))
        assert (dev.view(np.int32) == host_table.view(np.int32)).all()


def test_dynamic_rebuild_and_trace_in_one_jit():
    """Deform -> rebuild -> trace fused into ONE jitted program (the
    dynamic-scene capability: no host round-trip per frame). Hits must
    track the moving geometry exactly."""
    rng = np.random.default_rng(5)
    v0, v1, v2 = _soup(rng, 200, spread=0.4, size=0.2)
    plan = lbvh_plan(200)
    from dxrpathtracer_tpu.accel.lbvh import FlatBVH, WIDTH

    @jax.jit
    def step(base0, base1, base2, offset):
        a0, a1, a2 = base0 + offset, base1 + offset, base2 + offset
        table = build_table_device(a0, a1, a2, plan)
        bvh = FlatBVH(table=table, num_rows=plan.num_rows,
                      num_tris=plan.num_tris, num_leaves=plan.num_leaves,
                      leaf_size=plan.leaf_size, max_depth=plan.depth + 2,
                      root_code=plan.root_code, width=WIDTH)
        o = jnp.asarray([[0.0, 0.0, -10.0]] * 64)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
        # fan the rays out across x so several hit the cloud
        o = o.at[:, 0].set(jnp.linspace(-0.6, 0.6, 64))
        rec = closest_hit(bvh, o, d, 0.0, 1e30)
        return rec.t, rec.tri_id

    t0, id0 = step(*map(jnp.asarray, (v0, v1, v2)),
                   jnp.zeros(3, jnp.float32))
    t1, id1 = step(*map(jnp.asarray, (v0, v1, v2)),
                   jnp.asarray([0.0, 0.0, 2.0], jnp.float32))
    m = np.asarray(id0) >= 0
    assert m.any()
    # same triangles hit, 2.0 further along +z
    assert (np.asarray(id1)[m] == np.asarray(id0)[m]).all()
    assert np.allclose(np.asarray(t1)[m], np.asarray(t0)[m] + 2.0,
                       rtol=1e-5, atol=1e-4)
