"""Multi-chip rendering: pixel-row sharding over a jax.sharding.Mesh.

The reference is single-GPU; its only parallelism is one thread per pixel
inside DispatchRays (DXRPathTracer.cpp:2077-2085). The TPU-native scale-out is
data parallelism over pixel rows (SURVEY.md §2d): the scene/BVH/sky are tiny
relative to HBM and are replicated; the accumulation image is sharded by rows;
each chip traces only its rows. Rays are independent, so there are NO
cross-chip collectives in the hot loop — ICI is touched only if the caller
gathers the final image (an implicit all-gather on readback).

Pixel indices and NDC coordinates stay global inside each shard, so a sharded
render matches the single-chip render to rounding (fusion-order ULPs).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.integrator import render_sample


def make_render_mesh(devices=None, axis_name: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=(axis_name,))


def make_sharded_step(mesh: Mesh, settings, width: int, height: int,
                      axis_name: str = "rows"):
    """Build a jitted multi-chip render step.

    Returns step(scene, bvh, accum, sky_cube, frame) -> new accum, with accum
    sharded by rows over `mesh` and everything else replicated.
    """
    n_dev = mesh.devices.size
    assert height % n_dev == 0, f"height {height} must divide over {n_dev} devices"
    rows_per = height // n_dev

    repl = P()

    # check_vma=False: the traversal while_loop seeds its carry with fresh
    # constants (node pointers, sentinel t values) that JAX's varying-manual-
    # axes checker would otherwise require to be explicitly pvary'd per axis.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, P(axis_name), repl, repl, repl, repl),
             out_specs=P(axis_name), check_vma=False)
    def sharded(scene, bvh, accum_block, sky_cube, frame, bvh2, sun_grid):
        row0 = jax.lax.axis_index(axis_name) * rows_per
        return render_sample(scene, bvh, sky_cube, settings, frame,
                             width, rows_per, accum_block,
                             row_offset=row0, total_height=height, bvh2=bvh2,
                             sun_bvh=sun_grid)

    @jax.jit
    def step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None):
        return sharded(scene, bvh, accum, sky_cube, frame, bvh2, sun_grid)

    return step


def shard_accum(mesh: Mesh, accum, axis_name: str = "rows"):
    """Place an accumulation image with row sharding on the mesh."""
    return jax.device_put(accum, NamedSharding(mesh, P(axis_name)))


def make_sharded_bake_step(mesh: Mesh, settings, resolution: int,
                           axis_name: str = "rows"):
    """Build a jitted multi-chip lightmap-bake step (the second dispatch
    surface after rendering: the reference's DispatchRays(4096, 4096),
    DXRPathTracer.cpp:1974-1985).

    Texel rows shard over the mesh exactly like pixel rows in
    make_sharded_step: scene/BVH/sky replicated, surface maps + (sum,count)
    accumulation row-sharded, CMJ texel indices kept GLOBAL via the
    per-device row offset — so a sharded bake equals the single-chip bake
    to fusion-order ULPs and there are no hot-loop collectives.

    Returns step(scene, bvh, accum, sky_cube, frame, pos, nrm,
    sample_index, sun_grid=None) -> new accum.
    """
    from ..bake.baker import bake_sample

    n_dev = mesh.devices.size
    assert resolution % n_dev == 0, (
        f"resolution {resolution} must divide over {n_dev} devices")
    rows_per = resolution // n_dev
    total = resolution * resolution

    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, P(axis_name), repl, repl, P(axis_name),
                       P(axis_name), repl, repl),
             out_specs=P(axis_name), check_vma=False)
    def sharded(scene, bvh, accum_block, sky_cube, frame, pos_block,
                nrm_block, sample_index, sun_grid):
        row0 = (jax.lax.axis_index(axis_name) * rows_per).astype(jnp.uint32)
        return bake_sample(scene, bvh, sky_cube, settings, frame,
                           pos_block, nrm_block, accum_block, sample_index,
                           row_offset=row0, total_texels=total,
                           sun_bvh=sun_grid)

    @jax.jit
    def step(scene, bvh, accum, sky_cube, frame, pos, nrm, sample_index,
             sun_grid=None):
        return sharded(scene, bvh, accum, sky_cube, frame, pos, nrm,
                       sample_index, sun_grid)

    return step
