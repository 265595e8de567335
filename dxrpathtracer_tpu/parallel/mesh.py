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
                      axis_name: str = "rows", raster_dims=None):
    """Build a jitted multi-chip render step.

    Returns step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None,
    ray_bvh=None, raster_stack=None, raster_tri_table=None, alpha_bvh=None)
    -> new accum, with accum sharded by rows over `mesh` and everything else
    replicated except `raster_stack`.

    The optional engine arguments carry the PRODUCTION hot-path configuration
    (VERDICT r4 #6 — the dryrun must validate what actually ships, not a
    fallback): `ray_bvh` is the wide W32 per-ray table, `alpha_bvh` the tiny
    split-alpha candidate table, and `raster_stack`/`raster_tri_table` the
    software-raster primary bins (render/swraster.py). Raster bins are
    PER-SHARD (each device rasterizes its own row block), so they arrive as
    a dict of arrays with a leading device axis — build with
    stack_raster_slabs() — sharded on that axis; `raster_dims` is the static
    (ty, tx) packet-tile shape the bins were built for.
    """
    n_dev = mesh.devices.size
    assert height % n_dev == 0, f"height {height} must divide over {n_dev} devices"
    rows_per = height // n_dev

    repl = P()

    # check_vma=False: the traversal while_loop seeds its carry with fresh
    # constants (node pointers, sentinel t values) that JAX's varying-manual-
    # axes checker would otherwise require to be explicitly pvary'd per axis.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, P(axis_name), repl, repl, repl, repl,
                       repl, P(axis_name), repl, repl, repl, repl),
             out_specs=P(axis_name), check_vma=False)
    def sharded(scene, bvh, accum_block, sky_cube, frame, bvh2, sun_grid,
                ray_bvh, raster_stack, raster_tri_table, alpha_bvh, proxy,
                cut):
        row0 = jax.lax.axis_index(axis_name) * rows_per
        raster = None
        if raster_stack is not None:
            from ..render.swraster import RasterBins
            ty, tx, *rest = raster_dims
            raster = RasterBins(**{k: v[0] for k, v in raster_stack.items()},
                                tri_table=raster_tri_table,
                                ty=int(ty), tx=int(tx),
                                opaque_only=bool(rest[0]) if rest else False)
        return render_sample(scene, bvh, sky_cube, settings, frame,
                             width, rows_per, accum_block,
                             row_offset=row0, total_height=height, bvh2=bvh2,
                             sun_bvh=sun_grid, ray_bvh=ray_bvh,
                             raster=raster, alpha_bvh=alpha_bvh, proxy=proxy,
                             cut=cut)

    @jax.jit
    def step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None,
             ray_bvh=None, raster_stack=None, raster_tri_table=None,
             alpha_bvh=None, proxy=None, cut=None):
        return sharded(scene, bvh, accum, sky_cube, frame, bvh2, sun_grid,
                       ray_bvh, raster_stack, raster_tri_table, alpha_bvh,
                       proxy, cut)

    return step


def stack_raster_slabs(bins_list):
    """Stack per-shard RasterBins (one per device row block, all built with
    the same pad_to buckets) into (raster_stack, tri_table, (ty, tx)) for
    make_sharded_step: every array field gains a leading device axis sharded
    P("rows"); the shared exact triangle table stays replicated."""
    import dataclasses as _dc
    first = bins_list[0]
    fields = [f.name for f in _dc.fields(first)
              if f.name not in ("tri_table", "ty", "tx", "opaque_only")]
    stack = {k: jnp.stack([getattr(b, k) for b in bins_list], axis=0)
             for k in fields}
    return stack, first.tri_table, (first.ty, first.tx, first.opaque_only)


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


def make_sample_parallel_step(mesh: Mesh, settings, width: int, height: int,
                              axis_name: str = "samples"):
    """Build a jitted SAMPLE-parallel render step — the second sharding axis.

    Row sharding (make_sharded_step) splits pixels; this splits the
    progressive SAMPLE stream: every device renders the full image at a
    different CMJ sample index (device d takes global samples
    d, d + n_dev, d + 2*n_dev, ...) into its own running-mean block of the
    (n_dev, H, W, 3) accumulation array. Rays are independent across samples,
    so the hot loop has ZERO collectives; the converged image is the equal-
    weight mean over the device axis (one all-reduce at readback — see
    sample_parallel_image). After k steps the image holds k * n_dev samples:
    the progressive convergence rate scales linearly with the mesh.

    step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None,
    ray_bvh=None) -> new accum, where `frame.curr_sample_idx` is the STEP
    index (0, 1, 2, ...) and accum is (n_dev, height, width, 3) sharded on
    axis 0 (see shard_accum — the same placement helper works).
    """
    import dataclasses as _dc

    n_dev = mesh.devices.size
    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, P(axis_name), repl, repl, repl, repl,
                       repl),
             out_specs=P(axis_name), check_vma=False)
    def sharded(scene, bvh, accum_block, sky_cube, frame, bvh2, sun_grid,
                ray_bvh):
        dev = jax.lax.axis_index(axis_name).astype(jnp.uint32)
        step_idx = frame.curr_sample_idx
        global_sample = step_idx * jnp.uint32(n_dev) + dev
        frame_dev = _dc.replace(frame, curr_sample_idx=global_sample)
        out = render_sample(scene, bvh, sky_cube, settings, frame_dev,
                            width, height, accum_block[0], bvh2=bvh2,
                            sun_bvh=sun_grid, ray_bvh=ray_bvh,
                            accum_sample_idx=step_idx)
        return out[None]

    @jax.jit
    def step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None,
             ray_bvh=None):
        return sharded(scene, bvh, accum, sky_cube, frame, bvh2, sun_grid,
                       ray_bvh)

    return step


def sample_parallel_image(accum):
    """Equal-weight mean over the device axis of a sample-parallel
    accumulation — every shard holds the same number of samples, so the mean
    of per-device running means IS the mean over all global samples."""
    return jnp.mean(accum, axis=0)


def make_grid_step(mesh: Mesh, settings, width: int, height: int,
                   sample_axis: str = "samples", row_axis: str = "rows"):
    """Build a jitted 2D-mesh render step: SAMPLE x ROW sharding combined.

    mesh is 2D (sample_axis, row_axis): device (s, r) renders global pixel
    rows [r*H/R, (r+1)*H/R) of global CMJ sample step*S + s into its own
    running-mean block. Both axes are collective-free in the hot loop; the
    converged image is sample_parallel_image() of the readback (rows
    concatenate, samples average). This is the full-scale layout: rows give
    intra-frame parallelism (latency), samples inter-frame (throughput).

    step(scene, bvh, accum, sky_cube, frame, ...) -> accum where accum is
    (S, height, width, 3) sharded P(sample_axis, row_axis) and
    frame.curr_sample_idx is the step index.
    """
    import dataclasses as _dc

    s_dev = mesh.shape[sample_axis]
    r_dev = mesh.shape[row_axis]
    assert height % r_dev == 0, f"height {height} must divide over {r_dev} rows"
    rows_per = height // r_dev
    repl = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl, repl, P(sample_axis, row_axis), repl, repl,
                       repl, repl, repl),
             out_specs=P(sample_axis, row_axis), check_vma=False)
    def sharded(scene, bvh, accum_block, sky_cube, frame, bvh2, sun_grid,
                ray_bvh):
        s_idx = jax.lax.axis_index(sample_axis).astype(jnp.uint32)
        r_idx = jax.lax.axis_index(row_axis)
        step_idx = frame.curr_sample_idx
        global_sample = step_idx * jnp.uint32(s_dev) + s_idx
        frame_dev = _dc.replace(frame, curr_sample_idx=global_sample)
        out = render_sample(scene, bvh, sky_cube, settings, frame_dev,
                            width, rows_per, accum_block[0],
                            row_offset=r_idx * rows_per, total_height=height,
                            bvh2=bvh2, sun_bvh=sun_grid, ray_bvh=ray_bvh,
                            accum_sample_idx=step_idx)
        return out[None]

    @jax.jit
    def step(scene, bvh, accum, sky_cube, frame, bvh2=None, sun_grid=None,
             ray_bvh=None):
        return sharded(scene, bvh, accum, sky_cube, frame, bvh2, sun_grid,
                       ray_bvh)

    return step
