#!/usr/bin/env python3
"""Can manual Mosaic DMA beat XLA's gather at random row fetch?

The whole engine is bound by XLA's gather row rate (~65-96 M rows/s on the
tunneled v5e, independent of row width up to 512 B — PERF_NOTES.md): every
traversal step fetches one BVH record per live ray/packet. XLA's gather is
a black box; Pallas can instead issue one sliced async copy per row with K
copies outstanding, which pipelines HBM latency explicitly. This probe
measures that DMA issue/drain rate vs the XLA gather on identical shapes.

If the DMA path wins materially (>2x), the traversal loop gets a Pallas
gather stage; if not, the negative result is recorded in PERF_NOTES.md
next to the Pallas-body and MXU A/Bs.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.microbench_primitives2 import timed  # noqa: E402


def dma_gather(table, idx, chunk=2048, k_slots=16):
    """out[i] = table[idx[i]] via per-row sliced DMA, K outstanding."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx.shape[0]
    rows, width = table.shape
    assert n % chunk == 0

    def kernel(idx_ref, table_ref, out_ref, sems):
        def copy(i):
            slot = jax.lax.rem(i, k_slots)
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sems.at[slot])

        def body(i, _):
            @pl.when(i >= k_slots)
            def _():
                copy(i - k_slots).wait()
            copy(i).start()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

        def tail(i, _):
            copy(i).wait()
            return 0

        jax.lax.fori_loop(chunk - k_slots, chunk, tail, 0)

    grid = n // chunk
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, width), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k_slots,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    rows = 32768
    n = 1 << 20
    for width in (32, 128):
        table = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)

        xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        t = timed(xla, table, idx)
        print(f"width {width:4d}: XLA gather    {n/t/1e6:8.1f} M rows/s "
              f"({t*1e3:.2f} ms)", flush=True)

        for k_slots in (8, 16, 32):
            for chunk in (2048, 8192):
                fn = jax.jit(functools.partial(
                    dma_gather, chunk=chunk, k_slots=k_slots))
                try:
                    r = np.asarray(fn(table, idx[:chunk * 4])[:8, :4])
                    want = np.asarray(table)[np.asarray(idx[:8]), :4]
                    ok = np.allclose(r, want)
                    t = timed(fn, table, idx)
                    print(f"width {width:4d}: DMA k={k_slots:2d} "
                          f"chunk={chunk:5d} {n/t/1e6:8.1f} M rows/s "
                          f"({t*1e3:.2f} ms) correct={ok}", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"width {width:4d}: DMA k={k_slots:2d} "
                          f"chunk={chunk:5d} FAILED: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
