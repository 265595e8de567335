"""Honest device timing on the tunneled TPU.

A single dispatch + readback pays a ~35-73 ms round-trip floor
(PERF_NOTES.md round-2 'honest timing'), so timing ONE invocation per sync
measures max(compute, RTT) — every sub-50 ms phase measurement made that
way is garbage. The only honest protocol: enqueue several invocations,
sync ONCE on the last output, divide.

Round-4 postscript: tools/frame_decompose.py and several ab_* tools used
the single-sync pattern in round 3; their sub-100 ms phase numbers (and
any "neutral within a few ms" conclusions) carry up to a full RTT of
error. Use `timed` below for anything new; re-run old A/Bs before trusting
small deltas.
"""

import time

import numpy as np


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.ravel()[0]))


def timed(fn, *args, reps: int = 8, trials: int = 3):
    """Best-of-`trials` mean seconds per invocation, `reps` enqueued per
    sync. fn must be jitted and return at least one array."""
    _sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        outs = [fn(*args) for _ in range(reps)]
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / reps)
    return best
