"""Profiler — per-pass timing with moving statistics.

TPU equivalent of the reference's GPU timestamp-query profiler
(Graphics/Profiler.{h,cpp}: StartProfile/EndProfile around every pass, 64-frame
moving stats, by-name lookup `GPUProfileTiming`). JAX dispatch is async and on
the tunneled device even `block_until_ready` does not reliably synchronize
(PERF_NOTES.md), so the "GPU" scope forces a tiny readback of the pass result
at scope exit — the timestamp-fence equivalent of the reference's
query-heap resolve (Profiler.cpp:240,329). CPU scopes are plain wall timers.
RAII ProfileBlock/CPUProfileBlock become context managers.
"""

import contextlib
import time
from collections import defaultdict, deque


def _sync(value):
    """Force completion of the device work producing `value` via a tiny
    readback (one element per array leaf); block_until_ready alone is not
    reliable on the tunneled platform."""
    import jax
    for leaf in jax.tree_util.tree_leaves(value):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            float(jax.device_get(leaf.ravel()[0]))


class _GpuScope:
    """Yielded by Profiler.gpu_scope; the pass assigns its output array (or
    pytree of arrays) to `.result` so the scope can fence on it at exit."""

    def __init__(self, result=None):
        self.result = result


class Profiler:
    WINDOW = 64  # moving-average window (Profiler.cpp keeps 64 frames)

    def __init__(self):
        self._samples = defaultdict(lambda: deque(maxlen=self.WINDOW))

    @contextlib.contextmanager
    def cpu_scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    @contextlib.contextmanager
    def gpu_scope(self, name: str, result=None):
        """Times device work bounded by a readback fence. The caller assigns
        the pass output to the yielded scope's `.result` (or passes a
        pre-existing array as `result`); scope exit blocks on it."""
        scope = _GpuScope(result)
        t0 = time.perf_counter()
        try:
            yield scope
        finally:
            _sync(scope.result)
            self._samples[name].append(time.perf_counter() - t0)

    def timing(self, name: str) -> float:
        """GPUProfileTiming equivalent: moving-average seconds for a pass."""
        s = self._samples.get(name)
        return sum(s) / len(s) if s else 0.0

    def stats(self):
        out = {}
        for name, s in self._samples.items():
            out[name] = {"avg": sum(s) / len(s), "max": max(s), "min": min(s),
                         "count": len(s)}
        return out

    def report(self) -> str:
        lines = [f"{name:32s} avg {v['avg']*1e3:8.2f} ms  max {v['max']*1e3:8.2f} ms"
                 for name, v in sorted(self.stats().items())]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace for everything inside the scope —
    the PIX/timestamp-query capture equivalent (Profiler.cpp + PIXMarker,
    GraphicsTypes.h:516): per-HLO device timelines viewable in
    TensorBoard/Perfetto. Wraps jax.profiler.trace so callers don't import
    jax at module scope; used by `render --profile-trace DIR`."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
