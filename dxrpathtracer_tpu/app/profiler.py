"""Profiler — per-pass timing with moving statistics.

TPU equivalent of the reference's GPU timestamp-query profiler
(Graphics/Profiler.{h,cpp}: StartProfile/EndProfile around every pass, 64-frame
moving stats, by-name lookup `GPUProfileTiming`). JAX dispatch is async, so the
"GPU" scope calls block_until_ready at scope exit to bound the measured work;
CPU scopes are plain wall timers. RAII ProfileBlock/CPUProfileBlock become
context managers.
"""

import contextlib
import time
from collections import defaultdict, deque


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
        """Times device work; pass `result` (array) to block on it, otherwise
        the scope blocks on everything via a barrier-free best effort."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
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
