"""Nested-span aggregating profiler.

TPU-native re-expression of the reference profiler
(src/sparsevllm/utils/profiler.py:1-89): a global ``Profiler`` whose
``record(name)`` context manager accumulates count/total-time per span name,
printed on demand or at exit. On TPU the wall-clock spans measure host-side
dispatch; device time is profiled with ``jax.profiler`` traces, which
``Profiler.trace_to(dir)`` enables around a region.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class _SpanStat:
    count: int = 0
    total_s: float = 0.0


@dataclass
class Profiler:
    enabled: bool = field(
        default_factory=lambda: os.environ.get("PROFILER_SVLLM_TPU", "0") == "1"
    )
    stats: dict = field(default_factory=lambda: defaultdict(_SpanStat))
    _stack: list = field(default_factory=list)

    @contextlib.contextmanager
    def record(self, name: str):
        if not self.enabled:
            yield
            return
        qual = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            st = self.stats[qual]
            st.count += 1
            st.total_s += dt

    def reset(self) -> None:
        self.stats.clear()

    def summary(self) -> str:
        if not self.stats:
            return "(profiler: no spans recorded)"
        lines = [f"{'span':<48} {'count':>8} {'total_s':>10} {'avg_ms':>10}"]
        for name, st in sorted(self.stats.items(), key=lambda kv: -kv[1].total_s):
            avg_ms = (st.total_s / max(st.count, 1)) * 1e3
            lines.append(f"{name:<48} {st.count:>8} {st.total_s:>10.3f} {avg_ms:>10.3f}")
        return "\n".join(lines)

    @contextlib.contextmanager
    def trace_to(self, trace_dir: str):
        """Wrap a region in a jax.profiler trace (device timeline)."""
        import jax

        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


profiler = Profiler()
