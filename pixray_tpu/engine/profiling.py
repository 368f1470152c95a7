"""Tracing/profiling: jax.profiler traces + per-phase host timers.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).  Here:
``--profile_dir`` captures a TensorBoard-compatible device trace of the first
iterations of a run, and ``PhaseTimer`` aggregates host-side phase timings that
are printed at the end of a session.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total / {n} calls = {total / n * 1000:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(profile_dir: str | None, max_iters_note: str = ""):
    """jax.profiler trace context; no-op when profile_dir is None."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"wrote jax profiler trace to {profile_dir} {max_iters_note}")
