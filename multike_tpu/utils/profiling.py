"""Tracing / profiling utilities.

The reference instruments with wall-clock prints only (SURVEY.md §5:
time.time() deltas at MultiKE_model.py:292,316-317 etc.). Here those log
lines are kept (trainer methods) and complemented with:

  * ``trace(dir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace of device execution;
  * ``StepTimer`` — cheap named wall-clock aggregation printed on demand.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: total {tot:.3f}s over {n} calls "
                         f"(avg {tot / max(n, 1) * 1e3:.2f} ms)")
        return "\n".join(lines)
