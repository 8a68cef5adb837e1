"""Profiling and tracing utilities.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars and one
timing print). Here: a lightweight per-stage wall-clock timer for the host
pipelines, and a ``jax.profiler`` trace context for capturing device
timelines viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall time per named stage across a pipeline run.

    Usage::

        timer = StageTimer()
        with timer("decode"):
            ...
        print(timer.summary())
    """

    def __init__(self):
        import threading

        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        # stages are timed from pipeline worker threads and composite/encode
        # pools concurrently; += is not atomic
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[stage] += dt
                self.counts[stage] += 1

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = [
            f"  {name:<14} {self.totals[name]:8.3f}s "
            f"({100 * self.totals[name] / total:5.1f}%)  x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "stage timings:\n" + "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir`` (no-op when
    ``log_dir`` is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
