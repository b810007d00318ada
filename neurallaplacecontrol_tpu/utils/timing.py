"""Wall-clock timing helpers (training budget + benchmark timers).

The reference tracks seconds-per-iteration and a wall-clock training cutoff
(train_utils.py:335-338, 414-425). Timer.exclude() lets the budget accounting
skip jit compilation time so TPU runs are compared fairly (SURVEY.md §7,
hard part 6).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    def __init__(self):
        self.start = time.perf_counter()
        self.excluded = 0.0

    def elapsed(self) -> float:
        return time.perf_counter() - self.start - self.excluded

    @contextmanager
    def exclude(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.excluded += time.perf_counter() - t0


@contextmanager
def profile_trace(trace_dir: str | None):
    """XLA/TPU profiler trace around a block (SURVEY.md §5: the reference has
    no tracing; here ``jax.profiler`` traces are a first-class switch).

    ``trace_dir=None`` is a no-op, so call sites can pass a config field
    directly. View the trace with TensorBoard or xprof.
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextmanager
def annotate(name: str):
    """Named region in the profiler timeline (jax.profiler.TraceAnnotation),
    usable around host-side phases too."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
