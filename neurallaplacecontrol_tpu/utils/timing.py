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
