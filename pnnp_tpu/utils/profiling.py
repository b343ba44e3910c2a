"""Profiling instruments: fn_timer + jax.profiler trace hooks.

Replaces the reference's hand-rolled accumulating decorator
(reference: utils/utils.py:56-71) and adds real device traces via
``jax.profiler`` (SURVEY.md §5: "jax.profiler traces + the same bucket split").
"""

from __future__ import annotations

import contextlib
import functools
import threading
import time
from collections import defaultdict

_TOTALS: dict = defaultdict(float)
_TOTALS_LOCK = threading.Lock()
_COUNTS: dict = defaultdict(int)


def fn_timer(fn):
    """Accumulate total wall time per function; report with print_fn_timers."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            dt = time.perf_counter() - t0
            with _TOTALS_LOCK:  # loader worker threads share these
                _TOTALS[fn.__qualname__] += dt
                _COUNTS[fn.__qualname__] += 1

    return wrapper


def print_fn_timers():
    for name in sorted(_TOTALS, key=_TOTALS.get, reverse=True):
        print(f"{name}: total {_TOTALS[name]:.3f}s over {_COUNTS[name]} calls")


def reset_fn_timers():
    _TOTALS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/pnnp_trace"):
    """Capture a jax.profiler trace (TensorBoard-compatible) for the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
