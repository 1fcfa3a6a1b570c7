"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY §5).  These helpers expose the
JAX/XLA profiler so solver runs can be inspected in XProf/TensorBoard, plus a
simple device-time benchmark utility used by bench.py-style scripts.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable

import jax

__all__ = ["trace", "annotate", "device_time"]


@contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace of the enclosed block::

        with trace("/tmp/tv_profile"):
            solver.run_fixed(100)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler span (shows up on the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_time(fn: Callable, *args, reps: int = 10, warmup: int = 1) -> float:
    """Median wall time per call (seconds) with proper device sync."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
