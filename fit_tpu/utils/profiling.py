"""Profiling: jax.profiler traces + a forced-completion timing harness.

TPU-native replacement for the reference's Lightning ``AdvancedProfiler``
(cProfile, ``/root/reference/FiT/train.py:281``) and the manual dataloader
cProfile harness (``masked_FiT/test.py``): device-side traces go to
TensorBoard/XProf format via ``jax.profiler``; wall-clock timing uses a host
readback barrier, because on some PJRT transports ``block_until_ready``
returns at dispatch time (observed on this image's axon backend).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np

__all__ = ["trace", "timeit", "force_completion"]


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/profile"):`` — view with TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(out) -> None:
    """Block until ``out`` is actually computed (host readback of one leaf)."""
    leaves = jax.tree.leaves(out)
    if leaves:
        x = leaves[0]
        jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x)


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs) -> dict:
    """Robust wall-clock timing: returns {mean_ms, p50_ms, min_ms, iters}."""
    for _ in range(warmup):
        force_completion(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_completion(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.median(times) * 1e3),
        "min_ms": float(times.min() * 1e3),
        "iters": iters,
    }
