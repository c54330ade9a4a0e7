"""Profiling helpers: block_until_ready-bracketed timers and
jax.profiler trace wrappers (the reference's analogue was samply +
Instant timing, SURVEY §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    def __init__(self):
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


def timed_device(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kw):
    """Time a device function with compile warmup and block_until_ready.
    Returns (best_seconds, last_result)."""
    result = None
    for _ in range(max(warmup, 0)):
        result = jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, result


def enable_compilation_cache(path: str = "/tmp/vers_tpu_jax_cache") -> None:
    """Persistent jit-compilation cache. On this hardware the index
    builds EXECUTE in ~0.1s but their first compile takes minutes via
    the remote compile service — the cache makes every later process
    reuse compiled executables. Call early (before first jit)."""
    import os

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


@contextlib.contextmanager
def trace(path: str = "/tmp/vers_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
