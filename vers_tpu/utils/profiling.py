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


def device_sync(result):
    """Wait until ``result`` (a pytree of jax arrays) has actually been
    computed. ``jax.block_until_ready`` is unreliable on remote/tunnel
    platforms (it can acknowledge at dispatch), so this forces a tiny
    host transfer of the first leaf — the only sync that provably waits
    for the device queue to drain."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(result):
        # SearchResult and friends: sync their array attributes instead
        x = getattr(leaf, "ids", leaf)
        ndim = getattr(x, "ndim", None)
        if ndim is None:
            continue
        np.asarray(x[(slice(0, 1),) * ndim])
        break
    return result


def timed_device(
    fn: Callable, *args, warmup: int = 1, iters: int = 5, depth: int = 1, **kw
):
    """Time a device function with compile warmup and a forced host
    sync. Returns (best_seconds_per_call, last_result).

    ``depth``: calls chained per timed iteration with ONE sync at the
    end. With depth=1 every measurement pays the full host<->device
    round-trip (~30ms on the axon tunnel) — that is latency, not
    throughput. depth>1 amortizes the round-trip the way any real
    serving pipeline does (keep the device queue non-empty), so it
    measures sustained device throughput."""
    result = None
    for _ in range(max(warmup, 0)):
        result = device_sync(fn(*args, **kw))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        for _ in range(max(depth, 1)):
            result = fn(*args, **kw)
        device_sync(result)
        best = min(best, (time.perf_counter() - t0) / max(depth, 1))
    return best, result


def tunnel_canary(calls: int = 3) -> float:
    """Average per-call latency of a trivial cached jitted call — the
    health probe for remote-tunneled device platforms (CLAUDE.md's
    canary recipe). A healthy tunnel returns < ~0.2s/call; long
    stretches of multi-second trivial calls mean the service is
    degraded and any timing taken in that window measures the tunnel,
    not the code. Pays one tiny compile on first use."""
    import jax.numpy as jnp

    a = jnp.ones((64, 64))
    f = jax.jit(lambda x: (x * 5).sum())
    float(f(a))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(max(calls, 1)):
        float(f(a))
    return (time.perf_counter() - t0) / max(calls, 1)


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent jit-compilation cache. On this hardware the index
    builds EXECUTE in ~0.1s but their first compile takes minutes via
    the remote compile service — the cache makes every later process
    reuse compiled executables. Call early (before first jit).

    Default location is ``.jax_cache/`` at the repo root (override via
    ``VERS_JAX_CACHE``), NOT /tmp: periodic /tmp wipes cold-started the
    whole program set twice (2026-08-20 end-of-round, 2026-08-21 r5) and
    a cold first jit can queue 13+ min behind other tenants' remote
    compiles. Falls back to /tmp/vers_tpu_jax_cache if the repo dir
    isn't writable."""
    import os

    if path is None:
        path = os.environ.get("VERS_JAX_CACHE")
    if path is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        path = "/tmp/vers_tpu_jax_cache"
        os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERYTHING, including sub-second programs: on this
        # hardware even a trivial compile goes through the remote
        # compile service, whose queue can block for tens of minutes
        # behind other tenants' long compiles — a fresh process's first
        # tiny jit (the tunnel canary!) stalls exactly like a big one.
        # Observed 2026-08-20: three fresh processes each stalled
        # 25-40 min at tunnel_canary while cached programs sailed.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
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
