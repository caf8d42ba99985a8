"""Profiling instrumentation.

Reference parity: the Tracy macro layer + ProfiledAllocatorWrapper
(reference benchmarks/cpp/utils/tracy_wrapper.hpp:6-56,
profiled_page_allocator.hpp:11-122) — a decorator/context layer that is a
no-op unless enabled, plus jax.profiler trace capture for device timelines
(SURVEY.md §5.1 TPU equivalent).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import threading
import time
from collections import defaultdict
from typing import Optional

logger = logging.getLogger(__name__)

ENABLED = os.environ.get("PIE_PROFILE", "0") in ("1", "true", "True")

_zones: dict[str, list[float]] = defaultdict(list)
_zlock = threading.Lock()


@contextlib.contextmanager
def zone(name: str):
    """Host-side timing zone (PIE_PROFILE=1 to enable)."""
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        with _zlock:
            _zones[name].append(time.perf_counter() - t0)


def profiled(fn):
    """Decorator form of :func:`zone`."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with zone(fn.__qualname__):
            return fn(*a, **kw)

    return wrapper


def zone_report() -> dict[str, dict]:
    with _zlock:
        return {
            name: {
                "count": len(vs),
                "total_s": sum(vs),
                "mean_ms": 1e3 * sum(vs) / max(1, len(vs)),
            }
            for name, vs in sorted(_zones.items())
        }


def reset_zones():
    with _zlock:
        _zones.clear()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/pie_trace"):
    """Capture a jax.profiler device trace (Perfetto/Tensorboard viewable).
    Falls back to a no-op if the backend can't trace."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover
        logger.warning("device trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # pragma: no cover
                logger.exception("stop_trace failed")


class ProfiledAllocator:
    """Decorator around PageAllocator recording alloc/free latencies and
    pool utilization (the reference's ProfiledAllocatorWrapper role)."""

    def __init__(self, allocator):
        self._a = allocator

    def allocate(self):
        with zone("PageAllocator.allocate"):
            return self._a.allocate()

    def allocate_n(self, n):
        with zone("PageAllocator.allocate_n"):
            return self._a.allocate_n(n)

    def free(self, pid):
        with zone("PageAllocator.free"):
            return self._a.free(pid)

    def __getattr__(self, name):
        return getattr(self._a, name)
