"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

Thin, dependency-free wrappers over ``jax.profiler``: named trace annotations
around train steps and kernels (visible in XProf/Perfetto), plus a
programmatic trace capture helper and a simple wall-clock step timer for
host-side logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["annotate", "trace", "StepTimer"]


def annotate(name: str):
    """Named trace annotation usable as decorator or context manager.

    Shows up as a span in the device trace; adds no overhead outside
    profiling sessions (jax.profiler.TraceAnnotation is a no-op then).
    """
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace of the enclosed block into ``log_dir``
    (view with XProf / tensorboard-plugin-profile / Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_trace=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side steps/sec meter with warmup exclusion.

    Uses explicit ``block_until_ready`` on a probe value per window so the
    numbers mean device time, not dispatch time.
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None
        self._timed_steps = 0

    def tick(self, probe=None) -> Optional[float]:
        """Call once per step; returns steps/sec so far (None during warmup).
        ``probe``: a device value to block on before reading the clock."""
        if probe is not None:
            jax.block_until_ready(probe)
        self._count += 1
        if self._count <= self.warmup:
            return None
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._timed_steps = 0
            return None
        self._timed_steps += 1
        dt = time.perf_counter() - self._t0
        return self._timed_steps / dt if dt > 0 else None
