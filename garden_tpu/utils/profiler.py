"""Frame profiling.

Rebuild of the reference's observability stack (SURVEY.md section 5.1):
Tracy CPU zones (SET_CPU_ZONE_SCOPED, profiler.hpp:18-24), GPU debug labels
and frame timestamps (vulkan/command-buffer.cpp:419-431). TPU equivalents:
`zone()` wraps jax.named_scope (shows up in xplane traces) + wall timing;
`FrameProfiler` records per-pass block_until_ready deltas and frame marks;
`trace()` wraps jax.profiler trace capture for offline xplane analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def zone(name: str) -> Iterator[None]:
    """Named scope: appears in XLA/xplane traces (SET_CPU_ZONE_SCOPED)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (Tracy capture analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameProfiler:
    """Wall-clock pass timings with running averages (editor stats analog:
    lastFps + per-pass GPU time, editor.hpp:69)."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.averages: Dict[str, float] = defaultdict(float)
        self._start: Dict[str, float] = {}
        self._frame_start: Optional[float] = None
        self.frame_ms = 0.0
        self.fps = 0.0

    @contextlib.contextmanager
    def pass_timer(self, name: str, result=None) -> Iterator[None]:
        """Time a pass; pass the output array to block on for device time."""
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = (time.perf_counter() - t0) * 1000.0
        old = self.averages[name]
        self.averages[name] = old * self.smoothing + dt * (1 - self.smoothing) \
            if old else dt

    def frame_mark(self) -> None:
        """Call once per frame (Tracy FrameMark, graphics.cpp:455-457)."""
        now = time.perf_counter()
        if self._frame_start is not None:
            dt = (now - self._frame_start) * 1000.0
            self.frame_ms = self.frame_ms * self.smoothing + dt * (1 - self.smoothing) \
                if self.frame_ms else dt
            self.fps = 1000.0 / max(self.frame_ms, 1e-6)
        self._frame_start = now

    def report(self) -> str:
        lines = [f"frame: {self.frame_ms:.2f} ms ({self.fps:.1f} fps)"]
        for name, ms in sorted(self.averages.items()):
            lines.append(f"  {name}: {ms:.2f} ms")
        return "\n".join(lines)
