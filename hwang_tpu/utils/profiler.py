"""Span profiler for the decode pipeline.

The reference had a Profiler stubbed out everywhere (decoder_automata.h:72,
dummy now() at decoder_automata.cpp:25-28) with interval names still in
comments: get_frames_wait, get_frames, frames_used/decoded/fed,
ffmpeg:send_packet/receive_frame, map_frame...  This is a working
equivalent: nestable host-side spans + counters, plus an optional
jax.profiler trace for the device side (view with xprof/tensorboard).

Usage:
    prof = Profiler()
    with prof.span("entropy_decode"):
        ...
    prof.increment("frames_decoded", n)
    print(prof.report())

Pipeline/automata objects accept a `profiler=` so callers can inspect
where time goes; a module-level `PROFILER` is used when none is passed.
"""

from __future__ import annotations

import collections
import contextlib
import threading
import time


class Profiler:
    def __init__(self):
        self._lock = threading.Lock()
        self.intervals: dict[str, list[float]] = collections.defaultdict(list)
        self.counters: dict[str, int] = collections.defaultdict(int)
        # (t_start, t_end, name, thread) tuples for timeline dumps —
        # overlap debugging needs WHEN, not just how long
        self.events: list[tuple[float, float, str, str]] = []

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t1 = time.perf_counter()
            with self._lock:
                self.intervals[name].append(t1 - t0)
                self.events.append(
                    (t0, t1, name, threading.current_thread().name))

    def add_interval(self, name: str, seconds: float) -> None:
        t1 = time.perf_counter()
        with self._lock:
            self.intervals[name].append(seconds)
            self.events.append(
                (t1 - seconds, t1, name, threading.current_thread().name))

    def timeline(self) -> str:
        """Events relative to the earliest span start, sorted by start —
        the overlap picture the aggregate report can't show."""
        with self._lock:
            evs = sorted(self.events)
        if not evs:
            return "(no events)"
        t0 = evs[0][0]
        return "\n".join(
            f"{a - t0:8.3f} .. {b - t0:8.3f}  ({(b - a) * 1e3:7.1f}ms) "
            f"{name:28s} [{thr}]"
            for a, b, name, thr in evs
        )

    def increment(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counters[name] += n

    def reset(self) -> None:
        with self._lock:
            self.intervals.clear()
            self.counters.clear()
            self.events.clear()

    def totals(self) -> dict[str, float]:
        """Interval sums in seconds (for machine-readable stage budgets)."""
        with self._lock:
            return {k: sum(v) for k, v in self.intervals.items()}

    def report(self) -> str:
        lines = []
        with self._lock:
            for name in sorted(self.intervals):
                v = self.intervals[name]
                lines.append(
                    f"{name:32s} n={len(v):5d} total={sum(v)*1e3:9.1f}ms "
                    f"mean={sum(v)/len(v)*1e3:7.2f}ms"
                )
            for name in sorted(self.counters):
                lines.append(f"{name:32s} count={self.counters[name]}")
        return "\n".join(lines)

    @contextlib.contextmanager
    def device_trace(self, logdir: str):
        """Wrap a region in a jax.profiler trace (xprof format)."""
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


PROFILER = Profiler()
