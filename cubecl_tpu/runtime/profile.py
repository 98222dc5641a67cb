"""Profiling primitives.

Reference: ``ProfileDuration`` (cubecl-common/src/profile.rs:59-93) with
``TimingMethod{System,Device}`` (profile.rs:11), ``TimestampProfiler``
(cubecl-runtime/src/timestamp_profiler.rs:10), and the benchmark harness
(cubecl-common/src/benchmark.rs:16-280).
"""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field
from typing import Callable, List


@dataclass
class ProfileDuration:
    seconds: float
    method: str = "system"  # "system" | "device"

    @property
    def millis(self) -> float:
        return self.seconds * 1e3

    @property
    def micros(self) -> float:
        return self.seconds * 1e6


class TimestampProfiler:
    """Host-side start/stop timing fallback."""

    def __init__(self) -> None:
        self._start = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> ProfileDuration:
        assert self._start is not None
        d = time.perf_counter() - self._start
        self._start = None
        return ProfileDuration(d, "system")


@dataclass
class BenchmarkComputations:
    """Summary stats (reference BenchmarkComputations, benchmark.rs:97)."""

    mean: float
    median: float
    variance: float
    min: float
    max: float

    @staticmethod
    def from_durations(durations: List[float]) -> "BenchmarkComputations":
        return BenchmarkComputations(
            mean=statistics.fmean(durations),
            median=statistics.median(durations),
            variance=statistics.pvariance(durations) if len(durations) > 1 else 0.0,
            min=min(durations),
            max=max(durations),
        )


def benchmark(run: Callable[[], None], sync: Callable[[], None],
              warmup: int = 3, iters: int = 10) -> BenchmarkComputations:
    """Benchmark driver (reference BenchmarkDurations sampling)."""
    for _ in range(warmup):
        run()
    sync()
    durs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        sync()
        durs.append(time.perf_counter() - t0)
    return BenchmarkComputations.from_durations(durs)
