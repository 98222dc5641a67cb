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


def time_launch(client, kernel, cube_count, cube_dim, *args,
                lo: int = 4, hi: int = 20, reps: int = 3) -> float:
    """Per-launch DEVICE time of one kernel launch.

    Chains the compiled kernel ``hi`` (and ``lo``) times inside a
    device-side ``lax.fori_loop`` whose carry passes through
    ``jax.lax.optimization_barrier`` each iteration — this defeats
    CSE/LICM (a repeated pure launch would otherwise collapse to one)
    without adding memory traffic — and returns the slope
    ``(t_hi - t_lo) / (hi - lo)``, which cancels host / tunnel
    round-trip and dispatch overhead. The reference's equivalent is
    device-event timing around a CUDA-graph replay
    (cubecl-common/src/profile.rs TimingMethod::Device).

    ``args`` are the same ArrayArg/ScalarArg/comptime arguments a
    ``launch`` takes; buffers are read from the handles' current arrays.
    """
    import numpy as np

    import jax

    from ..frontend.cube import ArrayArg, ScalarArg, TensorArg

    ck = kernel.compile_only(client, cube_count, cube_dim, *args)
    bufs = tuple(a.handle.array for a in args
                 if isinstance(a, (ArrayArg, TensorArg)))
    scalars = tuple(a.value for a in args if isinstance(a, ScalarArg))

    mut = list(ck.mutable_indices)
    # a kernel whose stores cover its whole output IGNORES the out
    # operand's value — the barrier carry then creates no data dependency
    # and XLA hoists the repeated pure call out of the loop. Ping-pong
    # the output back into a same-shaped immutable input so every
    # iteration genuinely consumes the previous one's result.
    feed = None
    if mut:
        for ii in range(len(bufs)):
            if ii in mut:
                continue
            if (bufs[ii].shape == bufs[mut[0]].shape
                    and bufs[ii].dtype == bufs[mut[0]].dtype):
                feed = ii
                break

    def make(n):
        # carry ONLY the mutable buffers: a read-only input in the fori
        # carry gets copied every iteration (XLA cannot alias a loop
        # carry it must also keep live), which would bill the kernel for
        # a full extra read+write of its inputs — close over them instead
        def run(*all_bufs):
            # close over jit PARAMETERS (not concrete arrays — those would
            # ship as literal constants through the compile path)
            def body(_i, carry):
                import jax.numpy as jnp

                carry = jax.lax.optimization_barrier(carry)
                full = list(all_bufs)
                for j, mi in enumerate(mut):
                    full[mi] = carry[j]
                if feed is not None:
                    full[feed] = carry[0]
                    return tuple(ck.fn(full, scalars))
                # no feedable input: guard the call behind a carry-
                # dependent (always-true) cond so LICM cannot hoist it
                pred = jnp.isfinite(
                    carry[0].reshape(-1)[0].astype(jnp.float32)) \
                    if mut else jnp.bool_(True)
                return jax.lax.cond(
                    pred,
                    lambda: tuple(ck.fn(full, scalars)),
                    lambda: tuple(jnp.zeros_like(c) for c in carry))

            init = tuple(all_bufs[mi] for mi in mut)
            return jax.lax.fori_loop(0, n, body, init)

        return jax.jit(run)

    def timed(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn(*bufs)
            np.asarray(res[0].reshape(-1)[:1])  # D2H readback barrier
            best = min(best, time.perf_counter() - t0)
        return best

    flo, fhi = make(lo), make(hi)
    flo(*bufs), fhi(*bufs)  # compile
    client.sync()
    per = max((timed(fhi) - timed(flo)) / (hi - lo), 1e-9)
    # The tunnel adds +-2-4ms jitter per measurement; a slope whose
    # timed spread (hi-lo)*per is comparable to that is noise (round-1
    # reduce numbers moved 15% between sessions for exactly this
    # reason). Adaptively lengthen the chains until the spread is
    # ~40ms, then re-measure once at the reliable length.
    spread = (hi - lo) * per
    if spread < 0.040:
        # overshoot to ~60ms (ceil) — a floor to exactly 40 lands short
        # whenever the first estimate was itself optimistic
        scale = min(max(-(-0.060 // max(spread, 1e-6)), 2), 64)
        lo2, hi2 = int(lo * scale), int(hi * scale)
        flo2, fhi2 = make(lo2), make(hi2)
        flo2(*bufs), fhi2(*bufs)
        client.sync()
        per = max((timed(fhi2) - timed(flo2)) / (hi2 - lo2), 1e-9)
    return per


def seq_slope_time(run_once, read_back, reps: int = 3,
                   max_n: int = 512) -> float:
    """Per-call DEVICE time of a dispatched computation, tunnel-proof.

    ``run_once()`` dispatches one (async) execution and returns its
    outputs; ``read_back(outs)`` forces completion (1-element D2H).

    Design note (round 2): chaining calls inside one jitted ``fori_loop``
    is NOT safe generically — XLA strips ``optimization_barrier`` ties
    before loop-invariant code motion, so a kernel that ignores its
    output operand's value gets hoisted and the chain times as ~0
    (observed on hardware; see BENCH_NOTES.md). Sequential python-level
    executions are immune: separate PJRT executes cannot be CSE'd, and
    dispatch is async, so the tunnel RTT is paid once per *measurement*
    (cancelled by the slope), not once per call. The per-call dispatch
    overhead (~36us) is included — it is part of the real launch cost,
    as in the reference's tune benchmarks.

    The iteration counts adapt: a pilot estimates the per-call time, and
    (lo, hi) are sized so the timed spread dwarfs the tunnel's +-2-4ms
    jitter."""

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = None
            for _i in range(n):
                outs = run_once()
            read_back(outs)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run_n(1)
    t8 = run_n(8)
    est = max((t8 - t1) / 7, 1e-7)
    # spread target: well above jitter, but don't waste time on slow hosts
    target = min(max(4 * t1, 0.010), 0.050)
    hi = int(min(max(target / est, 16), max_n))
    lo = max(hi // 4, 1)
    tlo, thi = run_n(lo), run_n(hi)
    return max((thi - tlo) / (hi - lo), 1e-9)


def time_graph(client, graph, reps: int = 3) -> float:
    """Per-replay device time of a captured ``Graph`` via
    ``seq_slope_time`` — the tunnel-proof way to benchmark a launch
    sequence (used by autotune; reference tune/tune_benchmark.rs:26 with
    device timestamps)."""
    import numpy as np

    don = [graph._handles[hid].array for hid in graph._donate_ids]
    ro = [graph._handles[hid].array for hid in graph._ro_ids]
    jfn = graph._jfn  # non-donating jit: timing reuses the same inputs

    def run_once():
        return jfn(don, ro)

    def read_back(outs):
        np.asarray(outs[0].reshape(-1)[:1])

    return seq_slope_time(run_once, read_back, reps=reps)
