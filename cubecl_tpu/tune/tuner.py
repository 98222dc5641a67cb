"""Tuner: benchmark-all-on-miss with pruning + roofline short-circuit.

Reference: ``Tuner::check_tune`` (cubecl-runtime/src/tune/tuner.rs:212-263),
candidate scheduling (tune/schedule.rs:27-47), roofline time bounds from
device peaks (tune/bounds_generator.rs:46-113), output cross-validation
under autotune-checks (tune/local.rs:100-117).

Timing: each candidate's launch sequence is captured as a Graph and timed
with the chained-slope harness (``runtime.profile.time_graph``) — per-call
host timing through the axon tunnel measures the 15-30ms RTT, not the chip
(BENCH_NOTES.md hazards 1+2), and the reference's equivalent is device
timestamps around the tune benchmark (tune/tune_benchmark.rs:26).
Candidates whose compiled kernels exceed the scoped-VMEM budget are pruned
by ``validate_compiled`` during capture, BEFORE any remote AOT compile.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ..runtime.config import runtime_config
from .cache import TuneCache
from .operation import TunableSet, checksum

log = logging.getLogger("cubecl_tpu.tune")


def _tolerances(dtype) -> Tuple[float, float]:
    """Dtype-aware (rtol, atol) for autotune-checks cross-validation."""
    dt = np.dtype(dtype) if not hasattr(dtype, "kind") else dtype
    if dt.kind in "iub":
        return 0.0, 0.0
    if dt.itemsize >= 8:
        return 1e-10, 1e-12
    if dt.itemsize == 4:
        return 1e-4, 1e-6
    return 2e-2, 1e-3  # bf16/f16/fp8


class Tuner:
    def __init__(self, tunables: TunableSet, client,
                 level: Optional[str] = None, checks: bool = False):
        cfg = runtime_config().get("autotune", {})
        self.tunables = tunables
        self.client = client
        self.level = level or cfg.get("level", "balanced")
        self.checks = checks or bool(cfg.get("checks", False))
        # (name, exception) of candidates that crashed during
        # autotune-checks — recorded loudly, never swallowed
        self.check_failures: List[Tuple[str, Exception]] = []
        persistent = bool(cfg.get("cache", True))
        props = client.properties()
        self.cache = TuneCache(tunables.name, props.identity.fingerprint,
                               checksum(tunables), persistent)
        self.props = props
        # slope-timing repeats per candidate by level
        self.reps = {"minimal": 2, "balanced": 3, "extensive": 4,
                     "full": 5}.get(self.level, 3)

    # ------------------------------------------------------------------

    def execute(self, *args, **kwargs):
        key = self.tunables.generate_key(*args, **kwargs)
        idx = self.cache.get(key)
        if idx is None:
            idx = self._tune(key, *args, **kwargs)
        return self.tunables.tunables[idx].fn(*args, **kwargs)

    # ------------------------------------------------------------------

    def _time_bound(self, tunable, key) -> Optional[float]:
        """Roofline lower bound: a candidate within 5% of it cannot be
        beaten — short-circuit the search (reference Thresholds)."""
        if tunable.work is None:
            return None
        flops, bytes_ = tunable.work(key)
        gen = self.props.generation
        t = max(flops / gen.bf16_flops, bytes_ / gen.hbm_bw)
        return t

    def _bench_candidate(self, fn, inputs, kwargs) -> float:
        """Per-call seconds for one candidate: capture its launches into a
        Graph (compiling + VMEM-validating every kernel — a doomed
        candidate raises here before any remote AOT compile), then
        slope-time the captured sequence. Falls back to coarse host
        timing only if the candidate cannot be captured (e.g. it reads
        results mid-flight)."""
        from ..runtime.dry_run import real_run
        from ..runtime.profile import time_graph

        with real_run():  # autotune always executes (reference RealRun)
            self.client.start_capture()
            try:
                fn(*inputs, **kwargs)
            finally:
                # builds the Graph: compiles + VMEM-validates every
                # recorded kernel (raises on doomed candidates)
                graph = self.client.stop_capture()
            if graph.num_kernels > 0:
                return time_graph(self.client, graph, reps=self.reps)
            # nothing captured: candidate drives the device directly
            # (pure-jax candidate) — coarse host timing with sync
            fn(*inputs, **kwargs)  # warm (compile excluded from timing)
            self.client.sync()
            best = math.inf
            for _ in range(self.reps + 1):
                t0 = time.perf_counter()
                fn(*inputs, **kwargs)
                self.client.sync()
                best = min(best, time.perf_counter() - t0)
            return best

    def _tune(self, key, *args, **kwargs) -> int:
        inputs = self.tunables.generate_inputs(key, *args, **kwargs)
        best_idx: Optional[int] = None
        best_time = math.inf
        timings: Dict[str, float] = {}
        pruned: List[Tuple[str, str]] = []  # (name, reason) per dead candidate
        index_of = {id(t): i for i, t in
                    enumerate(self.tunables.tunables)}

        done = False
        for batch in self.tunables.plan(key):
            for t in batch:
                try:
                    per = self._bench_candidate(t.fn, inputs, kwargs)
                except Exception as e:  # unsupported / VMEM-pruned
                    log.debug("tunable %s pruned for %s: %s",
                              t.name, key, e)
                    pruned.append((t.name, repr(e)))
                    continue
                timings[t.name] = per
                if per < best_time:
                    best_time = per
                    best_idx = index_of[id(t)]
                # short-circuit: within 5% of roofline — can't do
                # better. A measurement far BELOW the roofline is
                # physically impossible (harness failure): never
                # short-circuit on it, and distrust it as a winner.
                bound = self._time_bound(t, key)
                if bound is not None and per < bound * 0.5:
                    log.warning(
                        "autotune %s: %s measured %.3fms, below the "
                        "roofline bound %.3fms — timing suspect, ignored",
                        self.tunables.name, t.name, per * 1e3, bound * 1e3)
                    timings.pop(t.name, None)
                    if best_idx == index_of[id(t)]:
                        best_idx, best_time = None, math.inf
                        name_to_idx = {tt.name: i for i, tt in
                                       enumerate(self.tunables.tunables)}
                        for nm, tv in timings.items():
                            if tv < best_time:
                                best_time = tv
                                best_idx = name_to_idx[nm]
                    continue
                if bound is not None and per < bound * 1.05:
                    done = True
                    break
            if done or (best_idx is not None and self.level == "minimal"):
                break  # minimal level: first viable batch wins

        if best_idx is None:
            # zero survivors must fail LOUDLY with per-candidate reasons —
            # a silent fallback here is how round 3 shipped fp8 at the
            # bf16 tile (BENCH_r03 "fp8 autotune failed" regression)
            reasons = "; ".join(f"{n}: {r}" for n, r in pruned) or "no candidates"
            raise RuntimeError(
                f"no viable tunable for {self.tunables.name} key={key} — "
                f"every candidate failed: {reasons}")
        if self.checks:
            self._cross_validate(inputs, kwargs)
        best = self.tunables.tunables[best_idx]
        log.info("autotune %s key=%s -> %s (%.3fms)", self.tunables.name,
                 key, best.name, best_time * 1e3)
        self.cache.put(key, best_idx, best.name,
                       {k: v for k, v in timings.items()})
        return best_idx

    def _cross_validate(self, inputs, kwargs) -> None:
        """autotune-checks: all candidates must produce matching outputs.

        Candidates usually write device handles and return None, so the
        outputs are discovered by capturing each candidate's launches
        (the Graph knows which handles it writes), running it for real,
        and reading those handles; tolerances are dtype-aware."""
        from ..runtime.dry_run import real_run

        ref = None
        compared = 0
        for t in self.tunables.tunables:
            try:
                self.client.start_capture()
                try:
                    t.fn(*inputs, **kwargs)
                finally:
                    graph = self.client.stop_capture()
                if graph.num_kernels:
                    with real_run():
                        t.fn(*inputs, **kwargs)
                    arrs = [np.asarray(self.client.read_one(
                        graph._handles[hid]))
                        for hid in graph._output_ids]
                else:
                    with real_run():
                        out = t.fn(*inputs, **kwargs)
                    if out is None:
                        continue
                    arrs = [np.asarray(out)]
            except Exception as exc:  # noqa: BLE001
                # a candidate that CRASHES during checks must not vanish
                # silently (reference treats check failures loudly,
                # tune/local.rs:100-117) — record + warn; comparison
                # continues with the candidates that did run
                self.check_failures.append((t.name, exc))
                log.warning(
                    "autotune-checks: candidate %s crashed during "
                    "cross-validation and was skipped: %r", t.name, exc)
                continue
            compared += 1
            if ref is None:
                ref = (t.name, arrs)
                continue
            for r, a in zip(ref[1], arrs):
                rtol, atol = _tolerances(a.dtype)
                if not np.allclose(r.astype(np.float64),
                                   a.astype(np.float64),
                                   rtol=rtol, atol=atol):
                    raise AssertionError(
                        f"autotune-checks: {t.name} disagrees with "
                        f"{ref[0]} (rtol={rtol}, atol={atol})")
        if compared == 0 and self.check_failures:
            raise AssertionError(
                "autotune-checks: every candidate crashed during "
                f"cross-validation: {[n for n, _ in self.check_failures]}")


class LocalTuner:
    """Static per-key tuner registry (reference LocalTuner, tune/local.rs:17
    and the local_tuner! macro).

    Unlike the reference (whose TunableSet is one static object and the key
    carries all shape/dtype variation), callers here build a fresh TunableSet
    per call with shapes/dtypes baked into the candidate closures. The
    registry therefore keys Tuners by (device fingerprint, tune key,
    candidate checksum) — round 3 keyed by fingerprint only, so an fp8
    matmul reused the bf16 call's Tuner (stale key_fn closure → bf16 cache
    hit → bf16 candidates silently ran and the fp8 key was never recorded:
    the BENCH_r03 'fp8 autotune failed … bf16 tile fallback' regression)."""

    def __init__(self, name: str):
        self.name = name
        self._tuners: Dict[Tuple[str, str, str], Tuner] = {}

    def execute(self, client, tunables: TunableSet, *args, **kwargs):
        fp = client.properties().identity.fingerprint
        key = tunables.generate_key(*args, **kwargs)
        reg = (fp, str(key), checksum(tunables))
        tuner = self._tuners.get(reg)
        if tuner is None:
            tuner = Tuner(tunables, client)
            self._tuners[reg] = tuner
        return tuner.execute(*args, **kwargs)

    def tuner_for(self, client, key) -> Optional[Tuner]:
        """The Tuner that tuned ``key`` on this client's device (any
        checksum), or None if this process never tuned it."""
        fp = client.properties().identity.fingerprint
        for (rfp, rkey, _ck), tuner in self._tuners.items():
            if rfp == fp and rkey == str(key):
                return tuner
        return None
