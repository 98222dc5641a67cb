"""Tuner: benchmark-all-on-miss with early elimination + roofline bounds.

Reference: ``Tuner::check_tune`` (cubecl-runtime/src/tune/tuner.rs:212-263),
round-robin benchmarking with early elimination and short-circuit
(tune/schedule.rs:27-47), roofline time bounds from device peaks
(tune/bounds_generator.rs:46-113), output cross-validation under
autotune-checks (tune/local.rs:100-117).
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


class Tuner:
    def __init__(self, tunables: TunableSet, client,
                 level: Optional[str] = None, checks: bool = False):
        cfg = runtime_config().get("autotune", {})
        self.tunables = tunables
        self.client = client
        self.level = level or cfg.get("level", "balanced")
        self.checks = checks or bool(cfg.get("checks", False))
        persistent = bool(cfg.get("cache", True))
        props = client.properties()
        self.cache = TuneCache(tunables.name, props.identity.fingerprint,
                               checksum(tunables), persistent)
        self.props = props

    # ------------------------------------------------------------------

    def execute(self, *args, **kwargs):
        key = self.tunables.generate_key(*args, **kwargs)
        idx = self.cache.get(key)
        if idx is None:
            idx = self._tune(key, *args, **kwargs)
        return self.tunables.tunables[idx].fn(*args, **kwargs)

    # ------------------------------------------------------------------

    def _time_bound(self, tunable, key) -> Optional[float]:
        """Roofline lower bound × slack: candidates slower than the current
        best already exceeding the bound are cut (reference Thresholds)."""
        if tunable.work is None:
            return None
        flops, bytes_ = tunable.work(key)
        gen = self.props.generation
        t = max(flops / gen.bf16_flops, bytes_ / gen.hbm_bw)
        return t

    def _bench_once(self, fn, args, kwargs) -> float:
        from ..runtime.dry_run import real_run

        with real_run():  # autotune always executes (reference RealRun)
            t0 = time.perf_counter()
            fn(*args, **kwargs)
            self.client.sync()
            return time.perf_counter() - t0

    def _tune(self, key, *args, **kwargs) -> int:
        inputs = self.tunables.generate_inputs(key, *args, **kwargs)
        samples = {"minimal": 3, "balanced": 5, "extensive": 8,
                   "full": 10}.get(self.level, 5)
        best_idx: Optional[int] = None
        best_time = math.inf
        timings: Dict[str, float] = {}
        outputs: Dict[int, Any] = {}
        flat = [t for batch in self.tunables.plan(key) for t in batch]
        index_of = {id(t): i for i, t in
                    enumerate(self.tunables.tunables)}

        for batch in self.tunables.plan(key):
            alive: List[Tuple[Any, List[float]]] = []
            for t in batch:
                try:
                    warm = self._bench_once(t.fn, inputs, kwargs)
                except Exception as e:  # candidate unsupported for this key
                    log.debug("tunable %s failed for %s: %s", t.name, key, e)
                    continue
                alive.append((t, [warm]))
            # round-robin with early elimination (reference schedule.rs)
            for _round in range(samples):
                still = []
                for t, durs in alive:
                    d = self._bench_once(t.fn, inputs, kwargs)
                    durs.append(d)
                    med = sorted(durs)[len(durs) // 2]
                    # eliminate: 3× slower than best so far after 2 rounds
                    if len(durs) >= 3 and med > 3 * best_time:
                        timings[t.name] = med
                        continue
                    still.append((t, durs))
                    if med < best_time:
                        best_time = med
                        best_idx = index_of[id(t)]
                alive = still
            for t, durs in alive:
                med = sorted(durs)[len(durs) // 2]
                timings[t.name] = med
                if med < best_time or best_idx is None:
                    best_time = med
                    best_idx = index_of[id(t)]
                # short-circuit: within 5% of roofline — can't do better
                bound = self._time_bound(t, key)
                if bound is not None and med < bound * 1.05:
                    break
            if best_idx is not None and self.level == "minimal":
                break  # minimal level: first viable batch wins

        if best_idx is None:
            raise RuntimeError(
                f"no viable tunable for {self.tunables.name} key={key}")
        if self.checks:
            self._cross_validate(inputs, kwargs)
        best = self.tunables.tunables[best_idx]
        log.info("autotune %s key=%s -> %s (%.3fms)", self.tunables.name,
                 key, best.name, best_time * 1e3)
        self.cache.put(key, best_idx, best.name,
                       {k: v for k, v in timings.items()})
        return best_idx

    def _cross_validate(self, inputs, kwargs) -> None:
        """autotune-checks: all candidates must produce matching outputs."""
        ref = None
        for t in self.tunables.tunables:
            try:
                out = t.fn(*inputs, **kwargs)
            except Exception:
                continue
            arr = np.asarray(out)
            if ref is None:
                ref = (t.name, arr)
            elif not np.allclose(ref[1], arr, rtol=1e-2, atol=1e-3):
                raise AssertionError(
                    f"autotune-checks: {t.name} disagrees with {ref[0]}")


class LocalTuner:
    """Static per-key tuner registry (reference LocalTuner, tune/local.rs:17
    and the local_tuner! macro)."""

    def __init__(self, name: str):
        self.name = name
        self._tuners: Dict[str, Tuner] = {}

    def execute(self, client, tunables: TunableSet, *args, **kwargs):
        fp = client.properties().identity.fingerprint
        tuner = self._tuners.get(fp)
        if tuner is None:
            tuner = Tuner(tunables, client)
            self._tuners[fp] = tuner
        return tuner.execute(*args, **kwargs)
