"""Server logging / observability.

Reference: ``ServerLogger`` (cubecl-runtime/src/logging/server.rs:26-33)
with profile levels Minimal/Basic/Medium/Full (logging/profiling.rs:22),
compilation logging (full → dumps kernel source, kernel.rs:270-300) and
per-kernel duration aggregation.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Dict, Optional

log = logging.getLogger("cubecl_tpu")

LEVELS = ("none", "minimal", "basic", "medium", "full")


class ServerLogger:
    def __init__(self, name: str, profile_level: str = "minimal",
                 compile_log: str = "minimal"):
        self.name = name
        self.profile_level = profile_level
        self.compile_log = compile_log
        self.durations: Dict[str, list] = defaultdict(list)
        self.launches: Dict[str, int] = defaultdict(int)
        self.compiled: list = []

    @staticmethod
    def from_config(cfg: dict, name: str) -> "ServerLogger":
        return ServerLogger(
            name,
            profile_level=cfg.get("profiling", {}).get("level", "minimal"),
            compile_log=cfg.get("compilation", {}).get("log_level", "minimal"),
        )

    def log_compile(self, task, compiled) -> None:
        self.compiled.append(task.kernel_id.text)
        if self.compile_log in ("basic", "medium"):
            log.info("[%s] compiled kernel %s (%s)", self.name,
                     compiled.name, task.kernel_id.digest)
        elif self.compile_log == "full":
            log.info("[%s] compiled kernel %s (%s)\n%s", self.name,
                     compiled.name, task.kernel_id.digest, compiled.source)

    def log_launch(self, name: str, duration_s: Optional[float]) -> None:
        """Record one launch. ``duration_s`` is a DEVICE-slope duration
        when available (client.profile measures them per kernel at
        medium/full levels); plain dispatches log with None, which
        counts the launch without a duration — per-launch host timing
        through the tunnel would measure the RTT, not the kernel."""
        if self.profile_level in ("none",):
            return
        self.launches[name] += 1
        if duration_s is not None and self.profile_level != "minimal":
            self.durations[name].append(duration_s)
        if self.profile_level == "full" and duration_s is not None:
            log.info("[%s] launch %s %.3fms", self.name, name,
                     duration_s * 1e3)

    def summary(self) -> Dict[str, dict]:
        """Per-kernel aggregates (reference ServerLogger duration
        aggregation, logging/profiling.rs:22)."""
        out = {}
        for name in set(self.durations) | set(self.launches):
            durs = self.durations.get(name, [])
            entry = {"count": self.launches.get(name, len(durs))}
            if durs:
                entry.update({
                    "timed": len(durs),
                    "total_ms": sum(durs) * 1e3,
                    "mean_ms": sum(durs) / len(durs) * 1e3,
                })
            out[name] = entry
        return out
