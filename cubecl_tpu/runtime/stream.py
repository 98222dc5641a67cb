"""Multi-stream infrastructure.

Reference: ``MultiStream`` cursor/event sync across streams
(cubecl-runtime/src/stream/event.rs:23-88), ``SchedulerMultiStream`` task
batching with ``SchedulerStrategy{Interleave,Sequential}`` and a max_tasks
flush threshold (stream/scheduler.rs:10-46), ``StreamPool``
(stream/base.rs:14) and ``StreamPolicy`` (cubecl-environment/src/stream/
policy.rs:11-29).

TPU mapping: XLA's async dispatch queue is the single hardware stream;
logical streams order *dispatch*. Data dependencies between launches are
tracked by jax arrays themselves, so cross-stream correctness is free —
what the scheduler adds is batching: queued tasks flush together, cutting
per-launch Python/dispatch overhead (the reference batches for the same
reason on wgpu).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional


@dataclass
class StreamEvent:
    """Cursor event (reference stream/event.rs): marks a position in a
    stream another stream can wait on."""

    stream: int
    cursor: int


class Stream:
    def __init__(self, index: int):
        self.index = index
        self.cursor = 0
        self.queue: List[Callable[[], None]] = []

    def record(self) -> StreamEvent:
        return StreamEvent(self.index, self.cursor)

    def is_healthy(self) -> bool:
        return True


class SchedulerMultiStream:
    """Task queue with flush threshold + strategy (scheduler.rs:10-46)."""

    def __init__(self, num_streams: int = 4, max_tasks: int = 16,
                 strategy: str = "interleave"):
        assert strategy in ("interleave", "sequential")
        self.streams = [Stream(i) for i in range(num_streams)]
        self.max_tasks = max_tasks
        self.strategy = strategy
        self._pending = 0
        self._lock = threading.Lock()

    def stream(self, index: int) -> Stream:
        return self.streams[index % len(self.streams)]

    def enqueue(self, stream_idx: int, task: Callable[[], None]) -> None:
        with self._lock:
            s = self.stream(stream_idx)
            s.queue.append(task)
            s.cursor += 1
            self._pending += 1
            if self._pending >= self.max_tasks:
                self._flush_locked()

    def wait_event(self, stream_idx: int, event: StreamEvent) -> None:
        """Cross-stream ordering: flush the source stream up to the event
        cursor before continuing (resolve, stream/event.rs:50)."""
        with self._lock:
            self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if self.strategy == "interleave":
            # round-robin across streams (interleaved dispatch)
            live = [list(s.queue) for s in self.streams]
            for s in self.streams:
                s.queue.clear()
            i = 0
            while any(live):
                for q in live:
                    if q:
                        q.pop(0)()
        else:
            for s in self.streams:
                for t in s.queue:
                    t()
                s.queue.clear()
        self._pending = 0


class StreamPool:
    """Stream identity under a ``StreamPolicy`` (reference
    cubecl-environment/src/stream/policy.rs:11-29: PerThread / PerTask /
    Single). ``set_stream`` pins subsequent work explicitly (reference
    client.set_stream used by runtime_tests/stream.rs); without a pin,
    the policy decides:

    - ``single``     — everything on stream 0
    - ``per_thread`` — stream id derived from the OS thread identity
    - ``per_task``   — explicit pins only (the reference's tokio
      task-stable id has no Python analogue; asyncio tasks run on one
      thread, so explicit pinning is the faithful mapping)
    """

    def __init__(self, scheduler: SchedulerMultiStream,
                 policy: str = "per_task"):
        assert policy in ("single", "per_thread", "per_task")
        self.scheduler = scheduler
        self.policy = policy
        self._tls = threading.local()

    def current(self) -> int:
        pinned = getattr(self._tls, "stream", None)
        if pinned is not None:
            return pinned
        if self.policy == "per_thread":
            n = len(self.scheduler.streams)
            return threading.get_ident() % n
        return 0

    def set_stream(self, index: Optional[int]) -> None:
        self._tls.stream = index

    @staticmethod
    def from_config(cfg: dict) -> "StreamPool":
        sc = cfg.get("streaming", {})
        return StreamPool(
            SchedulerMultiStream(
                num_streams=int(sc.get("max_streams", 4)),
                max_tasks=int(sc.get("max_tasks", 16)),
                strategy=sc.get("strategy", "interleave")),
            policy=sc.get("policy", "per_task"))
