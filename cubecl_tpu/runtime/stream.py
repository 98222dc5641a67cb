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
    """Per-thread / explicit stream identity (StreamPolicy). ``set_stream``
    pins subsequent work to a logical stream (reference client.set_stream
    used by runtime_tests/stream.rs)."""

    def __init__(self, scheduler: SchedulerMultiStream):
        self.scheduler = scheduler
        self._tls = threading.local()

    def current(self) -> int:
        return getattr(self._tls, "stream", 0)

    def set_stream(self, index: Optional[int]) -> None:
        self._tls.stream = index or 0
