"""Multi-stream infrastructure — WIRED into the dispatch path.

Reference: ``MultiStream`` cursor/event sync across streams
(cubecl-runtime/src/stream/event.rs:23-88), ``SchedulerMultiStream`` task
batching with ``SchedulerStrategy{Interleave,Sequential}`` and a max_tasks
flush threshold (stream/scheduler.rs:10-46), ``StreamPool``
(stream/base.rs:14) and ``StreamPolicy`` (cubecl-environment/src/stream/
policy.rs:11-29).

TPU mapping: XLA's async dispatch queue is the single hardware stream;
logical streams order *dispatch*. ``client.launch`` enqueues here (after
eager compile+validate, so launch errors stay immediate) and queued
launches flush as ONE device-actor crossing — the batching that amortizes
per-launch Python overhead, which is what the reference's scheduler buys
on wgpu. Cross-stream data dependencies are detected from overlapping
handle ids: enqueuing a task that touches handles pending on another
stream flushes that stream first (the event-sync analogue of
``MultiStream::resolve``); correctness of device-side ordering is then
guaranteed by jax dataflow.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable, FrozenSet, List, Optional, Sequence


@dataclass
class StreamEvent:
    """Cursor event (reference stream/event.rs): marks a position in a
    stream another stream can wait on."""

    stream: int
    cursor: int


@dataclass
class _Queued:
    run: Callable[[Any], None]  # executed with the server at flush
    ids: FrozenSet[int] = frozenset()
    writes: FrozenSet[int] = frozenset()


class Stream:
    def __init__(self, index: int):
        self.index = index
        self.cursor = 0       # tasks ever enqueued (event positions)
        self.flushed = 0      # tasks already dispatched
        self.queue: List[_Queued] = []
        self.pending_ids: set = set()
        self.pending_writes: set = set()
        self.errors: List[BaseException] = []

    def record(self) -> StreamEvent:
        return StreamEvent(self.index, self.cursor)

    def is_healthy(self) -> bool:
        """False once a task dispatched from this stream failed — the
        reference's per-stream health probe (stream/event.rs:34). The
        errors themselves follow the lazy contract: queued on the server
        and raised at the next sync/read."""
        return not self.errors


class SchedulerMultiStream:
    """Launch queue with flush threshold + strategy (scheduler.rs:10-46).

    ``batch_exec`` receives the ordered list of queued ``run`` callables
    and executes them (the client passes one device-actor crossing for
    the whole batch). ``dispatch_count``/``task_count`` expose the
    batching ratio (dispatches < launches) to tests and logs."""

    def __init__(self, batch_exec: Optional[Callable] = None,
                 num_streams: int = 4, max_tasks: int = 16,
                 strategy: str = "interleave"):
        assert strategy in ("interleave", "sequential")
        self.streams = [Stream(i) for i in range(num_streams)]
        self.max_tasks = max_tasks
        self.strategy = strategy
        self.batch_exec = batch_exec or (lambda runs: [r(None) for r in runs])
        self._pending = 0
        self._lock = threading.RLock()
        self.dispatch_count = 0
        self.task_count = 0

    def stream(self, index: int) -> Stream:
        return self.streams[index % len(self.streams)]

    def enqueue(self, stream_idx: int, run: Callable[[Any], None],
                ids: Sequence[int] = (),
                writes: Sequence[int] = None) -> None:
        with self._lock:
            ids = frozenset(ids)
            # unknown write set -> treat every handle as written (safe)
            writes = frozenset(writes) if writes is not None else ids
            s = self.stream(stream_idx)
            # cross-stream TRUE dependency (read-after-write or
            # write-after-read/write on a shared handle): flush the other
            # stream first (event-sync analogue); read-read sharing is
            # not a conflict
            for other in self.streams:
                if other is not s and other.queue and (
                        other.pending_writes & ids
                        or other.pending_ids & writes):
                    self._flush_stream(other)
            s.queue.append(_Queued(run, ids, writes))
            s.pending_ids |= ids
            s.pending_writes |= writes
            s.cursor += 1
            self._pending += 1
            self.task_count += 1
            if self._pending >= self.max_tasks:
                self._flush_locked()

    def wait_event(self, stream_idx: int, event: StreamEvent) -> None:
        """Cross-stream ordering: dispatch the source stream up to the
        event cursor before continuing (resolve, stream/event.rs:50)."""
        with self._lock:
            src = self.stream(event.stream)
            if src.flushed < event.cursor:
                self._flush_stream(src)

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def is_healthy(self) -> bool:
        return all(s.is_healthy() for s in self.streams)

    def _guard(self, s: Stream, run: Callable) -> Callable:
        """Lazy-error capture (reference per-stream ServerError queues,
        server/base.rs:294): a task that fails during a batched flush
        must not abort the rest of the batch or surface at whatever
        enqueue happened to trip the threshold — it marks the stream
        unhealthy and queues on the server, raised at the next sync."""
        def go(srv):
            try:
                run(srv)
            except Exception as e:  # noqa: BLE001
                s.errors.append(e)
                q = getattr(srv, "error_queue", None)
                if q is None:
                    raise
                q.append(e)
        return go

    def _flush_stream(self, s: Stream) -> None:
        if not s.queue:
            return
        runs = [self._guard(s, q.run) for q in s.queue]
        n = len(s.queue)
        s.flushed += n
        self._pending -= n
        s.queue.clear()
        s.pending_ids.clear()
        s.pending_writes.clear()
        self.dispatch_count += 1
        self.batch_exec(runs)

    def _flush_locked(self) -> None:
        live = [[(s, item) for item in s.queue] for s in self.streams]
        for s in self.streams:
            s.flushed += len(s.queue)
            s.queue.clear()
            s.pending_ids.clear()
            s.pending_writes.clear()
        total = sum(len(q) for q in live)
        if not total:
            return
        self._pending -= total
        runs: List[Callable] = []
        if self.strategy == "interleave":
            # round-robin across streams (interleaved dispatch)
            while any(live):
                for q in live:
                    if q:
                        s, item = q.pop(0)
                        runs.append(self._guard(s, item.run))
        else:
            for q in live:
                runs.extend(self._guard(s, item.run) for s, item in q)
        self.dispatch_count += 1
        self.batch_exec(runs)


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
    def from_config(cfg: dict, batch_exec: Optional[Callable] = None
                    ) -> "StreamPool":
        sc = cfg.get("streaming", {})
        return StreamPool(
            SchedulerMultiStream(
                batch_exec=batch_exec,
                num_streams=int(sc.get("max_streams", 4)),
                max_tasks=int(sc.get("max_tasks", 16)),
                strategy=sc.get("strategy", "interleave")),
            policy=sc.get("policy", "per_task"))
