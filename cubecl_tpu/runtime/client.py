"""ComputeClient — the user-facing device handle.

Reference: ``ComputeClient`` (cubecl-runtime/src/client.rs:41): create/
read/write/empty, launch, sync, profile, memory_usage, cross-device copy.
Clients are cheap clones sharing the device actor (client.rs:149-158);
every operation crosses the actor boundary via ``submit``.
"""

from __future__ import annotations

import time
from typing import Any, List, Optional, Sequence

import numpy as np

from ..ir.features import DeviceProperties
from .actor import DeviceHandle
from .handle import Handle
from .kernel import KernelTask
from .profile import ProfileDuration, TimestampProfiler


class ComputeClient:
    def __init__(self, device_handle: DeviceHandle, runtime=None):
        self._dev = device_handle
        self.runtime = runtime
        self._profiler = TimestampProfiler()

    # ------------------------------------------------------------- memory

    def create(self, data) -> Handle:
        """Upload host data (reference client.create)."""
        return self._dev.call(lambda s: s.create(data))

    def create_from_slice(self, data) -> Handle:
        return self.create(np.asarray(data))

    def empty(self, shape, dtype="float32") -> Handle:
        if isinstance(shape, int):
            shape = (shape,)
        return self._dev.call(lambda s: s.empty(shape, dtype))

    def read(self, handles: Sequence[Handle]) -> List[np.ndarray]:
        return self._dev.call(lambda s: s.read(handles))

    def read_one(self, handle: Handle) -> np.ndarray:
        return self.read([handle])[0]

    def read_lazy(self, handle: Handle):
        """Lazy read (reference client.read_lazy, client.rs:317): returns a
        zero-copy view that materializes on first host access — jax arrays
        already have exactly this semantic, so hand back the array."""
        return handle.array

    def write(self, handle: Handle, data) -> None:
        self._dev.call(lambda s: s.write(handle, data))

    def free(self, handle: Handle) -> None:
        self._dev.call(lambda s: s.free(handle))

    # ---------------------------------------------------------- execution

    def launch(self, task: KernelTask, buffers: Sequence[Handle],
               scalars: Sequence[Any] = ()) -> None:
        cap = getattr(self, "_capture", None)
        if cap is not None:
            cap.record(task, buffers, scalars)
            return
        idx = self.current_stream()
        self._dev.call(lambda s: s.launch(task, buffers, scalars,
                                          stream=idx))

    # ------------------------------------------------------------ streams

    def _streams(self):
        """Client-side stream IDENTITY (policy + per-thread pinning); the
        scheduler/queues live on the server (reference WgpuServer owns
        its SchedulerMultiStream, compute/server.rs:66-82)."""
        pool = getattr(self, "_stream_pool", None)
        if pool is None:
            from .config import runtime_config
            from .stream import StreamPool

            sched = self._dev.call(lambda s: s.scheduler)
            pool = StreamPool(
                sched,
                policy=runtime_config().get("streaming", {})
                .get("policy", "per_task"))
            self._stream_pool = pool
        return pool

    def _flush_streams(self) -> None:
        self._dev.call(lambda s: s.flush_streams())

    # ------------------------------------------------------- graph capture

    def graph_prepare(self) -> None:
        """Arm persistent allocation for capture (reference graph_prepare,
        client.rs:998 + memory_manage.rs:135). Device memory is XLA-owned
        here; recorded handles are pinned by the Graph itself."""
        self._dev.call(lambda s: s.memory.allocation_mode("persistent"))

    def start_capture(self) -> None:
        """Begin recording launches instead of executing them (reference
        start_capture, client.rs:1011)."""
        from .graph import CaptureState

        if getattr(self, "_capture", None) is not None:
            raise RuntimeError("capture already active")
        self._flush_streams()
        self._capture = CaptureState()

    def stop_capture(self):
        """Finish recording → compiled Graph (reference stop_capture,
        client.rs:1020)."""
        from .graph import Graph

        cap = getattr(self, "_capture", None)
        if cap is None:
            raise RuntimeError("no active capture")
        self._capture = None
        self._dev.call(lambda s: s.memory.allocation_mode("auto"))
        return Graph(self, cap.recorded, cap.handles)

    def sync(self) -> None:
        self._dev.call(lambda s: s.sync())

    def flush(self) -> None:
        self._dev.call(lambda s: s.flush())

    # -------------------------------------------------------------- info

    def properties(self) -> DeviceProperties:
        return self._dev.call(lambda s: s.properties())

    def memory_usage(self):
        return self._dev.call(lambda s: s.memory_usage())

    # ---------------------------------------------------------- profiling

    def profile(self, fn, *args, **kwargs) -> ProfileDuration:
        """Time a closure of device work (reference client.profile,
        client.rs:1167 with TimingMethod::Device, profile.rs:59-93).

        When the closure is a pure launch sequence it is captured as a
        Graph, executed once for its real effects, and then slope-timed
        with the tunnel-proof harness — a DEVICE-true duration (method
        "device"). At profile levels medium/full each distinct kernel in
        the sequence is additionally slope-timed individually and fed to
        ``ServerLogger.log_launch`` so ``profile_summary()`` reports
        per-kernel aggregates. Closures that cannot be captured (they
        read results mid-flight, or do pure-jax work) fall back to host
        timestamps around a sync (TimestampProfiler,
        timestamp_profiler.rs:10)."""
        self.sync()
        graph = None
        try:
            self.start_capture()
            try:
                fn(*args, **kwargs)
            finally:
                graph = self.stop_capture()
        except Exception:  # noqa: BLE001 — not capturable: host timing
            graph = None
        if graph is None or graph.num_kernels == 0:
            self.sync()
            start = time.perf_counter()
            fn(*args, **kwargs)
            self.sync()
            return ProfileDuration(seconds=time.perf_counter() - start,
                                   method="system")
        graph.replay()  # the closure's real effects happen exactly once
        self.sync()
        from .profile import time_graph

        per = time_graph(self, graph)
        logger = self._dev.call(lambda s: s.logger)
        if logger is not None:
            if logger.profile_level in ("medium", "full"):
                self._profile_kernels(graph, logger)
            else:
                logger.log_launch(f"graph[{graph.num_kernels}]", per)
        return ProfileDuration(seconds=per, method="device")

    def _profile_kernels(self, graph, logger) -> None:
        """Slope-time each distinct kernel in a captured graph and feed
        the per-kernel durations to the server logger.

        Caveat: individual kernels execute one per dispatch here, so each
        duration includes the per-execute dispatch overhead (~0.1-0.3ms
        through the tunnel) — accurate for >=1ms kernels, an upper bound
        for tiny ones. The whole-graph ProfileDuration amortizes that
        overhead across the sequence and is the accurate aggregate."""
        import numpy as np

        from .profile import seq_slope_time

        per_kernel: dict = {}
        for rec in graph._recorded:
            key = str(rec.task.kernel_id)
            if key not in per_kernel:
                compiled, tfn = self._dev.call(
                    lambda s, t=rec.task: s.timing_fn(t))
                bufs = [graph._handles[h].array for h in rec.buffer_ids]
                sc = tuple(rec.scalars)

                def read_back(outs):
                    if outs:
                        np.asarray(outs[0].reshape(-1)[:1])

                per_kernel[key] = (compiled.name, seq_slope_time(
                    lambda: tfn(bufs, sc), read_back, reps=2))
            name, dur = per_kernel[key]
            logger.log_launch(name, dur)

    def profile_summary(self) -> dict:
        """Per-kernel launch/duration aggregates (reference
        ServerLogger::summary)."""
        logger = self._dev.call(lambda s: s.logger)
        return logger.summary() if logger is not None else {}

    def start_trace(self, log_dir: str) -> None:
        """Device-level tracing (reference ProfileLevel::Full device
        timing / wgpu query sets): wraps jax.profiler — open the dump
        with TensorBoard or xprof for per-kernel device timelines."""
        import jax

        jax.profiler.start_trace(log_dir)

    def stop_trace(self) -> None:
        import jax

        self.sync()
        jax.profiler.stop_trace()

    # ----------------------------------------------------------- parity API

    def io_optimized_vector_sizes(self, n_elems: int,
                                  dtype_size: int = 4):
        """Profitable line sizes for IO-bound kernels (reference
        client.io_optimized_vector_sizes, client.rs:1322) — lane-width
        aware on TPU."""
        from ..frontend.launch_util import io_optimized_line_sizes

        return io_optimized_line_sizes(n_elems, dtype_size)

    def measure_throughput(self, mode: str = "memory") -> float:
        """Measured device peak for a ThroughputMode (reference
        client.measure_throughput, client.rs:1343); cached persistently."""
        from ..std.throughput import ThroughputCache

        return ThroughputCache(self).get(mode)

    def set_stream(self, index) -> None:
        """Pin subsequent work to a logical stream (reference
        client.set_stream; runtime_tests/stream.rs). Dispatch-order only on
        TPU — data dependencies are tracked by the arrays themselves."""
        self._streams().set_stream(index)

    def current_stream(self) -> int:
        return self._streams().current()

    def set_stream(self, index) -> None:
        """Pin subsequent work to a logical stream (reference
        client.set_stream; runtime_tests/stream.rs). Dispatch-order only on
        TPU — data dependencies are tracked by the arrays themselves."""
        self._streams().set_stream(index)

    def read_tensor(self, handle: Handle, shape, strides=None):
        """Shape/stride-typed read (reference CopyDescriptor,
        server/base.rs:1017): returns a host array viewing the buffer with
        the given geometry."""
        import numpy as np

        flat = self.read_one(handle).reshape(-1)
        if strides is None:
            return flat[:int(np.prod(shape))].reshape(shape)
        return np.lib.stride_tricks.as_strided(
            flat, shape, [s * flat.itemsize for s in strides]).copy()

    # ------------------------------------------------------- cross-device

    def to_client(self, handle: Handle, other: "ComputeClient") -> Handle:
        """Cross-device copy (reference client.to_client, client.rs:723):
        direct device-to-device via jax.device_put (ICI path) instead of the
        reference's NCCL send/recv."""
        import jax

        target_dev = other._dev.call(lambda s: s.device)
        arr = jax.device_put(handle.array, target_dev)
        return other._dev.call(lambda s: s.create(arr))
