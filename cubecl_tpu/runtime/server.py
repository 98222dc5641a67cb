"""Compute servers.

Reference: ``ComputeServer`` trait (cubecl-runtime/src/server/base.rs:359)
with the CUDA implementation (cubecl-cuda/src/compute/server.rs:169) as the
model: per-device state, compile-if-miss (context.rs:106-230), lazy error
queues drained at sync (server/base.rs:294; tests/dummy/server.rs:36-41).

``TpuServer`` owns one jax device. Kernel execution is functional: the
compiled pallas callable returns updated mutable buffers and the server
rebinds handles; XLA donation makes this in-place on device."""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..backend.compiler import CompiledKernel, Compiler, KernelDefinition
from ..ir.features import DeviceProperties
from .handle import Handle
from .kernel import KernelId, KernelTask
from .memory import MemoryManagement


class ServerError(RuntimeError):
    pass


class ComputeServer:
    """Server interface (reference server/base.rs:359-554)."""

    name = "abstract"

    # memory
    def create(self, data) -> Handle: ...
    def empty(self, shape, dtype) -> Handle: ...
    def read(self, handles: Sequence[Handle]) -> List[np.ndarray]: ...
    def write(self, handle: Handle, data) -> None: ...
    # execution
    def launch(self, task: KernelTask, buffers: Sequence[Handle],
               scalars: Sequence[Any]) -> None: ...
    def sync(self) -> None: ...
    def flush(self) -> None: ...
    # info
    def properties(self) -> DeviceProperties: ...
    def memory_usage(self): ...


class JaxServer(ComputeServer):
    """Shared implementation for the TPU server and the CPU-interpret server
    (the DummyServer analogue for TPU-less CI,
    reference cubecl-runtime/tests/dummy/server.rs:29-42)."""

    def __init__(self, device, compiler: Compiler, props: DeviceProperties,
                 name: str, logger=None, config: Optional[dict] = None):
        import jax

        self.jax = jax
        self.device = device
        self.compiler = compiler
        self.props = props
        self.name = name
        self.logger = logger
        self.memory = MemoryManagement(config)
        from .config import runtime_config
        from .stream import SchedulerMultiStream

        sc = (config or runtime_config()).get("streaming", {})
        self.scheduler = SchedulerMultiStream(
            batch_exec=lambda runs: [r(self) for r in runs],
            num_streams=int(sc.get("max_streams", 4)),
            max_tasks=int(sc.get("max_tasks", 16)),
            strategy=sc.get("strategy", "interleave"))
        self.error_queue: List[BaseException] = []
        self._cache: Dict[str, Tuple[CompiledKernel, Callable]] = {}
        self._persistent = None  # set by runtime (persistent kernel store)
        self._stream_cursor = 0
        self.compile_count = 0
        self.launch_count = 0

    # ------------------------------------------------------------- memory

    def create(self, data) -> Handle:
        import jax

        arr = jax.device_put(data, self.device)
        h = Handle(arr, self)
        self.memory.on_alloc(h.id, h.size_bytes)
        return h

    def empty(self, shape, dtype) -> Handle:
        import jax
        import jax.numpy as jnp

        with jax.default_device(self.device):
            arr = jnp.zeros(shape, dtype)
        h = Handle(arr, self)
        self.memory.on_alloc(h.id, h.size_bytes)
        return h

    def read(self, handles: Sequence[Handle]) -> List[np.ndarray]:
        self.flush_streams()
        self._drain_errors()
        import jax

        # one batched transfer for all requested handles (D2H copies
        # overlap; the reference streams D2H through its staging arena —
        # PJRT owns staging here, so batching is the lever that remains)
        return [np.asarray(a) for a in
                jax.device_get([h.array for h in handles])]

    def write(self, handle: Handle, data) -> None:
        import jax

        handle.array = jax.device_put(np.asarray(data), self.device)

    def free(self, handle: Handle) -> None:
        # drop-queue semantics (reference memory_pool/drop_queue +
        # stream GcTask): a free must not invalidate a handle still
        # referenced by queued-but-undispatched launches
        self.flush_streams()
        self.memory.on_free(handle.id)
        handle.array = None

    # ---------------------------------------------------------- execution

    def compile_kernel(self, task: KernelTask) -> Tuple[CompiledKernel, Callable]:
        """Compile-if-miss (reference CudaContext::compile_kernel,
        context.rs:106): in-memory cache → persistent store → trace+compile."""
        key = str(task.kernel_id)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        import jax

        from .kernel import NativeKernelTask

        from .validation import validate_compiled, validate_launch

        if isinstance(task, NativeKernelTask):
            compiled = task.build()
        else:
            defn = task.define()
            validate_launch(defn, self.props)
            compiled = self.compiler.compile(defn)
        # both paths: VMEM-budget check BEFORE any remote AOT compile
        validate_compiled(compiled, self.props)
        self.compile_count += 1
        if self.logger is not None:
            self.logger.log_compile(task, compiled)

        mut = compiled.mutable_indices
        raw = compiled.fn

        def packed(ro_bufs, mut_bufs, scalars):
            bufs = []
            ro_i = mut_i = 0
            for i in range(len(ro_bufs) + len(mut_bufs)):
                if i in mut:
                    bufs.append(mut_bufs[mut_i])
                    mut_i += 1
                else:
                    bufs.append(ro_bufs[ro_i])
                    ro_i += 1
            return raw(bufs, tuple(scalars))

        jfn = jax.jit(packed, donate_argnums=(1,))
        entry = (compiled, jfn)
        self._cache[key] = entry
        return entry

    def launch(self, task: KernelTask, buffers: Sequence[Handle],
               scalars: Sequence[Any] = (), stream: int = 0) -> None:
        """Queued launch (the wired multi-stream path, reference
        SchedulerMultiStream, stream/scheduler.rs:10-46): compile +
        validate eagerly so launch errors surface immediately, then
        enqueue the dispatch on the logical ``stream``. Dispatches flush
        in batches at the max_tasks threshold or at any read/sync/array
        access — jax dataflow plus the scheduler's cross-stream handle
        tracking keep execution order correct."""
        compiled, _ = self.compile_kernel(task)  # eager: immediate errors
        from .dry_run import dry_run_enabled

        if dry_run_enabled():
            return  # LaunchMode::Skip — compiled/caches warmed, no dispatch
        mut = set(compiled.mutable_indices)
        self.scheduler.enqueue(
            stream, lambda srv: srv._launch_now(task, buffers, scalars),
            ids=[h.id for h in buffers],
            writes=[h.id for i, h in enumerate(buffers) if i in mut])

    def timing_fn(self, task: KernelTask):
        """Undonated jitted callable for timing repeated executions of one
        kernel (the donated launch jfn would invalidate its inputs)."""
        compiled, _ = self.compile_kernel(task)
        cache = getattr(self, "_timing_fns", None)
        if cache is None:
            cache = self._timing_fns = {}
        key = str(task.kernel_id)
        fn = cache.get(key)
        if fn is None:
            import jax

            fn = jax.jit(lambda bufs, sc: compiled.fn(bufs, tuple(sc)))
            cache[key] = fn
        return compiled, fn

    def flush_streams(self) -> None:
        """Dispatch everything still queued on the stream scheduler."""
        sched = getattr(self, "scheduler", None)
        if sched is not None and sched._pending:
            sched.flush()

    def _launch_now(self, task: KernelTask, buffers: Sequence[Handle],
                    scalars: Sequence[Any] = ()) -> None:
        compiled, jfn = self.compile_kernel(task)
        mut = set(compiled.mutable_indices)
        ro = [h.array for i, h in enumerate(buffers) if i not in mut]
        mu = [h.array for i, h in enumerate(buffers) if i in mut]
        try:
            outs = jfn(ro, mu, tuple(scalars))
        except Exception as e:  # compile/shape errors surface immediately
            raise ServerError(
                f"kernel {compiled.name} launch failed: {e}") from e
        self.launch_count += 1
        if self.logger is not None:
            self.logger.log_launch(compiled.name, None)
        k = 0
        for i, h in enumerate(buffers):
            if i in mut:
                h.array = outs[k]
                k += 1
        self._pending = outs if outs else getattr(self, "_pending", ())

    def sync(self) -> None:
        """Block until dispatched work completes; surfaces queued errors
        (the reference's lazy-error contract, tests/dummy/server.rs:36-41)."""
        self.flush_streams()
        self._drain_errors()
        import jax

        pending = getattr(self, "_pending", ())
        if pending:
            try:
                jax.block_until_ready(pending)
                # some transports (remote PJRT tunnels) return from
                # block_until_ready before execution completes; a 1-element
                # readback is the authoritative completion barrier
                import numpy as _np

                first = pending[0]
                _np.asarray(first.ravel()[:1])
            except Exception as e:  # noqa: BLE001
                self.error_queue.append(e)
            self._pending = ()
        self._drain_errors()

    def flush(self) -> None:
        self.flush_streams()

    def _drain_errors(self) -> None:
        if self.error_queue:
            errs = list(self.error_queue)
            self.error_queue.clear()
            raise ServerError(f"{len(errs)} queued server error(s): {errs[0]}")

    # --------------------------------------------------------------- info

    def properties(self) -> DeviceProperties:
        return self.props

    def memory_usage(self):
        return self.memory.memory_usage()
