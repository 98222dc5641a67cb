"""Concrete runtimes: TPU and CPU-interpreter.

Reference: the per-platform runtime crates (cubecl-cuda/src/runtime.rs
``CudaRuntime::client`` init flow, SURVEY §3.2): device lookup → device
actor → server with properties/features registered per generation.

``CpuRuntime`` is the DummyServer/CPU-MLIR analogue
(cubecl-cpu/src/lib.rs:19, cubecl-runtime/tests/dummy/): it runs the same
Pallas kernels in interpreter mode on host CPU so the whole test matrix
runs without a TPU.
"""

from __future__ import annotations

from typing import Optional

from ..backend.pallas.emitter import PallasCompiler
from ..ir.features import cpu_device_properties, tpu_device_properties
from .actor import DeviceHandle, get_or_create
from .base import Runtime
from .client import ComputeClient
from .config import runtime_config
from .logging import ServerLogger
from .server import JaxServer


_XLA_CACHE_SET = False


def _enable_persistent_compile_cache() -> None:
    """Persistent executable store (reference: sqlite PTX cache,
    compiler.rs:25-50). The XLA compilation cache persists compiled
    executables under the environment's cache root — cold processes skip
    XLA compilation (tracing is re-done; jaxprs are cheap)."""
    global _XLA_CACHE_SET
    if _XLA_CACHE_SET:
        return
    _XLA_CACHE_SET = True
    import os

    import jax

    from .config import cache_root

    try:
        # key the cache dir by a machine fingerprint: XLA CPU executables
        # embed host ISA features, and a cache shared across host types
        # risks SIGILL ("Compile machine features ... doesn't match" —
        # the MULTICHIP_r03 tail noise). TPU executables are keyed by the
        # chip, but the CPU dryrun/test children share this process-level
        # setting, so fingerprint unconditionally.
        path = os.path.join(cache_root(), "xla-cache", _machine_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _machine_fingerprint() -> str:
    """Short stable hash of the host's ISA surface (cpu flags + arch +
    jax version) — one XLA executable cache per distinct machine type."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    try:
        import jax

        jv = jax.__version__
    except Exception:
        jv = "?"
    raw = f"{platform.machine()}|{jv}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _make_client(kind: str, device_index: int) -> ComputeClient:
    import jax

    cfg = runtime_config()
    if kind == "tpu" and cfg.get("compilation", {}).get("cache", True):
        # TPU only: remote compiles cost 10-60s each, so persistence pays.
        # CPU executables recompile in ms AND reloading a cached CPU AOT
        # result always prints a spurious machine-feature mismatch (XLA
        # adds +prefer-no-scatter/gather pseudo-features at compile time
        # that never appear in the host list), which buried real signal
        # in the MULTICHIP dryrun tail — so CPU children skip the cache.
        _enable_persistent_compile_cache()
    multi_threading = cfg.get("streaming", {}).get("multi_threading", False)

    def factory() -> DeviceHandle:
        if kind == "tpu":
            devices = [d for d in jax.devices() if d.platform != "cpu"]
            if not devices:
                raise RuntimeError("no TPU device available; use CpuRuntime")
            device = devices[device_index % len(devices)]
            props = tpu_device_properties(
                getattr(device, "device_kind", "tpu"), str(device))
            compiler = PallasCompiler(interpret=False)
            name = f"tpu:{device_index}"
        else:
            cpus = jax.devices("cpu")
            device = cpus[device_index % len(cpus)]
            props = cpu_device_properties(f"cpu-interpret:{device_index}")
            compiler = PallasCompiler(interpret=True)
            name = f"cpu-interpret:{device_index}"
        logger = ServerLogger.from_config(cfg, name)
        server = JaxServer(device, compiler, props, name, logger, cfg)
        return DeviceHandle(server, multi_threading=multi_threading)

    handle = get_or_create((kind, device_index), factory)
    return ComputeClient(handle)


class TpuRuntime(Runtime):
    name = "tpu"

    @classmethod
    def client(cls, device: int = 0) -> ComputeClient:
        return _make_client("tpu", device)

    @classmethod
    def enumerate_devices(cls):
        """reference Runtime::enumerate_devices (runtime.rs:14)."""
        import jax

        return [d for d in jax.devices() if d.platform != "cpu"]


class CpuRuntime(Runtime):
    name = "cpu-interpret"

    @classmethod
    def client(cls, device: int = 0) -> ComputeClient:
        return _make_client("cpu", device)

    @classmethod
    def enumerate_devices(cls):
        import jax

        return jax.devices("cpu")


def default_client(device: int = 0) -> ComputeClient:
    """TPU when present, else the CPU interpreter (CI fallback)."""
    import jax

    try:
        has_accel = any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        has_accel = False
    return TpuRuntime.client(device) if has_accel else CpuRuntime.client(device)
