"""cubecl_tpu.runtime — runtime core (reference crate: cubecl-runtime)."""

from .actor import DeviceHandle
from .base import CubeCount, CubeDim, DynamicCubeCount, Runtime
from .client import ComputeClient
from .config import cache_root, runtime_config
from .handle import Handle
from .kernel import KernelId, KernelTask
from .logging import ServerLogger
from .memory import MemoryManagement, MemoryUsage
from .pages import PageAllocator
from .profile import (BenchmarkComputations, ProfileDuration,
                      benchmark, time_launch)
from .runtimes import CpuRuntime, TpuRuntime, default_client
from .server import ComputeServer, JaxServer, ServerError
