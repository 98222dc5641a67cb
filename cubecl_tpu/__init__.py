"""cubecl-tpu — a TPU-native kernel language and runtime.

A from-scratch rebuild of the capabilities of tracel-ai/cubecl
(/root/reference) designed for TPUs: a Python tracing DSL (@cube) over a
structured kernel IR, scope-level optimization passes, a Pallas/Mosaic
backend that vectorizes the SIMT unit axis onto VPU sublanes and maps CMMA
onto the MXU, and a runtime with device actors, memory management,
compilation caching, autotuning and collectives.

Layer map (SURVEY.md §1):
    frontend  — @cube tracing DSL          (reference: cubecl-core frontend
                                            + cubecl-macros)
    ir        — ops/types/scope/features   (cubecl-ir)
    opt       — passes + analyses          (cubecl-opt, post_processing)
    backend   — Pallas emitter             (cubecl-cpp/-spirv/-wgpu/-cpu)
    runtime   — client/server/memory/tune  (cubecl-runtime, cubecl-common)
    std       — views/layouts/quant/bench  (cubecl-std)
    ops       — kernel library             (examples + cubek-equivalents)
    parallel  — mesh + collectives         (ServerCommunication/NCCL)
"""

__version__ = "0.1.0"

from . import ir
from .frontend import *  # noqa: F401,F403 — the kernel-authoring namespace
from .frontend import cube, comptime, Sequence, Vector
from .runtime import (
    ComputeClient,
    CpuRuntime,
    CubeCount,
    CubeDim,
    Handle,
    TpuRuntime,
    benchmark,
    default_client,
)
from .ir.types import (
    bf16,
    bool_,
    f16,
    f32,
    f64,
    flex32,
    fp8_e4m3,
    fp8_e5m2,
    i8,
    i16,
    i32,
    i64,
    u8,
    u16,
    u32,
    u64,
)
