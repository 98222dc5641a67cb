"""cubecl_tpu.backend — backend compilers (reference: cubecl-cpp /
cubecl-spirv / cubecl-wgpu compilers; here: the Pallas/Mosaic emitter)."""

from .compiler import CompiledKernel, Compiler, KernelDefinition, KernelOptions
from .pallas.emitter import PallasCompiler
