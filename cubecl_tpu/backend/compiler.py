"""Compiler interface + kernel definition.

Reference: ``Compiler`` trait (cubecl-runtime/src/compiler.rs:238) turning a
``KernelDefinition`` (cubecl-runtime/src/kernel.rs:43) into an executable;
``CompiledKernel`` with debug source (kernel.rs:130).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..ir.scope import Scope


@dataclass
class KernelOptions:
    """reference KernelSettings (cubecl-core/src/codegen/integrator.rs:30)."""

    checked: bool = True             # ExecutionMode::Checked bounds checking
    fast_math: Dict[str, Any] = field(default_factory=dict)
    debug_symbols: bool = False
    name: str = "kernel"
    dimension_semantics: Optional[Tuple[str, ...]] = None  # pallas grid dims


@dataclass
class KernelDefinition:
    """The traced kernel (reference KernelDefinition, kernel.rs:43).

    Buffer/scalar parameter order is the ABI order the launcher uses
    (reference KernelIntegrator::integrate, integrator.rs:107-121) — here
    simply declaration order, since jax arrays carry their own dtypes."""

    scope: Scope
    cube_dim: Tuple[int, int, int]
    cube_count: Tuple[int, int, int]  # capacity when dynamic_grid_vid set
    options: KernelOptions
    plane_dim: int = 8
    # vid of the i32 scalar carrying the RUNTIME grid-x width (the
    # shape-polymorphic launch ABI; cube_count[0] is then the capacity
    # bound analyses compile against)
    dynamic_grid_vid: Optional[int] = None

    @property
    def state(self):
        return self.scope.state


@dataclass
class CompiledKernel:
    """An executable kernel (reference CompiledKernel, kernel.rs:130).

    ``fn(buffers, scalars) -> tuple(updated mutable buffers)`` where
    ``buffers`` is a list of jax arrays in parameter order and the result
    carries the new values of the mutable buffers (functional in-place:
    the launcher rebinds handles — the XLA-native equivalent of the
    reference's in-place device buffers)."""

    fn: Callable
    mutable_indices: List[int]
    source: str
    name: str
    flops: int = 0
    bytes_accessed: int = 0
    vmem_estimate: int = 0
    # (buffer name, bytes, plan mode, demote reason) per buffer — lets
    # launch validation name the access pattern that forced a buffer to
    # whole-VMEM residency when the estimate blows the scoped ceiling
    vmem_breakdown: List[tuple] = None

    def __call__(self, buffers, scalars=()):
        return self.fn(buffers, scalars)


class Compiler:
    """Backend compiler interface (reference Compiler trait,
    compiler.rs:238)."""

    name = "abstract"

    def compile(self, defn: KernelDefinition) -> CompiledKernel:
        raise NotImplementedError
