"""Processor hooks — backend-registered IR rewriters.

Reference: the ``Processor`` trait (cubecl-ir/src/processing.rs:10) and
``OptimizerBuilder`` transformer injection (cubecl-opt/src/
transformers.rs:9); e.g. CUDA's MMA lowering processor
(cubecl-cpp/src/cuda/processors.rs:8) and the ``#[cube]``-authored
polyfill processors (cubecl-core/src/post_processing/saturating.rs:16).

Processors run over the scope tree between the generic passes and
emission; the Pallas backend registers its own (and users/backends can add
more through ``PallasCompiler.processors``).
"""

from __future__ import annotations

from typing import Callable, Iterable, List

from ..ir import ops as O
from ..ir.ops import Instruction, Operation
from ..ir.scope import Scope
from ..ir.types import ElemType, Type
from ..ir.value import Value, VarKind


class Processor:
    """Rewrites instructions in place; return a replacement list or None to
    keep the instruction unchanged."""

    def process(self, scope: Scope, inst: Instruction):
        return None

    def run(self, scope: Scope) -> None:
        new: List[Instruction] = []
        for inst in scope.instructions:
            for key in ("then", "orelse", "body", "cond_scope"):
                sub = inst.op.attrs.get(key)
                if isinstance(sub, Scope):
                    self.run(sub)
            for _c, sub in inst.op.attrs.get("cases", []):
                self.run(sub)
            repl = self.process(scope, inst)
            if repl is None:
                new.append(inst)
            else:
                new.extend(repl)
        scope.instructions[:] = new


class PolyfillProcessor(Processor):
    """Retarget a primitive type during compilation (reference
    set_polyfill, cubecl-core/src/frontend/polyfills.rs:14-25): every value
    of ``src`` elem type becomes ``dst`` (e.g. compute f64 kernels at f32
    on TPU, or f16 at bf16)."""

    def __init__(self, src: ElemType, dst: ElemType):
        self.src = src
        self.dst = dst

    def _retype(self, v: Value) -> None:
        if v.ty.elem == self.src:
            v.ty = Type(self.dst, v.ty.line)

    def process(self, scope: Scope, inst: Instruction):
        for a in inst.op.args:
            self._retype(a)
        if inst.out is not None:
            self._retype(inst.out)
        to = inst.op.attrs.get("to")
        if isinstance(to, Type) and to.elem == self.src:
            inst.op.attrs["to"] = Type(self.dst, to.line)
        return None


class FastMathProcessor(Processor):
    """Apply relaxed-precision rewrites when fast-math flags allow
    (reference InstructionModes fp_math_mode, marker.rs:54-74):
    AllowReciprocal turns x / y into x * recip(y) for uniform divisors."""

    def process(self, scope: Scope, inst: Instruction):
        # instruction modes carry the flat flag dict the tracing scope
        # stamped from the kernel/helper fast_math options
        flags = inst.modes if isinstance(inst.modes, dict) else {}
        allow = flags.get("allow_reciprocal")
        if allow and inst.op.opcode == O.DIV and inst.out is not None \
                and inst.out.ty.elem.is_float:
            a, b = inst.op.args
            r = scope.create_local(inst.out.ty)
            return [
                Instruction(r, Operation(O.RECIP, (b,)), inst.modes),
                Instruction(inst.out, Operation(O.MUL, (a, r)), inst.modes),
            ]
        return None


def run_processors(scope: Scope, processors: Iterable[Processor]) -> None:
    for p in processors:
        p.run(scope)
