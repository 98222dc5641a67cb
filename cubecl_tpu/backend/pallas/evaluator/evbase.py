"""Evaluator value model + shared helpers (EV, Cell, WideRef)."""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

from ....ir import ops as O
from ....ir.ops import Instruction
from ....ir.scope import Scope, walk
from ....ir.types import Type
from ....ir.value import Builtin, Value, VarKind

class EV:
    """An evaluated IR value.

    arr     — jnp array / python scalar (None when the value is affine-lazy)
    varying — varies across units (shape carries a leading U axis)
    line    — SIMD line width L
    aff     — optional affine form: (uniform_part, {"ux": c, "uy": c, "uz": c})
              with uniform_part a python int or traced scalar
    """

    __slots__ = ("arr", "varying", "line", "aff")

    def __init__(self, arr=None, varying=False, line=1, aff=None):
        self.arr = arr
        self.varying = varying
        self.line = line
        self.aff = aff

    def __repr__(self):
        return f"EV(varying={self.varying}, line={self.line}, aff={self.aff})"


class Cell:
    """Mutable mask-stack entry (supports mid-body updates by break/return).
    ``start`` holds a loop cell's alive mask at iteration start."""

    __slots__ = ("value", "start")

    def __init__(self, value):
        self.value = value
        self.start = None


def _kernel_fail(msg: str):
    raise NotImplementedError(f"pallas lowering: {msg}")


class WideRef:
    """Proxy over a pallas Ref whose PHYSICAL dtype is the 32-bit carrier
    of a sub-32-bit logical dtype (emitter widens line-1 refs — Mosaic
    cannot ds-slice 1D sub-32-bit memrefs at unaligned static widths).
    Loads cast back to the logical dtype; stores cast to the carrier.
    Exact round-trips by construction (bf16⊂f32, i8/i16⊂i32, u8/u16⊂u32).
    """

    __slots__ = ("raw", "dtype", "_jnp")

    def __init__(self, raw, logical_dtype, jnp):
        self.raw = raw
        self.dtype = jnp.dtype(logical_dtype)
        self._jnp = jnp

    @property
    def shape(self):
        return self.raw.shape

    def __getitem__(self, idx):
        return self.raw[idx].astype(self.dtype)

    def __setitem__(self, idx, val):
        self.raw[idx] = self._jnp.asarray(val).astype(self.raw.dtype)


def _as_i32(jnp, x):
    if isinstance(x, int):
        return x
    if isinstance(x, float):
        return int(x)
    return x.astype(jnp.int32) if hasattr(x, "astype") else x


def _index_int(jnp, x):
    """Coerce a uniform index value to python int (static) or i32 (traced)."""
    if isinstance(x, int):
        return x
    if isinstance(x, float):
        return int(x)
    if hasattr(x, "dtype") and "int" not in str(x.dtype):
        try:  # numpy scalar → python int; traced f32 → i32
            return int(x)
        except Exception:
            return x.astype(jnp.int32)
    return x


def _elem_dtype(jnp, ty: Type):
    return jnp.dtype(ty.elem.jnp_name)


def _merge_coeffs(c1: Dict[str, int], c2: Dict[str, int], sign: int):
    out = dict(c1)
    for k, v in c2.items():
        out[k] = out.get(k, 0) + sign * v
        if out[k] == 0:
            del out[k]
    return out


def _result_varying(arr, U: int) -> bool:
    shape = getattr(arr, "shape", ())
    return len(shape) >= 1 and shape[0] == U and len(shape) <= 2


def _loop_break_varying(scope: Scope, ev: "Evaluator") -> bool:
    """Does any BREAK in this loop body sit under a unit-varying branch?"""
    def scan(s: Scope, ctx: bool) -> bool:
        for inst in s.instructions:
            oc = inst.op.opcode
            if oc == O.BREAK and ctx:
                return True
            sub_ctx = ctx
            if oc in (O.IF, O.IF_ELSE, O.SWITCH):
                sub_ctx = ctx or ev.ua.is_varying_value(inst.op.args[0])
            for key in ("then", "orelse", "body", "cond_scope"):
                sub = inst.op.attrs.get(key)
                if isinstance(sub, Scope) and scan(sub, sub_ctx):
                    return True
            for _c, sub in inst.op.attrs.get("cases", []):
                if scan(sub, sub_ctx):
                    return True
        return False

    return scan(scope, False)


def written_mutables(scope: Scope) -> List[Value]:
    """Mut locals and matrices written anywhere in the scope tree (carry
    discovery for loop lowering)."""
    seen: Dict[int, Value] = {}
    for _s, inst in walk(scope):
        oc = inst.op.opcode
        if inst.out is not None and inst.out.kind == VarKind.LOCAL_MUT:
            seen[inst.out.vid] = inst.out
        if oc in (O.MMA_FILL, O.MMA_LOAD, O.MMA_CAST):
            m = inst.op.args[0]
            seen[m.vid] = m
        elif oc in (O.MMA_EXECUTE, O.MMA_EXECUTE_SCALED):
            d = inst.op.args[3]
            seen[d.vid] = d
    return list(seen.values())


