"""Pure-op lowering table (arith/cmp/bitwise/vector/cast)."""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

from ....ir import ops as O
from ....ir.ops import Instruction
from ....ir.scope import Scope, walk
from ....ir.types import Type
from ....ir.value import Builtin, Value, VarKind

from .evbase import EV, _elem_dtype, _kernel_fail

def _line_reduce(ev, x, red):
    x = ev.jnp.asarray(x)
    if x.ndim <= 1:
        return red(x)
    return red(x, axis=-1, keepdims=True)


def _mk_pure_table():
    def simple(fn):
        return lambda ev, inst, xs: fn(ev.jnp, *xs)

    def j(name):
        return lambda ev, inst, xs: getattr(ev.jnp, name)(*xs)

    t = {
        O.ADD: simple(lambda jnp, a, b: a + b),
        O.SUB: simple(lambda jnp, a, b: a - b),
        O.MUL: simple(lambda jnp, a, b: a * b),
        O.FLOORDIV: simple(lambda jnp, a, b: a // b),
        O.MOD: simple(lambda jnp, a, b: a % b),
        O.REM: simple(lambda jnp, a, b: a - b * jnp.trunc(a / b)),
        O.NEG: simple(lambda jnp, a: -a),
        O.ABS: j("abs"),
        O.MAX: j("maximum"),
        O.MIN: j("minimum"),
        O.CLAMP: simple(lambda jnp, x, lo, hi: jnp.clip(x, lo, hi)),
        O.POW: simple(lambda jnp, a, b: a ** b),
        O.EXP: j("exp"),
        O.EXP2: j("exp2"),
        O.LOG: j("log"),
        O.LOG2: j("log2"),
        O.LOG1P: j("log1p"),
        O.SQRT: j("sqrt"),
        O.SIN: j("sin"),
        O.COS: j("cos"),
        O.TAN: j("tan"),
        O.ASIN: j("arcsin"),
        O.ACOS: j("arccos"),
        O.ATAN: j("arctan"),
        O.ATAN2: j("arctan2"),
        O.SINH: j("sinh"),
        O.COSH: j("cosh"),
        O.TANH: j("tanh"),
        O.FLOOR: j("floor"),
        O.CEIL: j("ceil"),
        O.ROUND: j("round"),
        O.TRUNC: j("trunc"),
        O.SIGN: j("sign"),
        O.LOG1P: j("log1p"),
        O.IS_NAN: j("isnan"),
        O.IS_INF: j("isinf"),
        O.EQ: simple(lambda jnp, a, b: a == b),
        O.NE: simple(lambda jnp, a, b: a != b),
        O.LT: simple(lambda jnp, a, b: a < b),
        O.LE: simple(lambda jnp, a, b: a <= b),
        O.GT: simple(lambda jnp, a, b: a > b),
        O.GE: simple(lambda jnp, a, b: a >= b),
        O.BAND: simple(lambda jnp, a, b: a & b),
        O.BOR: simple(lambda jnp, a, b: a | b),
        O.BXOR: simple(lambda jnp, a, b: a ^ b),
        O.BNOT: simple(lambda jnp, a: ~a),
        O.SHL: simple(lambda jnp, a, b: a << b),
        O.SHR: simple(lambda jnp, a, b: a >> b),
        O.AND: simple(lambda jnp, a, b: jnp.logical_and(a, b)),
        O.OR: simple(lambda jnp, a, b: jnp.logical_or(a, b)),
        O.NOT: simple(lambda jnp, a: jnp.logical_not(a)),
        O.POPCOUNT: lambda ev, inst, xs: ev.lax.population_count(
            xs[0].astype(ev.jnp.uint32)).astype(ev.jnp.int32),
        O.CLZ: lambda ev, inst, xs: ev.lax.clz(
            xs[0].astype(ev.jnp.uint32)).astype(ev.jnp.int32),
        O.COPY: lambda ev, inst, xs: xs[0],
        O.SELECT: lambda ev, inst, xs: ev.jnp.where(xs[0], xs[1], xs[2]),
    }

    def _erf(ev, inst, xs):
        # Mosaic has no erf primitive; expand to the Abramowitz–Stegun
        # 7.1.26 rational approximation (|err| < 1.5e-7, fine for f32) —
        # the same strategy as the reference's ErfTransform IR transformer
        # (cubecl-spirv/src/compiler.rs:255).
        jnp = ev.jnp
        x = jnp.asarray(xs[0])
        dt = x.dtype
        xf = x.astype(jnp.float32)
        a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
        a4, a5, p = -1.453152027, 1.061405429, 0.3275911
        s = jnp.sign(xf)
        ax = jnp.abs(xf)
        t_ = 1.0 / (1.0 + p * ax)
        poly = ((((a5 * t_ + a4) * t_) + a3) * t_ + a2) * t_ + a1
        y = 1.0 - poly * t_ * jnp.exp(-ax * ax)
        return (s * y).astype(dt)

    t[O.ERF] = _erf

    def _rsqrt(ev, inst, xs):
        return ev.lax.rsqrt(xs[0])

    t[O.RSQRT] = _rsqrt

    def _recip(ev, inst, xs):
        # no approximate-reciprocal Mosaic primitive in this jax; the
        # fast-math win comes from the DIV -> MUL*RECIP rewrite letting
        # XLA hoist the loop-invariant recip (FastMathProcessor)
        return 1.0 / xs[0]

    t[O.RECIP] = _recip

    def _div(ev, inst, xs):
        out = inst.out
        if out is not None and out.ty.elem.is_int:
            return xs[0] // xs[1]
        return xs[0] / xs[1]

    t[O.DIV] = _div

    def _fma(ev, inst, xs):
        return xs[0] * xs[1] + xs[2]

    t[O.FMA] = _fma

    def _cast(ev, inst, xs):
        to = inst.op.attrs["to"]
        jnp = ev.jnp
        x = jnp.asarray(xs[0])
        dst = _elem_dtype(jnp, to)
        src = jnp.dtype(x.dtype)
        if not ev.interpret and src != dst:
            # Mosaic has no unsigned<->float casts (round-3 TPU smoke
            # suite: "Unsupported cast: uint32 -> float32") — route
            # through int32, exactly.
            unsigned = jnp.issubdtype(src, jnp.unsignedinteger)
            if unsigned and jnp.issubdtype(dst, jnp.floating):
                if src.itemsize < 4:
                    return x.astype(jnp.int32).astype(dst)
                xi = x.astype(jnp.int32)  # bit-preserving
                hi = jnp.right_shift(xi, 16) & 0xFFFF
                lo = xi & 0xFFFF
                return (hi.astype(jnp.float32) * 65536.0 +
                        lo.astype(jnp.float32)).astype(dst)
            if jnp.issubdtype(src, jnp.floating) and \
                    jnp.issubdtype(dst, jnp.unsignedinteger) and \
                    dst.itemsize == 4:
                # two's-complement wrap: [2^31, 2^32) -> negative i32
                # with the same u32 bit pattern
                xf = x.astype(jnp.float32)
                wrapped = jnp.where(xf >= 2147483648.0,
                                    xf - 4294967296.0, xf)
                return wrapped.astype(jnp.int32).astype(dst)
        return x.astype(dst)

    t[O.CAST] = _cast

    def _reinterpret(ev, inst, xs):
        to = inst.op.attrs["to"]
        x = ev.jnp.asarray(xs[0])
        src_b = x.dtype.itemsize
        dst = _elem_dtype(ev.jnp, to)
        if src_b == dst.itemsize:
            return ev.lax.bitcast_convert_type(x, dst)
        if x.ndim == 0:
            _kernel_fail("reinterpret of a scalar across widths "
                         "(line width must absorb the ratio)")
        if src_b > dst.itemsize:
            # wider -> narrower: bitcast adds a trailing ratio dim; fold
            # it into the line
            r = src_b // dst.itemsize
            y = ev.lax.bitcast_convert_type(x, dst)        # (..., L, r)
            return y.reshape(*x.shape[:-1], x.shape[-1] * r)
        # narrower -> wider: group ratio lanes then bitcast folds them
        r = dst.itemsize // src_b
        if x.shape[-1] % r:
            _kernel_fail(f"reinterpret: line {x.shape[-1]} not divisible "
                         f"by width ratio {r}")
        xx = x.reshape(*x.shape[:-1], x.shape[-1] // r, r)
        return ev.lax.bitcast_convert_type(xx, dst)        # (..., L//r)

    t[O.REINTERPRET] = _reinterpret

    def _vec_splat(ev, inst, xs):
        out = inst.out
        L = out.ty.line
        x = ev.jnp.asarray(xs[0])
        if x.ndim == 0:
            return ev.jnp.broadcast_to(x, (L,))
        return ev.jnp.broadcast_to(x.reshape(-1, 1), (x.shape[0], L))

    t[O.VEC_SPLAT] = _vec_splat

    def _vec_init(ev, inst, xs):
        arrs = [ev.jnp.asarray(x) for x in xs]
        if any(a.ndim > 0 for a in arrs):
            U = max(a.shape[0] for a in arrs if a.ndim > 0)
            arrs = [ev.jnp.broadcast_to(a.reshape(-1, 1) if a.ndim else a,
                                        (U, 1)) for a in arrs]
            return ev.jnp.concatenate(arrs, axis=-1)
        return ev.jnp.stack(arrs)

    t[O.VEC_INIT] = _vec_init

    def _vec_extract(ev, inst, xs):
        x, i = ev.jnp.asarray(xs[0]), xs[1]
        if not isinstance(i, int):
            i = ev.jnp.asarray(i)
            if i.ndim > 0:
                _kernel_fail("lane extract with varying lane index")
        if x.ndim <= 1:
            return ev.lax.dynamic_index_in_dim(x, i, 0, keepdims=False) \
                if not isinstance(i, int) else x[i]
        if isinstance(i, int):
            return x[:, i:i + 1]
        return ev.lax.dynamic_slice_in_dim(x, i, 1, axis=1)

    t[O.VEC_EXTRACT] = _vec_extract

    def _vec_insert(ev, inst, xs):
        # lane insert via iota mask (scatter/DUS don't lower in Mosaic)
        jnp = ev.jnp
        x, i, v = (jnp.asarray(xs[0]), xs[1], xs[2])
        if x.ndim <= 1:
            lanes = ev.jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1),
                                                0).squeeze(-1)
            return jnp.where(lanes == i, jnp.asarray(v, x.dtype), x)
        lanes = ev.jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        v = jnp.asarray(v)
        v = jnp.broadcast_to(v.reshape(-1, 1) if v.ndim else v,
                             (x.shape[0], 1)).astype(x.dtype)
        return jnp.where(lanes == i, v, x)

    t[O.VEC_INSERT] = _vec_insert

    def _vec_sum(ev, inst, xs):
        return _line_reduce(ev, xs[0], ev.jnp.sum)

    def _vec_max(ev, inst, xs):
        return _line_reduce(ev, xs[0], ev.jnp.max)

    def _vec_min(ev, inst, xs):
        return _line_reduce(ev, xs[0], ev.jnp.min)

    t[O.VEC_SUM] = _vec_sum
    t[O.VEC_MAX] = _vec_max
    t[O.VEC_MIN] = _vec_min

    def _dot(ev, inst, xs):
        a, b = ev.jnp.asarray(xs[0]), ev.jnp.asarray(xs[1])
        return _line_reduce(ev, a * b, ev.jnp.sum)

    t[O.DOT] = _dot

    def _mulhi(ev, inst, xs):
        a = xs[0].astype(ev.jnp.int64) if hasattr(xs[0], "astype") else xs[0]
        b = xs[1]
        wide = ev.jnp.asarray(a, ev.jnp.int64) * ev.jnp.asarray(b, ev.jnp.int64)
        return (wide >> 32).astype(ev.jnp.int32)

    t[O.MULHI] = _mulhi

    def _sat(op):
        def f(ev, inst, xs):
            out = inst.out
            jnp = ev.jnp
            elem = out.ty.elem
            a = jnp.asarray(xs[0]).astype(jnp.int64)
            b = jnp.asarray(xs[1]).astype(jnp.int64)
            r = a + b if op == "add" else a - b
            lo = 0 if not elem.is_signed else -(1 << (elem.bits - 1))
            hi = (1 << elem.bits) - 1 if not elem.is_signed \
                else (1 << (elem.bits - 1)) - 1
            return jnp.clip(r, lo, hi).astype(_elem_dtype(jnp, out.ty))
        return f

    t[O.SAT_ADD] = _sat("add")
    t[O.SAT_SUB] = _sat("sub")
    return t


_PURE_LOWERING = _mk_pure_table()
