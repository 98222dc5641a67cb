"""Plane (sublane-group) ops: reductions, scans, shuffles, ballot,"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

from ....ir import ops as O
from ....ir.ops import Instruction
from ....ir.scope import Scope, walk
from ....ir.types import Type
from ....ir.value import Builtin, Value, VarKind

from .evbase import (EV, Cell, WideRef, _as_i32, _elem_dtype,
                     _index_int, _kernel_fail, _merge_coeffs,
                     _result_varying, _loop_break_varying,
                     written_mutables)

class PlaneMixin:
    """Plane (sublane-group) ops: reductions, scans, shuffles, ballot,
segmented helpers, BLOCK_REDUCE."""

    def _eval_block_reduce(self, inst: Instruction) -> EV:
        """Cube-cooperative whole-window reduction (mem.block_reduce, the
        TPU-idiomatic reduce: ONE vector op over [start, start+lines) lines
        — per-unit load loops cannot reach DMA speed on TPU). Returns a
        cube-uniform scalar; sums/products of sub-f32 floats accumulate in
        f32."""
        jnp, pl = self.jnp, self.pl
        op = inst.op
        buf, idx = op.args
        lines = int(op.attrs["lines"])
        kind = op.attrs["kind"]
        ra = self._resolve_rel(buf, idx, op.attrs.get("affine"))
        if ra is None:
            _kernel_fail("block_reduce needs an affine start index")
        rel, c, mult = ra
        if c != 0:
            _kernel_fail("block_reduce start must be cube-uniform "
                         "(it is a cube-cooperative op)")
        ref, L, blk_lines, _blocked = self._buffer_geometry(buf)
        if isinstance(rel, int) or self.interpret:
            row = self._hint(_as_i32(jnp, rel), 1)
            win = ref[pl.ds(row, lines), :] if L > 1 else \
                ref[pl.ds(row, lines)]
        elif L > 1:
            win, _wb = self._dyn_rows_2d(ref, rel, lines, blk_lines, mult)
        else:
            win, _wb = self._dyn_window_1d(ref, rel, lines, blk_lines, mult)
        elem = buf.ty.elem
        dt = _elem_dtype(jnp, buf.ty)
        acc_dt = jnp.float32 if (elem.kind.name == "FLOAT"
                                 and elem.bits < 32
                                 and kind in ("sum", "prod")) else dt
        red = {"sum": jnp.sum, "max": jnp.max, "min": jnp.min,
               "prod": jnp.prod}[kind]
        val = red(win.astype(acc_dt)).astype(dt)
        return EV(arr=val, varying=False, line=1)

    def _roll_rows(self, x2d, s):
        """y[u] = x[u - s] cyclically along sublanes (static s)."""
        n = x2d.shape[0]
        s = s % n
        if s == 0:
            return x2d
        if self.interpret:
            return self.jnp.roll(x2d, s, 0)
        return self.pltpu.roll(x2d, s, 0)

    def _seg_scan(self, x2d, op, neutral, seg):
        """Inclusive Hillis-Steele scan within aligned row segments of
        ``seg`` (log2(seg) sublane rotates — cross-segment contributions
        are masked to ``neutral``). The TPU-native lowering for plane
        scans (seg = plane) and lockstep atomic prefixes (seg = U)."""
        jnp = self.jnp
        orig = x2d.dtype
        if not self.interpret and jnp.dtype(orig).itemsize != 4:
            y = self._seg_scan(self._widen(x2d), op, neutral, seg)
            return (y != 0) if orig == jnp.bool_ else y.astype(orig)
        li = self.jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 0) % seg
        s = 1
        y = x2d
        while s < seg:
            sh = self._roll_rows(y, s)
            y = op(y, jnp.where(li >= s, sh, jnp.full_like(y, neutral)))
            s *= 2
        return y

    def _seg_fill_last(self, y2d, seg):
        """Copy each segment's last row's value to every row of the
        segment (log-step backward copy fill)."""
        jnp = self.jnp
        n = y2d.shape[0]
        li = self.jax.lax.broadcasted_iota(jnp.int32, y2d.shape, 0) % seg
        s = 1
        while s < seg:
            cand = self._roll_rows(y2d, n - s)  # y[u + s]
            y2d = jnp.where(li + s <= seg - 1, cand, y2d)
            s *= 2
        return y2d

    def _seg_bcast_static(self, x2d, k, seg):
        """Every row reads its segment's row ``k`` (static): log-step
        forward fill from k, then backward fill."""
        jnp = self.jnp
        n = x2d.shape[0]
        li = self.jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 0) % seg
        y = x2d
        s = 1
        while s < seg:  # rows > k
            y = jnp.where(li - s >= k, self._roll_rows(y, s), y)
            s *= 2
        s = 1
        while s < seg:  # rows < k
            y = jnp.where(li + s <= k, self._roll_rows(y, n - s), y)
            s *= 2
        return y

    def _plane_canon(self, x_ev: EV):
        """Canonical (U, L) array in a 32-bit work dtype + a restore fn.

        The reference's plane ops are warp-register shuffles
        (cubecl-cpp warp printers); here the plane IS 8 sublanes of the
        canonical (U, L) array, so every plane op lowers to log-step
        sublane rotates (pltpu.roll) with in-plane masks — no 3D
        reshapes (Mosaic rejects those shape casts; round-3 TPU smoke
        suite). Sub-32-bit values are widened exactly (bf16→f32,
        i8/i16/bool→i32)."""
        jnp = self.jnp
        U = self.U
        L = max(1, x_ev.line)
        x = self.materialize(x_ev)
        if not x_ev.varying:
            x = jnp.broadcast_to(jnp.asarray(x), (U, L))
        if getattr(x, "ndim", 0) == 1:
            x = self._shape_cast(x, (U, 1))
        orig = x.dtype
        xw = self._widen(x)

        def restore(y2d, dtype=orig):
            if dtype == jnp.bool_:
                return y2d != 0
            return y2d.astype(dtype)

        return xw, orig, restore

    def _plane_scan_op(self, oc):
        """(op, neutral_for_dtype) for a plane scan/reduction opcode."""
        jnp = self.jnp

        def neutral_max(dt):
            return jnp.finfo(dt).min if jnp.dtype(dt).kind == "f" \
                else jnp.iinfo(dt).min

        def neutral_min(dt):
            return jnp.finfo(dt).max if jnp.dtype(dt).kind == "f" \
                else jnp.iinfo(dt).max

        return {
            "add": (jnp.add, lambda dt: 0),
            "mul": (jnp.multiply, lambda dt: 1),
            "max": (jnp.maximum, neutral_max),
            "min": (jnp.minimum, neutral_min),
        }[oc]

    def _plane_reduce(self, x_ev: EV, kind: str, scan=False,
                      exclusive=False) -> EV:
        """Plane reduction/scan via segmented log-step rotates."""
        jnp = self.jnp
        P = self.plane
        xw, orig, restore = self._plane_canon(x_ev)
        booly = orig == jnp.bool_
        op, neutral_fn = self._plane_scan_op(
            {"all": "min", "any": "max"}.get(kind, kind))
        neutral = neutral_fn(xw.dtype)
        y = self._seg_scan(xw, op, neutral, P)
        if scan:
            if exclusive:
                li = self.jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) % P
                y = jnp.where(li >= 1, self._roll_rows(y, 1),
                              jnp.full_like(y, neutral))
        else:
            y = self._seg_fill_last(y, P)
        return EV(arr=restore(y, orig if not booly else jnp.bool_),
                  varying=True, line=x_ev.line)

    def _eval_plane(self, inst: Instruction) -> None:
        jnp = self.jnp
        oc = inst.op.opcode
        out = inst.out
        if oc == O.PLANE_ELECT:
            u = self._flat_unit_iota()
            self.set_env(out, EV(arr=(u % self.plane) == 0, varying=True))
            return
        x = self.get(inst.op.args[0])
        if oc == O.PLANE_SUM:
            ev = self._plane_reduce(x, "add")
        elif oc == O.PLANE_PROD:
            ev = self._plane_reduce(x, "mul")
        elif oc == O.PLANE_MAX:
            ev = self._plane_reduce(x, "max")
        elif oc == O.PLANE_MIN:
            ev = self._plane_reduce(x, "min")
        elif oc == O.PLANE_ALL:
            ev = self._plane_reduce(x, "all")
        elif oc == O.PLANE_ANY:
            ev = self._plane_reduce(x, "any")
        elif oc == O.PLANE_INCLUSIVE_SUM:
            ev = self._plane_reduce(x, "add", scan=True)
        elif oc == O.PLANE_EXCLUSIVE_SUM:
            ev = self._plane_reduce(x, "add", scan=True, exclusive=True)
        elif oc == O.PLANE_INCLUSIVE_PROD:
            ev = self._plane_reduce(x, "mul", scan=True)
        elif oc == O.PLANE_EXCLUSIVE_PROD:
            ev = self._plane_reduce(x, "mul", scan=True, exclusive=True)
        elif oc == O.PLANE_BALLOT:
            # packed plane bitmask: active << lane_in_plane, then an
            # in-plane OR-scan + fill (i32 throughout — Mosaic has no
            # unsigned reductions)
            P = self.plane
            xw, _orig, _restore = self._plane_canon(x)
            li = self.jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0) % P
            bits = jnp.left_shift((xw != 0).astype(jnp.int32), li)
            packed = self._seg_fill_last(
                self._seg_scan(bits, jnp.bitwise_or, 0, P), P)
            ev = EV(arr=packed.astype(jnp.uint32), varying=True)
        elif oc == O.PLANE_BROADCAST:
            lane_ev = self.get(inst.op.args[1])
            if not x.varying:
                ev = x
            elif lane_ev.varying or not isinstance(
                    self.materialize(lane_ev), int):
                # per-unit (or traced-uniform) source lane
                ev = self._plane_gather(x, self.broadcast_to_canon(
                    lane_ev, True, 1, self.jnp.int32))
            else:
                k = int(self.materialize(lane_ev)) % self.plane
                xw, orig, restore = self._plane_canon(x)
                y = self._seg_bcast_static(xw, k, self.plane)
                ev = EV(arr=restore(y), varying=True, line=x.line)
        elif oc in (O.PLANE_SHUFFLE_XOR, O.PLANE_SHUFFLE_UP,
                    O.PLANE_SHUFFLE_DOWN, O.PLANE_SHUFFLE):
            ev = self._plane_shuffle(oc, x, inst.op.args[1])
        else:
            _kernel_fail(f"plane op {oc}")
        self.set_env(out, ev)

    def _plane_gather(self, x: EV, src_lanes) -> EV:
        """Per-unit plane gather: unit u reads the value of lane
        src_lanes[u] within its plane. Lowered as a select over the P
        static plane broadcasts (pure sublane rotates + selects — exact
        for every dtype incl. inf/nan payloads; O(P log P) rotates, the
        general path for traced or unit-varying shuffle lanes)."""
        jnp = self.jnp
        P = self.plane
        if not x.varying:
            return x
        xw, orig, restore = self._plane_canon(x)
        src = jnp.clip(self._shape_cast(
            jnp.asarray(src_lanes, jnp.int32), (self.U, 1)), 0, P - 1)
        acc = xw
        for k in range(P):
            bk = self._seg_bcast_static(xw, k, P)
            acc = jnp.where(src == k, bk, acc)
        return EV(arr=restore(acc), varying=True, line=x.line)

    def _plane_shuffle(self, oc, x: EV, arg: Value) -> EV:
        jnp = self.jnp
        a_ev = self.get(arg)
        P = self.plane
        if not x.varying:
            return x
        if a_ev.varying or not isinstance(
                self.materialize(a_ev), (int,)):
            # traced (or per-unit) lane argument: compute per-unit source
            # lanes and gather
            U = self.U
            a = self.broadcast_to_canon(a_ev, True, 1, jnp.int32) \
                if a_ev.varying else jnp.broadcast_to(
                    jnp.asarray(self.materialize(a_ev), jnp.int32), (U, 1))
            li = self.jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0) % P
            if oc == O.PLANE_SHUFFLE_XOR:
                src = li ^ a
            elif oc == O.PLANE_SHUFFLE_UP:
                # out-of-range lanes keep their own value (__shfl_up
                # semantics, reference cubecl-cpp warp printers)
                src = jnp.where(li - a < 0, li, li - a)
            elif oc == O.PLANE_SHUFFLE_DOWN:
                src = jnp.where(li + a >= P, li, li + a)
            else:  # PLANE_SHUFFLE: absolute source lane
                src = a % P
            return self._plane_gather(x, src)
        a = int(self.materialize(a_ev))
        xw, orig, restore = self._plane_canon(x)
        li = self.jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0) % P
        if oc == O.PLANE_SHUFFLE_XOR:
            # butterfly: one rotate pair per set bit of the xor mask
            y = xw
            b = 1
            while b < P:
                if a & b:
                    y = jnp.where((li & b) != 0, self._roll_rows(y, b),
                                  self._roll_rows(y, xw.shape[0] - b))
                b *= 2
            y = y if (a % P) else xw
        elif oc == O.PLANE_SHUFFLE_UP:
            s = a % P
            y = jnp.where(li >= s, self._roll_rows(xw, s), xw)
        elif oc == O.PLANE_SHUFFLE_DOWN:
            s = a % P
            y = jnp.where(li + s <= P - 1,
                          self._roll_rows(xw, xw.shape[0] - s), xw)
        else:  # PLANE_SHUFFLE with uniform static src
            y = self._seg_bcast_static(xw, a % P, P)
        return EV(arr=restore(y), varying=True, line=x.line)

