"""Structured control flow: predicated If, range/while loops as"""

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

class ControlMixin:
    """Structured control flow: predicated If, range/while loops as
lax carries, break/return masks."""

    def _branch_cond(self, inst: Instruction) -> EV:
        return self.get(inst.op.args[0])

    def _eval_if(self, inst: Instruction) -> None:
        jnp = self.jnp
        cond = self._branch_cond(inst)
        then = inst.op.attrs["then"]
        orelse = inst.op.attrs.get("orelse")
        cm = self.materialize(cond)
        # predicated execution: run both sides under masks (uniform conds use
        # a scalar mask — still branchless, XLA/Mosaic handles select fusion)
        cell = Cell(cm)
        self.masks.append(cell)
        try:
            self.run(then)
        finally:
            self.masks.pop()
        if orelse is not None:
            cell = Cell(~cm if hasattr(cm, "dtype") else jnp.logical_not(cm))
            self.masks.append(cell)
            try:
                self.run(orelse)
            finally:
                self.masks.pop()

    def _canon_carry(self, v: Value) -> Tuple[bool, int]:
        if v.kind == VarKind.MATRIX:
            return (False, 0)  # matrices carry their own (m, n) shape
        varying = v.vid in self.ua.varying
        return (varying, v.ty.line)

    def _carry_get(self, v: Value):
        jnp = self.jnp
        if v.kind == VarKind.MATRIX:
            return self.env[v.vid].arr
        varying, line = self._canon_carry(v)
        dtype = _elem_dtype(jnp, v.ty)
        ev = self.get(v)
        arr = self.broadcast_to_canon(ev, varying or ev.varying, line, dtype)
        if not self.interpret and \
                getattr(arr, "dtype", None) == jnp.bool_:
            # Mosaic rejects i1 (mask-typed) loop carries ("Expected mask
            # vector types", round-3 TPU smoke suite) — ride i32
            arr = arr.astype(jnp.int32)
        return arr

    def _carry_set(self, v: Value, arr) -> None:
        if v.kind == VarKind.MATRIX:
            self.env[v.vid] = EV(arr=arr, varying=False, line=1)
            return
        jnp = self.jnp
        if not self.interpret and _elem_dtype(jnp, v.ty) == jnp.bool_ \
                and getattr(arr, "dtype", None) == jnp.int32:
            arr = arr != 0  # un-widen the i32-carried bool
        varying, line = self._canon_carry(v)
        varying = varying or (getattr(arr, "ndim", 0) > 0
                              and arr.shape[:1] == (self.U,))
        self.env[v.vid] = EV(arr=arr, varying=varying, line=line)

    def _eval_range_loop(self, inst: Instruction) -> None:
        jnp, lax = self.jnp, self.lax
        op = inst.op
        start_ev, stop_ev, step_ev = (self.get(a) for a in op.args)
        if any(e.varying for e in (start_ev, stop_ev, step_ev)):
            self._eval_range_loop_varying(inst, start_ev, stop_ev, step_ev)
            return
        var = op.attrs["var"]
        body = op.attrs["body"]
        carries = [v for v in written_mutables(body) if v.vid in self.env]
        start = self.materialize(start_ev)
        stop = self.materialize(stop_ev)
        step = self.materialize(step_ev)

        unroll = op.attrs.get("unroll", False)
        static = all(isinstance(x, int) for x in (start, stop, step))
        if static:
            trip = max(0, -(-(stop - start) // step)) if step > 0 else \
                max(0, -(-(start - stop) // -step))
        else:
            trip = None
        if unroll and not static:
            _kernel_fail("#[unroll] loop with traced bounds")
        if static and (unroll or trip <= 2):
            for k in range(trip):
                i = start + k * step
                self.env[var.vid] = EV(arr=i, varying=False, aff=(i, {}))
                self.run_loop_body(body)
            return

        init = tuple(self._carry_get(v) for v in carries)
        saved_env = dict(self.env)

        def body_fn(i, carry):
            self.env = dict(saved_env)
            for v, c in zip(carries, carry):
                self._carry_set(v, c)
            iv = start + i * step
            self.env[var.vid] = EV(arr=iv, varying=False, aff=(iv, {}))
            self.run_loop_body(body)
            return tuple(self._carry_get(v) for v in carries)

        if static:
            n = trip
        else:
            # sign-correct ceil((stop-start)/step) for traced bounds
            # (floor-dividing the negated numerator matches Python range
            # semantics for negative comptime steps too)
            n = jnp.maximum(0, -((-(stop - start)) // step))
        final = lax.fori_loop(0, n, body_fn, init)
        self.env = saved_env
        for v, c in zip(carries, final if isinstance(final, tuple) else (final,)):
            self._carry_set(v, c)

    def _eval_range_loop_varying(self, inst: Instruction, start_ev: EV,
                                 stop_ev: EV, step_ev: EV) -> None:
        """Unit-varying loop bounds: the lockstep-SIMT lowering of the
        reference's per-thread RangeLoop (cubecl-ir branch.rs RangeLoop) —
        iterate to the MAX trip count across units and predicate the body
        with ``k < trip_u``. A varying stop only masks iterations; the
        index stays uniform unless start/step themselves vary."""
        jnp, lax = self.jnp, self.lax
        op = inst.op
        var, body = op.attrs["var"], op.attrs["body"]
        if op.attrs.get("unroll", False):
            _kernel_fail("#[unroll] loop with unit-varying bounds")
        carries = [v for v in written_mutables(body) if v.vid in self.env]
        dtype = _elem_dtype(jnp, op.args[0].ty)

        def canon(ev):
            if not ev.varying:
                return self.materialize(ev)
            return self.broadcast_to_canon(ev, True, 1, dtype)

        start, stop, step = (canon(e) for e in
                             (start_ev, stop_ev, step_ev))
        num = stop - start
        # python-range trip count, sign-correct: max(0, ceil(num / step))
        trip = jnp.maximum(0, -((-num) // step))
        max_trip = jnp.max(trip)
        iv_varying = start_ev.varying or step_ev.varying

        init = tuple(self._carry_get(v) for v in carries)
        saved_env = dict(self.env)

        def body_fn(k, carry):
            self.env = dict(saved_env)
            for v, c in zip(carries, carry):
                self._carry_set(v, c)
            iv = start + k * step
            if iv_varying:
                self.env[var.vid] = EV(arr=iv, varying=True)
            else:
                self.env[var.vid] = EV(arr=iv, varying=False, aff=(iv, {}))
            self.masks.append(Cell(k < trip))
            try:
                self.run_loop_body(body)
            finally:
                self.masks.pop()
            return tuple(self._carry_get(v) for v in carries)

        final = lax.fori_loop(0, max_trip, body_fn, init)
        self.env = saved_env
        for v, c in zip(carries, final):
            self._carry_set(v, c)

    def _eval_while(self, inst: Instruction) -> None:
        lax = self.lax
        op = inst.op
        body = op.attrs["body"]
        cond_scope = op.attrs["cond_scope"]
        cond_value = op.attrs["cond_value"]
        carries = [v for v in written_mutables(body) if v.vid in self.env]
        init = tuple(self._carry_get(v) for v in carries)
        saved_env = dict(self.env)

        def load_carry(carry):
            self.env = dict(saved_env)
            for v, c in zip(carries, carry):
                self._carry_set(v, c)

        def cond_fn(carry):
            load_carry(carry)
            self.run(cond_scope)
            ev = self.get(cond_value)
            c = self.materialize(ev)
            if ev.varying:
                c = self._any_live(c)
            return c

        def body_fn(carry):
            load_carry(carry)
            self.run(cond_scope)
            ev = self.get(cond_value)
            cell = Cell(self.materialize(ev)) if ev.varying else Cell(None)
            self.masks.append(cell)
            try:
                self.run_loop_body(body)
            finally:
                self.masks.pop()
            return tuple(self._carry_get(v) for v in carries)

        final = lax.while_loop(cond_fn, body_fn, init)
        self.env = saved_env
        for v, c in zip(carries, final):
            self._carry_set(v, c)

    def _eval_loop(self, inst: Instruction) -> None:
        """loop { ... break } → while_loop with an alive mask; BREAK clears
        alive under the current branch mask, predicating the rest of the
        iteration (correct mid-body break semantics)."""
        jnp, lax = self.jnp, self.lax
        body = inst.op.attrs["body"]
        carries = [v for v in written_mutables(body) if v.vid in self.env]
        varying_alive = _loop_break_varying(body, self)
        alive0 = jnp.ones((self.U, 1), jnp.bool_) if varying_alive \
            else jnp.asarray(True)
        # the alive mask rides the while carry as i32: Mosaic rejects
        # i1 loop carries ("Expected mask vector types")
        if not self.interpret:
            alive0 = alive0.astype(jnp.int32)
        init = (alive0,) + tuple(self._carry_get(v) for v in carries)
        saved_env = dict(self.env)

        def cond_fn(carry):
            alive = carry[0]
            if varying_alive:
                return self._any_live(alive)
            return alive if alive.dtype == jnp.bool_ else alive != 0

        def body_fn(carry):
            alive = carry[0]
            if alive.dtype != jnp.bool_:
                alive = alive != 0
            self.env = dict(saved_env)
            for v, c in zip(carries, carry[1:]):
                self._carry_set(v, c)
            cell = Cell(alive)
            cell.start = alive  # alive at iteration start (writeback mask)
            self._loop_cells = getattr(self, "_loop_cells", [])
            self._loop_cells.append(cell)
            self.masks.append(cell)
            try:
                self.run_loop_body(body)
            finally:
                self.masks.pop()
                self._loop_cells.pop()
            out_alive = jnp.asarray(cell.value)
            if not self.interpret and out_alive.dtype == jnp.bool_:
                out_alive = out_alive.astype(jnp.int32)
            return (out_alive,) + tuple(self._carry_get(v) for v in carries)

        final = lax.while_loop(cond_fn, body_fn, init)
        self.env = saved_env
        for v, c in zip(carries, final[1:]):
            self._carry_set(v, c)

    def _eval_break(self, inst: Instruction) -> None:
        """BREAK/RETURN clear the innermost alive cell under the masks pushed
        inside it — predicating the remainder of the iteration/kernel."""
        jnp = self.jnp
        cells = getattr(self, "_loop_cells", [])
        oc = inst.op.opcode
        if oc == O.BREAK:
            if not cells:
                _kernel_fail("break outside a traced loop")
            cell = cells[-1]
        else:  # RETURN / TERMINATE: kernel-level alive cell
            cell = getattr(self, "_kernel_cell", None)
            if cell is None:
                return  # trailing return — nothing left to predicate
        inner = self.mask_since(cell)
        alive = cell.value if cell.value is not None else jnp.asarray(True)
        if inner is None:
            cell.value = jnp.zeros_like(alive) if hasattr(alive, "dtype") \
                else jnp.asarray(False)
        else:
            cell.value = alive & jnp.logical_not(inner)

