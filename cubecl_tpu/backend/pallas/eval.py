"""IR evaluator — executes a kernel Scope inside a Pallas kernel function.

This is the TPU lowering of the SIMT execution model (SURVEY.md hard part
(a), build plan §7.4):

- the **unit axis is vectorized**: every unit-varying scalar is a
  ``(U, 1)`` array and every unit-varying line a ``(U, L)`` array, so a
  cube executes in lockstep on the VPU with units on sublanes and the line
  on lanes (cube_dim 8 × line 128 fills one 8×128 vreg exactly);
- **uniform values stay scalars** (``()`` / ``(L,)``) — decided by the
  static uniformity analysis;
- **divergent control flow is predicated**: branches evaluate both sides
  under a mask; buffer stores become masked read-modify-writes (the
  classic SPMD-on-SIMD compilation, like the reference CPU backend's
  plane=1 sequential fallback but vectorized);
- **loops** lower to ``lax.fori_loop``/``lax.while_loop`` with mutable
  locals as carries (the IR's structured phis);
- **plane ops** reduce over sublane groups;
- **CMMA fragments** are whole MXU tiles, ``execute`` is ``jnp.dot`` with
  ``preferred_element_type``;
- buffer loads/stores use the eval-time affine form of the index
  (uniform traced part + static unit coefficients) to emit contiguous
  ``pl.ds`` block accesses instead of gathers.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Tuple

from ...ir import ops as O
from ...ir.ops import Instruction
from ...ir.scope import Scope, walk
from ...ir.types import Type
from ...ir.value import Builtin, Value, VarKind

from .evaluator.evbase import (EV, Cell, WideRef, _as_i32, _elem_dtype,
                               _index_int, _kernel_fail, _merge_coeffs,
                               _result_varying, _loop_break_varying,
                               written_mutables)
from .evaluator.control import ControlMixin
from .evaluator.mem import MemAccessMixin
from .evaluator.mma import MmaMixin
from .evaluator.plane import PlaneMixin
from .evaluator.pure import _PURE_LOWERING, _line_reduce

__all__ = ["EV", "Cell", "Evaluator", "WideRef", "written_mutables"]


class Evaluator(MemAccessMixin, PlaneMixin, ControlMixin, MmaMixin):
    def __init__(self, defn, plans, ua, refs, scalar_vals, jnp, lax, pl, jax,
                 pltpu=None, interpret: bool = False, grid_axes=None):
        self.defn = defn
        self.plans = plans            # vid -> BufferPlan
        self.ua = ua                  # UniformityAnalysis
        self.refs = refs              # vid -> pallas Ref (buffers + shareds)
        self.scalar_vals = scalar_vals  # vid -> traced scalar
        self.jnp, self.lax, self.pl, self.jax = jnp, lax, pl, jax
        if pltpu is None:
            from jax.experimental.pallas import tpu as pltpu
        self.pltpu = pltpu
        self.interpret = interpret
        cd = defn.cube_dim
        self.cube_dim = cd
        self.U = cd[0] * cd[1] * cd[2]
        self.plane = defn.plane_dim
        self.env: Dict[int, EV] = {}
        self.masks: List[Cell] = []
        # size-1 grid dims are squeezed out of the pallas grid (a 3D grid
        # with leading 1s costs ~2x per step on Mosaic); grid_axes maps
        # sym -> squeezed axis index (absent = squeezed, id 0)
        if grid_axes is None:
            grid_axes = {"cz": 0, "cy": 1, "cx": 2}
        self.grid_axes = grid_axes
        self.grid_rank = len(grid_axes)
        # capture grid ids ONCE at kernel entry: pl.program_id staged
        # inside a lax.fori_loop body lands in the inner jaxpr where the
        # interpret-mode rewriter can't bind it (and Mosaic prefers the
        # hoisted form too)
        self._pids = {s: self.pl.program_id(i)
                      for s, i in grid_axes.items()}

    def program_id(self, axis: str):
        # grid is (cz, cy, cx) squeezed of size-1 dims; x innermost
        return self._pids.get(axis, 0)

    def num_programs(self, axis: str):
        """Runtime grid extent — with a RuntimeCubeCount this is the
        launched width, not the compiled capacity."""
        i = self.grid_axes.get(axis)
        return 1 if i is None else self.pl.num_programs(i)

    def _flat_unit_iota(self):
        return self.jax.lax.broadcasted_iota(self.jnp.int32, (self.U, 1), 0)

    def materialize(self, ev: EV, dtype=None):
        """Concrete array in canonical shape."""
        jnp = self.jnp
        if ev.arr is None:
            assert ev.aff is not None
            uni, coeffs = ev.aff
            if not coeffs:
                ev.arr = uni
                ev.varying = False
            else:
                u = self._flat_unit_iota()
                Ux, Uy, Uz = self.cube_dim
                val = None
                cux = coeffs.get("ux", 0)
                cuy = coeffs.get("uy", 0)
                cuz = coeffs.get("uz", 0)
                expr = 0
                if cux:
                    expr = expr + cux * (u % Ux)
                if cuy:
                    expr = expr + cuy * ((u // Ux) % Uy)
                if cuz:
                    expr = expr + cuz * (u // (Ux * Uy))
                ev.arr = expr + uni
                ev.varying = True
        arr = ev.arr
        if dtype is not None and hasattr(arr, "astype"):
            if arr.dtype != dtype:
                arr = arr.astype(dtype)
        elif dtype is not None:
            arr = jnp.asarray(arr, dtype)
        return arr

    def broadcast_to_canon(self, ev: EV, varying: bool, line: int, dtype):
        """Materialize + broadcast to the canonical shape for (varying, line)."""
        jnp = self.jnp
        arr = self.materialize(ev, dtype)
        arr = jnp.asarray(arr, dtype)
        if varying and line > 1:
            shape = (self.U, line)
        elif varying:
            shape = (self.U, 1)
        elif line > 1:
            shape = (line,)
        else:
            shape = ()
        return jnp.broadcast_to(arr, shape)

    def current_mask(self):
        """AND of all mask cells; None when unmasked."""
        m = None
        for c in self.masks:
            if c.value is None:
                continue
            m = c.value if m is None else m & c.value
        return m

    def mask_since(self, cell: Cell):
        """AND of masks pushed after ``cell`` (for break/return)."""
        m = None
        seen = False
        for c in self.masks:
            if c is cell:
                seen = True
                continue
            if seen and c.value is not None:
                m = c.value if m is None else m & c.value
        return m

    def get(self, v: Value) -> EV:
        jnp = self.jnp
        if v.kind == VarKind.CONSTANT:
            c = v.const
            aff = (int(c), {}) if isinstance(c, int) and not isinstance(c, bool) \
                and v.ty.elem.is_int else None
            return EV(arr=c, varying=False, line=v.ty.line, aff=aff)
        if v.kind == VarKind.BUILTIN:
            return self._builtin(v.payload)
        if v.kind == VarKind.SCALAR:
            s = self.scalar_vals[v.vid]
            aff = (s, {}) if v.ty.elem.is_int else None
            return EV(arr=s, varying=False, line=1, aff=aff)
        ev = self.env.get(v.vid)
        if ev is None:
            if v.kind == VarKind.LOCAL_MUT:
                # read-before-write: zero-init (GPU-undefined made deterministic)
                z = 0.0 if v.ty.elem.is_float else 0
                return EV(arr=z, varying=False, line=v.ty.line)
            raise KeyError(f"undefined IR value {v!r}")
        return ev

    def _builtin(self, b: Builtin) -> EV:
        cd = self.cube_dim
        Ux, Uy, Uz = cd
        U = self.U
        jnp = self.jnp

        def aff_ev(uni, coeffs):
            return EV(aff=(uni, {k: v for k, v in coeffs.items() if v}), varying=bool(
                {k: v for k, v in coeffs.items() if v}))

        if b == Builtin.UNIT_POS:
            return aff_ev(0, {"ux": 1, "uy": Ux, "uz": Ux * Uy})
        if b == Builtin.UNIT_POS_X:
            return aff_ev(0, {"ux": 1})
        if b == Builtin.UNIT_POS_Y:
            return aff_ev(0, {"uy": 1})
        if b == Builtin.UNIT_POS_Z:
            return aff_ev(0, {"uz": 1})
        if b == Builtin.UNIT_POS_PLANE:
            u = self._flat_unit_iota()
            return EV(arr=u % self.plane, varying=True)
        if b == Builtin.PLANE_POS:
            u = self._flat_unit_iota()
            return EV(arr=u // self.plane, varying=True)
        if b == Builtin.CUBE_POS_X:
            return aff_ev(self.program_id("cx"), {})
        if b == Builtin.CUBE_POS_Y:
            return aff_ev(self.program_id("cy"), {})
        if b == Builtin.CUBE_POS_Z:
            return aff_ev(self.program_id("cz"), {})
        cc = self.defn.cube_count
        if b == Builtin.CUBE_POS:
            flat = (self.program_id("cz") * cc[1] + self.program_id("cy")) \
                * cc[0] + self.program_id("cx")
            return aff_ev(flat, {})
        if b == Builtin.ABSOLUTE_POS:
            flat = (self.program_id("cz") * cc[1] + self.program_id("cy")) \
                * cc[0] + self.program_id("cx")
            return aff_ev(flat * U, {"ux": 1, "uy": Ux, "uz": Ux * Uy})
        if b == Builtin.ABSOLUTE_POS_X:
            return aff_ev(self.program_id("cx") * Ux, {"ux": 1})
        if b == Builtin.ABSOLUTE_POS_Y:
            return aff_ev(self.program_id("cy") * Uy, {"uy": 1})
        if b == Builtin.ABSOLUTE_POS_Z:
            return aff_ev(self.program_id("cz") * Uz, {"uz": 1})
        if b in (Builtin.CUBE_COUNT_X, Builtin.CUBE_COUNT):
            # only reachable under a dynamic grid (static counts fold in
            # passes.fold_builtins): num_programs reports the RUNTIME
            # width Mosaic launched with
            nx = self.num_programs("cx")
            if b == Builtin.CUBE_COUNT_X:
                return EV(arr=nx, varying=False, line=1)
            return EV(arr=nx * cc[1] * cc[2], varying=False, line=1)
        _kernel_fail(f"builtin {b} (should have been const-folded)")

    _PLANE_NEUTRAL = {"add": 0, "mul": 1, "max": None, "min": None}

    def run(self, scope: Scope) -> None:
        for inst in scope.instructions:
            self.eval_inst(inst)

    def run_loop_body(self, scope: Scope) -> None:
        """Run a loop body with a per-iteration alive cell (continue)."""
        has_continue = any(i.op.opcode == O.CONTINUE
                           for _s, i in walk(scope))
        if not has_continue:
            self.run(scope)
            return
        cell = Cell(None)
        self._iter_cells = getattr(self, "_iter_cells", [])
        self._iter_cells.append(cell)
        self.masks.append(cell)
        try:
            self.run(scope)
        finally:
            self.masks.pop()
            self._iter_cells.pop()

    def writeback_mask(self):
        """Mask for loop-carry writebacks: like current_mask, but the
        innermost loop's alive cell contributes its iteration-START value
        (set in _eval_loop's body_fn), so a mid-iteration break does not
        cancel the breaking iteration's earlier assignments."""
        cells = getattr(self, "_loop_cells", [])
        inner = cells[-1] if cells else None
        m = None
        for c in self.masks:
            val = getattr(c, "start", c.value) if c is inner else c.value
            if val is None:
                continue
            m = val if m is None else m & val
        return m

    _CURRENT_MASK = object()  # sentinel: use current_mask()

    def set_env(self, v: Value, ev: EV, mask=_CURRENT_MASK) -> None:
        """Write a value; mut-local writes respect the active mask (pass
        mask=None to bypass, or an explicit mask array/scalar)."""
        if v.kind == VarKind.LOCAL_MUT:
            m = self.current_mask() if mask is Evaluator._CURRENT_MASK else mask
            if m is not None and v.vid in self.env:
                old = self.env[v.vid]
                dtype = _elem_dtype(self.jnp, v.ty)
                varying = old.varying or ev.varying or (
                    getattr(m, "ndim", 0) > 0)
                a = self.broadcast_to_canon(ev, varying, v.ty.line, dtype)
                b = self.broadcast_to_canon(old, varying, v.ty.line, dtype)
                merged = self.jnp.where(m, a, b)
                self.env[v.vid] = EV(arr=merged, varying=varying,
                                     line=v.ty.line)
                return
        self.env[v.vid] = ev

    def eval_inst(self, inst: Instruction) -> None:
        jnp, lax = self.jnp, self.lax
        op = inst.op
        oc = op.opcode
        out = inst.out

        # ---- control flow -------------------------------------------------
        if oc in (O.IF, O.IF_ELSE):
            self._eval_if(inst)
            return
        if oc == O.RANGE_LOOP:
            self._eval_range_loop(inst)
            return
        if oc == O.WHILE:
            self._eval_while(inst)
            return
        if oc == O.LOOP:
            self._eval_loop(inst)
            return
        if oc in (O.BREAK, O.RETURN, O.TERMINATE):
            self._eval_break(inst)
            return
        if oc == O.CONTINUE:
            cells = getattr(self, "_iter_cells", [])
            if not cells:
                _kernel_fail("continue outside a traced loop")
            cell = cells[-1]
            inner = self.mask_since(cell)
            alive = cell.value if cell.value is not None \
                else self.jnp.asarray(True)
            if inner is None:
                cell.value = self.jnp.zeros_like(alive) \
                    if hasattr(alive, "dtype") else self.jnp.asarray(False)
            else:
                cell.value = alive & self.jnp.logical_not(inner)
            return
        if oc in (O.SYNC_CUBE, O.SYNC_PLANE, O.SYNC_STORAGE, O.COMMENT,
                  O.BARRIER_INIT, O.BARRIER_ARRIVE, O.BARRIER_WAIT):
            return  # lockstep execution: ordering is program order
        if oc == O.MEMCPY_ASYNC:
            # barrier-tracked async copy (reference barrier.rs memcpy_async):
            # the barrier wait is program-ordered here, so a synchronous
            # whole-ref copy implements start+wait semantics. Refs may be
            # tail-padded — copy by logical prefix.
            _bar, dst, src = op.args[0], op.args[1], op.args[2]
            src_ref = self.refs[src.vid]
            dst_ref = self.refs[dst.vid]
            data = src_ref[...].reshape(-1)
            n = 1
            for s in dst_ref.shape:
                n *= s
            data = data[:n] if data.shape[0] >= n else jnp.concatenate(
                [data, jnp.zeros((n - data.shape[0],), data.dtype)])
            dst_ref[...] = data.reshape(dst_ref.shape).astype(dst_ref.dtype)
            return
        if oc == O.PRINT:
            args = [self.materialize(self.get(a)) for a in op.args]
            self.pl.debug_print(op.attrs.get("fmt", "{}"), *args)
            return

        # ---- memory -------------------------------------------------------
        if oc in (O.INDEX, O.INDEX_MASKED, O.STORE, O.STORE_MASKED) and \
                "nd_affine" in op.attrs and \
                op.args[0].kind == VarKind.BUFFER and \
                self.plans[op.args[0].vid].mode == "nd":
            self._nd_access(inst)
            return
        if oc == O.INDEX:
            ev = self.load_buffer(op.args[0], op.args[1], None, out.ty.line,
                                  op.attrs.get("affine"))
            self.set_env(out, ev)
            return
        if oc == O.BLOCK_REDUCE:
            self.set_env(out, self._eval_block_reduce(inst))
            return
        if oc == O.INDEX_MASKED:
            mask_ev = self.get(op.args[2])
            ev = self.load_buffer(op.args[0], op.args[1], mask_ev, out.ty.line,
                                  op.attrs.get("affine"))
            m = self.materialize(mask_ev)
            val = self.materialize(ev)
            zero = jnp.zeros((), dtype=getattr(val, "dtype", None) or jnp.float32)
            ev2 = EV(arr=jnp.where(m, val, zero), varying=ev.varying
                     or mask_ev.varying, line=ev.line)
            self.set_env(out, ev2)
            return
        if oc == O.STORE:
            self.store_buffer(op.args[0], op.args[1], self.get(op.args[2]),
                              None, static_aff=op.attrs.get("affine"))
            return
        if oc == O.STORE_MASKED:
            self.store_buffer(op.args[0], op.args[1], self.get(op.args[2]),
                              self.get(op.args[3]),
                              static_aff=op.attrs.get("affine"))
            return

        # ---- cmma ---------------------------------------------------------
        if oc.startswith("mma."):
            self._eval_mma(inst)
            return

        # ---- plane --------------------------------------------------------
        if oc.startswith("plane."):
            self._eval_plane(inst)
            return

        # ---- atomics ------------------------------------------------------
        if oc.startswith("atomic."):
            self._eval_atomic(inst)
            return

        # ---- pure ops -----------------------------------------------------
        ev = self._eval_pure(inst)
        if out is not None:
            if oc == O.COPY and op.attrs.get("carry_writeback"):
                self.set_env(out, ev, mask=self.writeback_mask())
            else:
                self.set_env(out, ev)

    def _eval_pure(self, inst: Instruction) -> EV:
        jnp, lax = self.jnp, self.lax
        op = inst.op
        oc = op.opcode
        out = inst.out
        evs = [self.get(a) for a in op.args]

        # affine-preserving integer arithmetic keeps the lazy form so index
        # math never materializes unit iotas
        if out is not None and out.ty.elem.is_int and out.ty.line == 1:
            aff = self._affine_arith(oc, evs)
            if aff is not None:
                return EV(aff=aff, varying=bool(aff[1]))

        line = max((e.line for e in evs), default=1)
        if out is not None:
            line = max(line, out.ty.line)
        varying = any(e.varying for e in evs)
        xs = [self.materialize(e) for e in evs]

        fn = _PURE_LOWERING.get(oc)
        if fn is None:
            _kernel_fail(f"op {oc}")
        arr = fn(self, inst, xs)
        res_line = out.ty.line if out is not None else line
        if oc in (O.VEC_EXTRACT, O.VEC_SUM, O.VEC_MAX, O.VEC_MIN, O.DOT):
            res_line = 1
        return EV(arr=arr, varying=varying or _result_varying(arr, self.U),
                  line=res_line)

    def _affine_arith(self, oc, evs) -> Optional[Tuple[Any, Dict[str, int]]]:
        def aff(e):
            return e.aff

        if oc == O.ADD and aff(evs[0]) and aff(evs[1]):
            (u1, c1), (u2, c2) = evs[0].aff, evs[1].aff
            return (u1 + u2, _merge_coeffs(c1, c2, 1))
        if oc == O.SUB and aff(evs[0]) and aff(evs[1]):
            (u1, c1), (u2, c2) = evs[0].aff, evs[1].aff
            return (u1 - u2, _merge_coeffs(c1, c2, -1))
        if oc == O.MUL and aff(evs[0]) and aff(evs[1]):
            (u1, c1), (u2, c2) = evs[0].aff, evs[1].aff
            if not c1 and isinstance(u1, int):
                return (u1 * u2, {k: u1 * v for k, v in c2.items()})
            if not c2 and isinstance(u2, int):
                return (u2 * u1, {k: u2 * v for k, v in c1.items()})
            if not c1 and not c2:
                return (u1 * u2, {})
        if oc == O.NEG and aff(evs[0]):
            u1, c1 = evs[0].aff
            return (-u1, {k: -v for k, v in c1.items()})
        if oc in (O.COPY, O.CAST) and aff(evs[0]):
            return evs[0].aff
        if oc in (O.FLOORDIV, O.DIV, O.MOD) and aff(evs[0]) and aff(evs[1]):
            u2, c2 = evs[1].aff
            if not c2 and isinstance(u2, int) and u2 > 0:
                u1, c1 = evs[0].aff
                if isinstance(u1, int) and u1 % u2 == 0 and \
                        all(v % u2 == 0 for v in c1.values()):
                    if oc == O.MOD:
                        return (0, {})
                    return (u1 // u2, {k: v // u2 for k, v in c1.items()})
                if not c1:  # uniform dynamic divide
                    if oc == O.MOD:
                        return (u1 % u2, {})
                    return (u1 // u2, {})
        return None

