"""CMMA fragment ops: whole-MXU-tile loads/stores and jnp.dot execute."""

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

class MmaMixin:
    """CMMA fragment ops: whole-MXU-tile loads/stores and jnp.dot execute."""

    def _eval_mma(self, inst: Instruction) -> None:
        jnp, pl = self.jnp, self.pl
        oc = inst.op.opcode
        args = inst.op.args
        if oc == O.MMA_FILL:
            mat, val = args
            v = self.materialize(self.get(val))
            dtype = _elem_dtype(jnp, mat.ty)
            self.env[mat.vid] = EV(
                arr=jnp.full(mat.shape, v, dtype=dtype), varying=False)
            return
        if oc == O.MMA_LOAD:
            mat, buf, off, stride = args[0], args[1], args[2], args[3]
            rows, cols = mat.shape
            layout = inst.op.attrs.get("layout", "row_major")
            if self._mma_is_nd(inst):
                arr = self._mma_slab_nd(inst, rows, cols, layout)
            else:
                arr = self._mma_slab(buf, off, stride, rows, cols, layout)
            self.env[mat.vid] = EV(arr=arr.astype(_elem_dtype(jnp, mat.ty)),
                                   varying=False)
            return
        if oc == O.MMA_STORE:
            mat, buf, off, stride = args[0], args[1], args[2], args[3]
            rows, cols = mat.shape
            m = self.env[mat.vid].arr
            layout = inst.op.attrs.get("layout", "row_major")
            if self._mma_is_nd(inst):
                self._mma_slab_nd(inst, rows, cols, layout, store_m=m)
            else:
                self._mma_store_slab(buf, off, stride, m, layout)
            return
        if oc == O.MMA_EXECUTE:
            a, b, c, d = args
            am, bm = self.env[a.vid].arr, self.env[b.vid].arr
            cm = self.env[c.vid].arr
            acc_dtype = _elem_dtype(jnp, d.ty)
            # f32 inputs: 3-pass bf16 on the MXU (≈f32 accuracy); the MXU
            # single-pass default is tf32-class error
            prec = self.jax.lax.Precision.HIGHEST \
                if am.dtype == jnp.float32 else None
            prod = jnp.dot(am, bm, preferred_element_type=acc_dtype,
                           precision=prec)
            self.env[d.vid] = EV(arr=prod + cm.astype(acc_dtype), varying=False)
            return
        if oc == O.MMA_EXECUTE_SCALED:
            a, b, c, d, sa, sb = args
            am, bm = self.env[a.vid].arr, self.env[b.vid].arr
            cm = self.env[c.vid].arr
            sav = self.materialize(self.get(sa))
            sbv = self.materialize(self.get(sb))
            acc_dtype = _elem_dtype(jnp, d.ty)
            prod = jnp.dot(am.astype(jnp.float32) * sav,
                           bm.astype(jnp.float32) * sbv,
                           preferred_element_type=acc_dtype)
            self.env[d.vid] = EV(arr=prod + cm.astype(acc_dtype), varying=False)
            return
        if oc == O.MMA_CAST:
            dst, src = args
            self.env[dst.vid] = EV(
                arr=self.env[src.vid].arr.astype(_elem_dtype(jnp, dst.ty)),
                varying=False)
            return
        _kernel_fail(f"mma op {oc}")

    def _mma_is_nd(self, inst) -> bool:
        buf = inst.op.args[1]
        return ("nd_affine" in inst.op.attrs
                and buf.kind == VarKind.BUFFER
                and self.plans[buf.vid].mode == "nd")

    def _mma_slab_nd(self, inst, rows, cols, layout, store_m=None):
        """Fragment load/store through an ND-blocked 2D tensor: per-dim
        block-relative offsets (grid terms cancel against the BlockSpec),
        slab = ref[r : r+rows, c : c+cols_lines, :]."""
        jnp, pl = self.jnp, self.pl
        op = inst.op
        buf = op.args[1]
        plan = self.plans[buf.vid]
        ref = self.refs[buf.vid]
        L = plan.param.ty.line
        rels, mults = [], []
        for aff in op.attrs["nd_affine"]:
            r = self.static_rel(aff, blocked=True)
            if r is None or r[1]:
                _kernel_fail("nd mma offset must be cube-uniform affine")
            rels.append(r[0])
            mults.append(self._aff_multiple(aff))
        # storage region extent (layout = storage order of the fragment)
        reg_r, reg_c = (rows, cols) if layout == "row_major" else \
            (cols, rows)
        cl = -(-reg_c // max(L, 1))
        # alignment provable from the affine form (gcd of const + live
        # coeffs): Mosaic requires dynamic sublane-dim offsets to be
        # proven %8 — a K-loop advancing 8 lines per step (tk = 8L)
        # carries coeff 8 and the multiple_of hint discharges the proof
        r0 = self._hint(_as_i32(jnp, rels[0]), mults[0])
        c0 = self._hint(_as_i32(jnp, rels[1]), mults[1])
        if L > 1:
            idx = (pl.ds(r0, reg_r), pl.ds(c0, cl), slice(None))
        else:
            idx = (pl.ds(r0, reg_r), pl.ds(c0, reg_c))
        if store_m is None:
            chunk = ref[idx]
            arr = chunk.reshape(reg_r, cl * L)[:, :reg_c] if L > 1 else chunk
            return arr if layout == "row_major" else arr.T
        m = store_m if layout == "row_major" else store_m.T
        if L > 1:
            if reg_c % L:
                _kernel_fail("nd mma store needs line-aligned fragment "
                             "columns")
            ref[idx] = m.astype(ref.dtype).reshape(reg_r, cl, L)
        else:
            ref[idx] = m.astype(ref.dtype)

    def _mma_geometry(self, buf, off, stride, rows):
        """Resolve an MMA slab access on a (lines, L) 2D or (N,) 1D ref.
        Offsets/strides are in elements; returns (ref, row_offset,
        row_stride_elems, L)."""
        jnp = self.jnp
        ref, L, blk_lines, _blocked = self._buffer_geometry(buf)
        base = self._block_base(buf)
        off_ev = self.get(off)
        stride_ev = self.get(stride)
        if off_ev.varying or stride_ev.varying:
            _kernel_fail("mma access with unit-varying offset/stride")
        o = self.materialize(off_ev)
        s = self.materialize(stride_ev)
        if not isinstance(s, int):
            _kernel_fail("mma stride must be comptime")
        if L > 1:
            if s % L != 0:
                _kernel_fail(f"mma stride {s} not divisible by line size {L}")
            if isinstance(o, int):
                assert o % L == 0, f"mma offset {o} not aligned to line {L}"
                o_row = o // L
            else:
                o_row = o // L
            o_row = o_row - base
        else:
            o_row = o - base
        return ref, _as_i32(jnp, o_row), s, L

    def _slab_span(self, rows, cols, s_rows, L):
        """Exact row span of a (rows, cols) fragment with row stride
        ``s_rows`` rows of ``L`` elements: the last row only needs
        ceil(cols/L) rows — loading the full stride would overrun the
        buffer end."""
        import math as _m

        tail = -(-cols // L)
        return (rows - 1) * s_rows + tail

    def _mma_window(self, ref, o_row, span, L, blk_rows):
        """Slab window rows [o_row, o_row+span) with dynamic-offset support.
        Returns (chunk, writeback|None)."""
        jnp, pl = self.jnp, self.pl
        dyn = not isinstance(o_row, int) and not self.interpret
        if L > 1:
            if dyn:
                return self._dyn_rows_2d(ref, o_row, span, blk_rows)
            row = self._hint(_as_i32(jnp, o_row), 1)
            chunk = ref[pl.ds(row, span), :]

            def wb(new):
                ref[pl.ds(row, span), :] = new.astype(chunk.dtype)

            return chunk, wb
        if dyn:
            return self._dyn_window_1d(ref, o_row, span, blk_rows)
        row = self._hint(_as_i32(jnp, o_row), 1)
        chunk = ref[pl.ds(row, span)]

        def wb1(new):
            ref[pl.ds(row, span)] = new.astype(chunk.dtype)

        return chunk, wb1

    def _mma_slab(self, buf, off, stride, rows, cols, layout):
        jnp, pl = self.jnp, self.pl
        if layout != "row_major":
            slabT = self._mma_slab(buf, off, stride, cols, rows, "row_major")
            return slabT.T
        ref, o_row, s, L = self._mma_geometry(buf, off, stride, rows)
        _r, _l, blk_rows, _b = self._buffer_geometry(buf)
        s_rows = s // L if L > 1 else s
        span = self._slab_span(rows, cols, s_rows, L if L > 1 else 1)
        pad = rows * s_rows - span
        chunk, _wb = self._mma_window(ref, o_row, span, L, blk_rows)
        if L > 1:
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, L), chunk.dtype)], axis=0)
            return chunk.reshape(rows, s_rows * L)[:, :cols]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.zeros((pad,), chunk.dtype)])
        return chunk.reshape(rows, s)[:, :cols]

    def _mma_store_slab(self, buf, off, stride, m, layout):
        jnp, pl = self.jnp, self.pl
        rows, cols = m.shape
        if layout != "row_major":
            m = m.T
            rows, cols = cols, rows
        ref, o_row, s, L = self._mma_geometry(buf, off, stride, rows)
        _r, _l, blk_rows, _b = self._buffer_geometry(buf)
        s_rows = s // L if L > 1 else s
        dtype = ref.dtype
        width = s_rows * L if L > 1 else s
        Lr = L if L > 1 else 1
        span = self._slab_span(rows, cols, s_rows, Lr)
        pad = rows * s_rows - span
        chunk, wb = self._mma_window(ref, o_row, span, L, blk_rows)
        if width == cols:
            out = m.astype(dtype).reshape(span, L) if L > 1 \
                else m.astype(dtype).reshape(span)
            wb(out)
            return
        # strided store: exact-span RMW (pad rows only exist in registers)
        if pad:
            z = jnp.zeros((pad, L), chunk.dtype) if L > 1 else \
                jnp.zeros((pad,), chunk.dtype)
            full = jnp.concatenate([chunk, z], axis=0)
        else:
            full = chunk
        full = full.reshape(rows, width)
        full = jnp.concatenate([m.astype(dtype), full[:, cols:]], axis=1)
        out = full.reshape(rows * s_rows, L) if L > 1 \
            else full.reshape(rows * s_rows)
        out = out[:span] if pad else out
        wb(out)

