"""Memory access lowering: affine index resolution, block-window spans,"""

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

class MemAccessMixin:
    """Memory access lowering: affine index resolution, block-window spans,
dynamic windows (superspan+roll), masked stores, ND access, gathers,
atomics. The Mosaic-legality-critical half of the evaluator."""

    def flat_unit_coeff(self, coeffs: Dict[str, int]) -> Optional[int]:
        """Slope of the affine form along the flattened unit id; None if the
        per-dim coefficients aren't consistent with x-fastest flattening."""
        Ux, Uy, Uz = self.cube_dim
        dims = [(Ux, coeffs.get("ux", 0), 1),
                (Uy, coeffs.get("uy", 0), Ux),
                (Uz, coeffs.get("uz", 0), Ux * Uy)]
        c: Optional[int] = None
        for n, coeff, factor in dims:
            if n == 1:
                continue
            want = coeff / factor
            if want != int(want):
                return None
            want = int(want)
            if c is None:
                c = want
            elif c != want:
                return None
        return 0 if c is None else c

    def index_affine(self, idx: Value) -> Optional[Tuple[Any, int]]:
        """(uniform_start, unit_coeff) for an index value, or None."""
        ev = self.get(idx)
        if ev.aff is None:
            if not ev.varying:
                # indices can arrive float-typed (f32 comptime literals in
                # index position) — coerce: Mosaic's assume_multiple /
                # pl.ds require integer operands
                return (_index_int(self.jnp, self.materialize(ev)), 0)
            return None
        uni, coeffs = ev.aff
        c = self.flat_unit_coeff(coeffs)
        if c is None:
            return None
        return (uni, c)

    def static_rel(self, static_aff, blocked: bool):
        """(rel_uniform, unit_coeff) from the *planner's* affine form.

        For blocked buffers the grid terms cancel against the block base by
        plan construction, so they are dropped symbolically — Mosaic then
        sees constant (or loop-var-only) offsets it can prove aligned,
        instead of opaque program_id arithmetic."""
        if static_aff is None:
            return None
        rel: Any = static_aff.const
        for sym, k in static_aff.coeffs.items():
            if sym in ("ux", "uy", "uz"):
                continue
            if sym in ("cx", "cy", "cz"):
                if blocked:
                    continue  # cancelled against the block base
                rel = rel + k * self.program_id(sym)
            elif sym.startswith("L") or sym.startswith("D"):
                vid = int(sym[1:])
                if sym.startswith("D"):
                    v = self.scalar_vals[vid]
                else:
                    ev = self.env.get(vid)
                    if ev is None:
                        return None
                    v = self.materialize(ev)
                rel = rel + k * _index_int(self.jnp, v)
            else:
                return None
        c = self.flat_unit_coeff(
            {s: k for s, k in static_aff.coeffs.items()
             if s in ("ux", "uy", "uz")})
        if c is None:
            return None
        return (rel, c)

    def _buffer_geometry(self, buf: Value):
        """(ref, line, length_lines, blocked). Whole-mode lengths include
        tail padding (plan.pad_lines)."""
        if buf.kind == VarKind.SHARED:
            ref = self.refs[buf.vid]
            # scratch may be quantum-padded (emitter); rows from the ref
            return ref, buf.ty.line, ref.shape[0], False
        plan = self.plans[buf.vid]
        ref = self.refs[buf.vid]
        line = plan.param.ty.line
        if plan.mode == "blocked":
            return ref, line, plan.block_lines, True
        return ref, line, plan.param.length + plan.pad_lines, False

    def _block_base(self, buf: Value):
        """Absolute line index of the resident block's first line."""
        if buf.kind == VarKind.SHARED:
            return 0
        plan = self.plans[buf.vid]
        if plan.mode != "blocked":
            return 0
        base = 0
        for s, c in plan.grid_coeffs.items():
            base = base + c * self.program_id(s)
        return base * plan.block_lines

    def _rel_mult(self, static_aff, blocked) -> int:
        """Provable divisor of the (grid-cancelled) relative offset: the
        gcd of its constant and coefficients. Lets dynamic offsets that
        are sublane/tile-aligned use direct hinted slices instead of the
        superspan+rotate path (Mosaic can only rotate 32-bit data)."""
        import math as _m

        if static_aff is None:
            return 1
        g = abs(static_aff.const)
        for sym, k in static_aff.coeffs.items():
            if sym in ("ux", "uy", "uz"):
                continue
            if blocked and sym in ("cx", "cy", "cz"):
                continue
            g = _m.gcd(g, abs(k))
        return g or (1 << 30)   # rel ≡ 0

    def _resolve_rel(self, buf: Value, idx: Value, static_aff):
        """(rel_line_index, unit_coeff, mult) of an access, or None if
        non-affine. Prefers the planner's symbolic form (grid terms
        cancelled) so Mosaic can prove offset alignment; ``mult`` is a
        provable divisor of rel (1 = unknown)."""
        blocked = buf.kind == VarKind.BUFFER and \
            self.plans[buf.vid].mode == "blocked"
        sr = self.static_rel(static_aff, blocked) if static_aff is not None \
            else None
        if sr is not None:
            return sr + (self._rel_mult(static_aff, blocked),)
        aff = self.index_affine(idx)
        if aff is None:
            return None
        start_u, c = aff
        return (start_u - self._block_base(buf), c, 1)

    def _hint(self, start, mult: int):
        """pl.multiple_of alignment hint for traced offsets."""
        if isinstance(start, int):
            return start
        return self.pl.multiple_of(start, mult)

    def _aff_multiple(self, aff, blocked: bool = True) -> int:
        """Largest m such that the affine's runtime value is provably a
        multiple of m: gcd of the constant and every coefficient that
        survives into static_rel (grid syms cancel when blocked; unit
        syms are excluded from the uniform part)."""
        import math

        g = abs(int(aff.const))
        for sym, k in aff.coeffs.items():
            if sym in ("ux", "uy", "uz"):
                continue
            if blocked and sym in ("cx", "cy", "cz"):
                continue
            g = math.gcd(g, abs(int(k)))
        return g or 1

    def _clip_rel(self, rel, lo: int, hi: int):
        """Clamp a line offset; stays a python int when static so Mosaic
        sees constant indices."""
        if isinstance(rel, int):
            return min(max(rel, lo), max(lo, hi))
        return self.jnp.clip(rel, lo, max(lo, hi))

    def load_buffer(self, buf: Value, idx: Value, mask_ev: Optional[EV],
                    out_line: int, static_aff=None):
        """Buffers with line>1 are 2D refs (lines, L): loads are row slices
        (sublane-aligned by construction, lanes fully utilized). line==1
        buffers are 1D refs."""
        jnp, pl = self.jnp, self.pl
        per_unit = isinstance(buf.payload, dict) and buf.payload.get("per_unit")
        if per_unit:
            return self._per_unit_access(buf, idx, None, mask_ev, load=True)
        ra = self._resolve_rel(buf, idx, static_aff)
        if ra is None:
            return self._gather_load(buf, idx, mask_ev, out_line)
        rel, c, mult = ra
        ref, L, blk_lines, _blocked = self._buffer_geometry(buf)
        U = self.U
        if c == 0:
            # uniform line load
            if mask_ev is not None:
                rel = self._clip_rel(rel, 0, blk_lines - 1)
            if L == 1 and not isinstance(rel, int):
                # dynamic single-element load: Mosaic cannot prove vector<1>
                # alignment at a dynamic index. Prefer the aligned-superspan
                # + rotate window (O(quantum) VPU work); fall back to an
                # iota-select over the resident block when the block is too
                # small for a superspan (Mosaic also crashes on block-wide
                # multi_reductions past ~64k lanes, so the select is only
                # safe on small blocks anyway).
                A = self._quantum(ref.dtype)
                if not self.interpret and (blk_lines >= 2 * A
                                           or mult % A == 0):
                    win, _wb = self._dyn_window_1d(ref, rel, 1, blk_lines,
                                                   mult)
                    return EV(arr=win[0], varying=False, line=1)
                data = ref[...]
                iota = self.jax.lax.broadcasted_iota(
                    jnp.int32, (blk_lines, 1), 0).reshape(blk_lines)
                sel = jnp.where(iota == rel, data, jnp.zeros_like(data))
                return EV(arr=jnp.sum(sel), varying=False, line=1)
            if L > 1 and not isinstance(rel, int) and not self.interpret \
                    and (blk_lines >= 16 or mult % 8 == 0):
                # dynamic single-row load on a 2D ref: aligned superspan
                win, _wb = self._dyn_rows_2d(ref, rel, 1, blk_lines, mult)
                return EV(arr=win.reshape(L), varying=False, line=L)
            row = self._hint(_as_i32(jnp, rel), 1)
            if L > 1:
                val = ref[pl.ds(row, 1), :].reshape(L)
            else:
                val = ref[pl.ds(row, 1)][0]
            return EV(arr=val, varying=False, line=L)
        if c < 0:
            # reversed access (e.g. buf[N-1-UNIT_POS]): load the ascending
            # span from the lowest index and reverse the unit axis.
            # jnp.flip lowers to lax.rev, which Mosaic does NOT implement
            # (found by the round-3 TPU smoke suite) — reverse via an
            # anti-diagonal one-hot matmul instead (exact; O(U^2) MACs,
            # reversal is a teaching pattern, not a hot path)
            if -c > 1 and L == 1 and not self.interpret:
                # reversed STRIDED scalar access: the ascending-span path
                # would need an illegal (U, c) group reshape — exact
                # one-hot gather instead (same rule as forward strides)
                return self._gather_load(buf, idx, mask_ev, out_line)
            lo = rel + c * (U - 1)
            val = self._load_span(ref, lo, -c, L, blk_lines,
                                  mask_ev is not None, mult)
            return EV(arr=self._reverse_rows(val), varying=True, line=L)
        if L == 1 and c > 1 and not self.interpret:
            # strided per-unit SCALAR loads (e.g. row-major scalar sweeps,
            # unit stride c): the (U, c) group reshape of a 1D span is not
            # a legal Mosaic relayout (tpu.reshape rejects 1D->2D with
            # minor != the vreg lane count). Use the exact one-hot gather
            # — O(block), matching the "scalar loads stay slow" teaching
            # semantics; hot kernels use line>=128 buffers instead.
            return self._gather_load(buf, idx, mask_ev, out_line)
        val = self._load_span(ref, rel, c, L, blk_lines, mask_ev is not None,
                              mult)
        return EV(arr=val, varying=True, line=L)

    def _quantum(self, dtype) -> int:
        """1D alignment quantum: one (sublanes, 128) tile in elements."""
        sub = {4: 8, 2: 16, 1: 32}.get(self.jnp.dtype(dtype).itemsize, 8)
        return sub * 128

    def _flat_roll(self, x2d, s, total):
        """jnp.roll(x.flat, -s) on a (rows, 128) array with traced s≥0.
        Only positive dynamic shifts (Mosaic rotate bug on negatives)."""
        jnp, pltpu = self.jnp, self.pltpu
        rows = x2d.shape[0]
        s = s % total
        r = s // 128
        cc = s % 128
        a = pltpu.roll(x2d, rows - r, 0)
        b = pltpu.roll(x2d, rows - r - 1, 0)
        a = pltpu.roll(a, 128 - cc, 1)
        b = pltpu.roll(b, 128 - cc, 1)
        lane = self.jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
        return jnp.where(lane < 128 - cc, a, b)

    def _dyn_window_1d(self, ref, rel, span, blk_lines, mult=1):
        """Flat window ref[rel : rel+span] at a traced offset on a 1D ref.
        Returns (window[span], writeback) where writeback(new_window)
        merges it back (RMW). Requires blk_lines ≥ rel + span (whole-mode
        padding guarantees this). ``mult``: provable divisor of rel — a
        tile-aligned offset slices directly (no rotate; Mosaic can only
        rotate 32-bit data, and the rotate costs a VPU pass)."""
        jnp, pl = self.jnp, self.pl
        A = self._quantum(ref.dtype)
        if mult % A == 0:
            rel_i = self._hint(_as_i32(jnp, rel), A)
            chunk = ref[pl.ds(rel_i, span)]

            def wb_direct(new_window):
                ref[pl.ds(rel_i, span)] = new_window.astype(chunk.dtype)

            return chunk, wb_direct
        sup = ((span + A - 1) // A) * A + A
        assert blk_lines >= sup, (
            f"dynamic 1D window needs padding: blk={blk_lines} < sup={sup}")
        if blk_lines < sup:
            # buffer too small for an aligned superspan: one-hot gather
            # (O(span·blk) — only small buffers land here)
            data = ref[...]
            rel_i = _as_i32(jnp, rel)
            idxs = rel_i + self.jax.lax.broadcasted_iota(
                jnp.int32, (span,), 0)
            pos = self.jax.lax.broadcasted_iota(
                jnp.int32, (span, blk_lines), 1)
            oneh = pos == idxs[:, None]
            win = jnp.sum(jnp.where(oneh, data[None, :],
                                    jnp.zeros_like(data)[None, :]), axis=1)

            def wb_gather(new_window):
                merged = jnp.sum(
                    jnp.where(oneh, new_window[:, None],
                              jnp.zeros((span, blk_lines), data.dtype)),
                    axis=0)
                hit = jnp.any(oneh, axis=0)
                ref[...] = jnp.where(hit, merged.astype(data.dtype), data)

            return win, wb_gather
        rel_i = _as_i32(jnp, rel)
        # clamp the aligned start into [0, blk-sup] — ds clamps silently
        # AFTER off is computed, which would shift the value/mask
        # correspondence (observed: checked stores at negative bases
        # landed +|base| lines high). off stays SIGNED: a negative base
        # (checked-mode OOB) yields a negative off whose sel below
        # excludes the out-of-range lanes; the rotate uses off mod sup.
        rel_al = self._hint(
            jnp.minimum(jnp.maximum(rel_i, 0) // A * A,
                        (blk_lines - sup) // A * A), A)
        off = rel_i - rel_al
        off_pos = jnp.mod(off, sup)
        chunk = ref[pl.ds(rel_al, sup)]
        x2d = chunk.reshape(sup // 128, 128)
        win = self._flat_roll(x2d, off_pos, sup).reshape(sup)[:span]

        def writeback(new_window):
            flat = jnp.concatenate(
                [new_window.astype(chunk.dtype),
                 jnp.zeros((sup - span,), chunk.dtype)])
            back = self._flat_roll(flat.reshape(sup // 128, 128),
                                   sup - off_pos, sup).reshape(sup)
            idx = self.jax.lax.broadcasted_iota(
                jnp.int32, (sup // 128, 128), 0) * 128 + \
                self.jax.lax.broadcasted_iota(
                    jnp.int32, (sup // 128, 128), 1)
            idx = idx.reshape(sup)
            sel = (idx >= off) & (idx < off + span)
            ref[pl.ds(rel_al, sup)] = jnp.where(sel, back, chunk)

        return win, writeback

    def _dyn_rows_2d(self, ref, row, nrows, blk_rows, mult=1):
        """ref[row : row+nrows, :] at a traced row offset on a 2D ref:
        8-aligned row superspan + one sublane roll. Returns (window,
        writeback). A provably 8-aligned row (``mult`` % 8 == 0) slices
        directly — no rotate (required for sub-32-bit dtypes, cheaper
        for all)."""
        jnp, pl, pltpu = self.jnp, self.pl, self.pltpu
        if mult % 8 == 0:
            row_i = self._hint(_as_i32(jnp, row), 8)
            chunk = ref[pl.ds(row_i, nrows), :]

            def wb_direct(new_window):
                ref[pl.ds(row_i, nrows), :] = new_window.astype(chunk.dtype)

            return chunk, wb_direct
        sup = -(-nrows // 8) * 8 + 8
        assert blk_rows >= sup, (
            f"dynamic 2D row window needs padding: rows={blk_rows} < {sup}")
        row_i = _as_i32(jnp, row)
        # clamp the aligned start into [0, blk-sup] (ds clamps silently
        # AFTER off is computed, shifting the value/mask correspondence);
        # off stays SIGNED so sel excludes negative-base (checked OOB)
        # rows, while the rotates use the non-negative off mod sup
        row_al = self._hint(
            jnp.minimum(jnp.maximum(row_i, 0) // 8 * 8,
                        (blk_rows - sup) // 8 * 8), 8)
        off = row_i - row_al
        off_pos = jnp.mod(off, sup)
        chunk = ref[pl.ds(row_al, sup), :]
        # Mosaic's dynamic rotate miscompiles negative shifts — use the
        # positive complement (roll by sup-off ≡ roll by -off)
        win = pltpu.roll(chunk, sup - off_pos, 0)[:nrows]

        def writeback(new_window):
            full = jnp.concatenate(
                [new_window.astype(chunk.dtype),
                 jnp.zeros((sup - nrows,) + chunk.shape[1:], chunk.dtype)])
            back = pltpu.roll(full, off_pos, 0)
            ridx = self.jax.lax.broadcasted_iota(
                jnp.int32, (sup, 1), 0)
            sel = (ridx >= off) & (ridx < off + nrows)
            ref[pl.ds(row_al, sup), :] = jnp.where(sel, back, chunk)

        return win, writeback

    def _onehot_masked_store(self, ref, rel, c, new, mm, L, blk_lines):
        """Masked unit-strided store as a one-hot scatter RMW: unit u
        writes line rel + u*c iff mm[u]. O(U·blk) — reserved for windows
        that may straddle the buffer (checked-mode OOB), where slicing a
        clipped window would mis-pair values and targets. Out-of-range
        targets simply match no position."""
        jnp = self.jnp
        U = self.U
        tgt = _as_i32(jnp, rel) + self.jax.lax.broadcasted_iota(
            jnp.int32, (U, 1), 0) * c                      # (U, 1)
        pos = self.jax.lax.broadcasted_iota(
            jnp.int32, (U, blk_lines), 1)                  # (U, blk)
        oneh = (pos == tgt) & (mm.reshape(U, 1) != 0)
        data = ref[...]
        hit = self._any_live(oneh, axis=0)                 # (blk,)
        # sum over an exclusive one-hot is exact in the value dtype
        # (bool promotes to i32 so the sum is legal)
        work = jnp.int32 if data.dtype == jnp.bool_ else data.dtype
        if L > 1:
            contrib = jnp.sum(
                jnp.where(oneh[:, :, None],
                          new.reshape(U, 1, L).astype(work), 0), axis=0)
            ref[...] = jnp.where(hit[:, None], contrib.astype(data.dtype),
                                 data)
        else:
            contrib = jnp.sum(
                jnp.where(oneh, new.reshape(U, 1).astype(work), 0), axis=0)
            ref[...] = jnp.where(hit, contrib.astype(data.dtype), data)

    def _load_span(self, ref, rel, c, L, blk_lines, masked, mult=1):
        """(U, L) array of lines rel + c*u for u in [0, U).

        The EXACT coverage is (U-1)*c + 1 lines — slicing the full c*U
        would overshoot the block by c-1 lines, and a dynamic start then
        gets clamped back to 0 by ds semantics, silently dropping the
        offset (strided accesses near the buffer end)."""
        jnp, pl = self.jnp, self.pl
        U = self.U
        span = c * U                    # group-reshape size
        exact = (U - 1) * c + 1         # lines actually touched
        span_eff = exact
        if masked:
            # a masked load may cover a buffer shorter than one full span
            # (e.g. tree-reduction tails): load what exists, pad the rest —
            # padded lanes are mask-selected away
            span_eff = min(exact, blk_lines)
        elif exact > blk_lines:
            _kernel_fail(
                f"unmasked load of {exact} lines from a {blk_lines}-line "
                f"buffer; guard the access or use launch() (checked)")
        if blk_lines >= span and not (masked and self.interpret):
            # prefer the FULL group span when the (padded) buffer holds
            # it: the partial-load path pads with a 1D concatenate, which
            # Mosaic only allows at lane-tile boundaries (exact is odd —
            # (U-1)c+1). Excess lines land in group columns >= 1 of the
            # last unit and are sliced/masked away by the caller.
            # Compiled buffers are tail-padded (emitter max_span
            # contract) so rel + span always fits; interpret-mode
            # buffers are NOT padded, and promoting a masked load would
            # tighten the clip below to blk_lines - span, shifting a
            # fully in-bounds strided base down by up to c-1 lines
            # (value/mask mis-pairing) — keep `exact` + concat pad there.
            span_eff = span
        if masked:
            rel = self._clip_rel(rel, 0, blk_lines - span_eff)
        if L == 1 and not isinstance(rel, int) and not self.interpret:
            # dynamic 1D offset: aligned superspan + rotate
            win, _wb = self._dyn_window_1d(ref, rel, span_eff, blk_lines,
                                           mult)
            if span_eff < span:
                win = jnp.concatenate(
                    [win, jnp.zeros((span - span_eff,), win.dtype)])
            return self._shape_cast(win, (U, 1)) if c == 1 else \
                self._shape_cast(win, (U, c))[:, :1]
        row = self._hint(_as_i32(jnp, rel), U if c == 1 else 1)
        if L > 1:
            if not isinstance(rel, int) and not self.interpret:
                # dynamic row offset on a 2D ref: Mosaic cannot prove the
                # sublane alignment — aligned row superspan + roll
                chunk, _wb = self._dyn_rows_2d(ref, rel, span_eff, blk_lines,
                                               mult)
            else:
                chunk = ref[pl.ds(row, span_eff), :]   # (span_eff, L)
            if span_eff < span:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((span - span_eff, L), chunk.dtype)])
            return chunk if c == 1 else chunk.reshape(U, c, L)[:, 0, :]
        chunk = ref[pl.ds(row, span_eff)]              # (span_eff,)
        if span_eff < span:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((span - span_eff,), chunk.dtype)])
        return self._shape_cast(chunk, (U, 1)) if c == 1 \
            else self._shape_cast(chunk, (U, c))[:, :1]

    def store_buffer(self, buf: Value, idx: Value, val_ev: EV,
                     mask_ev: Optional[EV], ignore_mask: bool = False,
                     static_aff=None):
        jnp, pl = self.jnp, self.pl
        per_unit = isinstance(buf.payload, dict) and buf.payload.get("per_unit")
        if per_unit:
            return self._per_unit_access(buf, idx, val_ev, mask_ev, load=False)
        ra = self._resolve_rel(buf, idx, static_aff)
        if ra is None:
            if buf.ty.line == 1:
                return self._scatter_store(buf, idx, val_ev, mask_ev,
                                           ignore_mask)
            _kernel_fail("non-affine unit-varying store index (use plane ops "
                         "or contiguous indexing)")
        rel, c, mult = ra
        ref, L, blk_lines, _blocked = self._buffer_geometry(buf)
        U = self.U
        dtype = _elem_dtype(self.jnp, buf.ty)
        cmask = None if ignore_mask else self.current_mask()
        m = None
        if mask_ev is not None:
            m = self.materialize(mask_ev)
        if cmask is not None:
            m = cmask if m is None else m & cmask

        if c == 0:
            # uniform index with a varying value: the store happens iff any
            # unit's mask is live, and the stored value is the masked unit's
            # (sum over exclusively-masked lanes — the `if UNIT_POS == n:
            # out[i] = v` idiom; multiple live units on one address is a
            # data race on the reference GPUs too)
            if val_ev.varying:
                v = self._shape_cast(
                    self.materialize(val_ev, dtype), (U, -1))
                if m is not None and getattr(m, "ndim", 0) > 0:
                    mm = self._shape_cast(m, (U, -1))
                    picked = jnp.where(mm, v.astype(jnp.float32)
                                       if v.dtype == jnp.bool_ else v, 0)
                    v = jnp.sum(picked, axis=0).astype(dtype)
                    m = self._any_live(mm)
                else:
                    v = v[0]
                v = v.reshape(L) if L > 1 else v.reshape(())
            else:
                v = self.broadcast_to_canon(val_ev, False, L, dtype)
                if m is not None and getattr(m, "ndim", 0) > 0:
                    # uniform value under a per-unit mask (`if UNIT_POS ==
                    # n: out[i] = const`): the store fires iff ANY unit is
                    # live — collapse the (U,1) mask so the RMW below stays
                    # single-line instead of broadcasting to (U, L)
                    m = self._any_live(m)
            if m is not None:
                rel = self._clip_rel(rel, 0, blk_lines - 1)
            if L == 1 and not isinstance(rel, int):
                # dynamic single-element store → block-wide iota-select RMW
                # (Mosaic-friendly: no dynamic vector<1> access)
                data = ref[...]
                iota = self.jax.lax.broadcasted_iota(
                    jnp.int32, (blk_lines, 1), 0).reshape(blk_lines)
                sel = iota == rel
                if m is not None:
                    mm = m
                    if getattr(mm, "ndim", 0) > 0:
                        mm = self._any_live(mm)
                    sel = sel & mm
                ref[...] = jnp.where(sel, jnp.asarray(v, dtype), data)
                return
            vv = jnp.asarray(v, dtype).reshape(1, L) if L > 1 else \
                jnp.asarray(v, dtype).reshape(1)
            if L > 1 and not isinstance(rel, int) and not self.interpret \
                    and (blk_lines >= 16 or mult % 8 == 0):
                # dynamic single-row store on a 2D ref: superspan RMW
                win, wb = self._dyn_rows_2d(ref, rel, 1, blk_lines, mult)
                wb(jnp.where(m, vv, win).astype(win.dtype)
                   if m is not None else vv.astype(win.dtype))
                return
            row = self._hint(_as_i32(jnp, rel), 1)
            if m is None:
                if L > 1:
                    ref[pl.ds(row, 1), :] = vv
                else:
                    ref[pl.ds(row, 1)] = vv
            else:
                if L > 1:
                    old = ref[pl.ds(row, 1), :]
                    ref[pl.ds(row, 1), :] = jnp.where(m, vv, old)
                else:
                    old = ref[pl.ds(row, 1)]
                    ref[pl.ds(row, 1)] = jnp.where(m, vv, old)
            return
        if c < 0:
            _kernel_fail("negative unit stride in buffer store")
        span = c * U                    # group-reshape size
        exact = (U - 1) * c + 1         # lines actually touched
        v = self.broadcast_to_canon(val_ev, True, L, dtype)  # (U, L)
        if L == 1 and c > 1 and not self.interpret:
            # strided per-unit SCALAR stores: the (U, c) group reshape of
            # a 1D span is not a legal Mosaic relayout (dual of the
            # strided-load rule in load_buffer) — one-hot scatter RMW,
            # exact value/target pairing at any base incl. OOB drops
            if exact > blk_lines and m is None:
                _kernel_fail(
                    f"unmasked store of {exact} lines into a {blk_lines}-line"
                    f" buffer; guard the access or use launch() (checked)")
            mm = jnp.full((U, 1), True) if m is None else (
                m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m))
            self._onehot_masked_store(ref, rel, c, self._shape_cast(v, (U, 1)),
                                      mm, 1, blk_lines)
            return
        if L == 1 and not isinstance(rel, int) and not self.interpret:
            # dynamic 1D offset store: aligned superspan RMW + rotate
            win, wb = self._dyn_window_1d(ref, rel, exact, blk_lines, mult)
            w2 = jnp.concatenate(
                [win, jnp.zeros((span - exact,), win.dtype)]) \
                if span > exact else win
            w2 = self._shape_cast(w2, (U, c))
            new = self._shape_cast(v, (U, 1)).astype(win.dtype)
            if m is not None:
                mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m)
                new = jnp.where(mm.reshape(U, 1), new, w2[:, :1])
            merged = jnp.concatenate([new, w2[:, 1:]], axis=1) if c > 1 \
                else new
            wb(merged.reshape(span)[:exact])
            return
        rel_raw = rel  # UNCLIPPED: the dyn helpers + one-hot need the true
        # base — clipping before them shifts the value/mask correspondence
        # (round-2 fix: checked stores at negative bases landed |base| high)
        row = self._hint(_as_i32(jnp, rel), U if c == 1 else 1)
        dyn2d = L > 1 and not isinstance(rel, int) and not self.interpret
        if c == 1 and span <= blk_lines:
            new = v if L > 1 else self._shape_cast(v, (U,))
            if dyn2d:
                win, wb = self._dyn_rows_2d(ref, rel_raw, U, blk_lines, mult)
                if m is not None:
                    mm = m if getattr(m, "ndim", 0) > 0 \
                        else jnp.full((U, 1), m)
                    new = jnp.where(mm, new, win)
                wb(new.astype(win.dtype))
                return
            static_ok = isinstance(rel, int) and \
                0 <= rel and rel + U <= blk_lines
            if m is None or static_ok:
                mm = None if m is None else (
                    m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m))
                if mm is None:
                    if L > 1:
                        ref[pl.ds(row, U), :] = new
                    else:
                        ref[pl.ds(row, U)] = new
                elif L > 1:
                    old = ref[pl.ds(row, U), :]
                    ref[pl.ds(row, U), :] = jnp.where(mm, new, old)
                else:
                    old = ref[pl.ds(row, U)]
                    ref[pl.ds(row, U)] = jnp.where(
                        self._shape_cast(mm, (U,)), new, old)
                return
            # masked store whose window may straddle the buffer (traced
            # base in interpret mode, or a static out-of-range base):
            # one-hot scatter RMW keeps each unit's value/target pairing
            mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m)
            self._onehot_masked_store(ref, rel_raw, 1, new, mm, L,
                                      blk_lines)
            return
        if exact > blk_lines:
            if m is None:
                _kernel_fail(
                    f"unmasked store of {exact} lines into a {blk_lines}-line"
                    f" buffer; guard the access or use launch() (checked)")
            # short-buffer masked store: row-range RMW over what exists
            span_eff = blk_lines
            rel2 = self._clip_rel(rel, 0, 0)
            row2 = self._hint(_as_i32(jnp, rel2), 1)
            if L > 1:
                chunk = ref[pl.ds(row2, span_eff), :]
                full = jnp.concatenate(
                    [chunk, jnp.zeros((span - span_eff, L), chunk.dtype)])
            else:
                chunk = ref[pl.ds(row2, span_eff)]
                full = jnp.concatenate(
                    [chunk, jnp.zeros((span - span_eff,), chunk.dtype)])
            full2 = full.reshape(U, c * L if L > 1 else c)
            new2 = v.astype(full.dtype) if L > 1 else \
                v.reshape(U, 1).astype(full.dtype)
            if m is not None:
                mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m)
                lead = new2 if L > 1 else new2
                old_lead = full2[:, :L] if L > 1 else full2[:, :1]
                sel = jnp.where(mm, lead, old_lead)
            else:
                sel = new2
            if c == 1:
                merged = sel
            else:
                merged = jnp.concatenate(
                    [sel, full2[:, (L if L > 1 else 1):]], axis=1)
            flat = merged.reshape(span, L) if L > 1 else merged.reshape(span)
            if L > 1:
                ref[pl.ds(row2, span_eff), :] = flat[:span_eff]
            else:
                ref[pl.ds(row2, span_eff)] = flat[:span_eff]
            return
        # strided store (c > 1): read-modify-write the covering rows —
        # exact-span RMW (the full c*U slice would overshoot the block)
        if L > 1:
            if dyn2d:
                chunk, wb = self._dyn_rows_2d(ref, rel, exact, blk_lines,
                                              mult)
            else:
                chunk = ref[pl.ds(row, exact), :]      # (exact, L)
                wb = None
            full = jnp.concatenate(
                [chunk, jnp.zeros((span - exact, L), chunk.dtype)]
            ).reshape(U, c, L)
            new = v.astype(chunk.dtype)[:, None, :]
            if m is not None:
                mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m)
                new = jnp.where(mm[:, None, :], new, full[:, :1, :])
            lane0 = self.jax.lax.broadcasted_iota(jnp.int32, (1, c, 1), 1)
            merged = jnp.where(lane0 == 0, new, full)
            if wb is not None:
                wb(merged.reshape(span, L)[:exact])
            else:
                ref[pl.ds(row, exact), :] = merged.reshape(span, L)[:exact]
        else:
            chunk = ref[pl.ds(row, exact)]             # (exact,)
            full = jnp.concatenate(
                [chunk, jnp.zeros((span - exact,), chunk.dtype)]
            ).reshape(U, c)
            new = v.reshape(U, 1).astype(chunk.dtype)
            if m is not None:
                mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((U, 1), m)
                new = jnp.where(mm, new, full[:, :1])
            pos0 = self.jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            merged = jnp.where(pos0 == 0, new, full)
            ref[pl.ds(row, exact)] = merged.reshape(span)[:exact]

    def _scatter_store(self, buf, idx, val_ev, mask_ev, ignore_mask):
        """Unit-varying non-affine store: one-hot scatter over the resident
        block (duplicate indices sum — a data race on the reference GPUs
        too). O(block) VPU work — avoid in hot kernels."""
        jnp = self.jnp
        ref, L, blk_lines, _blocked = self._buffer_geometry(buf)
        iv = self.materialize(self.get(idx))  # (U, 1) int
        iv = jnp.broadcast_to(jnp.asarray(iv).reshape(-1, 1), (self.U, 1))
        iv = iv - self._block_base(buf)
        dtype = _elem_dtype(jnp, buf.ty)
        v = self.broadcast_to_canon(val_ev, True, 1, dtype)  # (U, 1)
        m = None if ignore_mask else self.current_mask()
        if mask_ev is not None:
            mk = self.materialize(mask_ev)
            m = mk if m is None else m & mk
        col = self.jax.lax.broadcasted_iota(jnp.int32, (self.U, blk_lines), 1)
        onehot = col == iv
        if m is not None:
            mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((self.U, 1), m)
            onehot = onehot & mm
        data = ref[...]
        acc_dt = jnp.float32 if dtype != jnp.int32 else jnp.int32
        scattered = jnp.sum(jnp.where(onehot, v, 0).astype(acc_dt), axis=0)
        written = self._any_live(onehot, axis=0)
        ref[...] = jnp.where(written, scattered.astype(data.dtype), data)

    def _nd_access(self, inst: Instruction) -> None:
        """Load/store one element per (unit, lane) through an ND-blocked
        BlockSpec: per-dim relative offsets from the planner's affine forms
        (grid terms cancel against the index_map); the unit axis rides at
        most one dim."""
        jnp, pl = self.jnp, self.pl
        op = inst.op
        oc = op.opcode
        buf = op.args[0]
        plan = self.plans[buf.vid]
        ref = self.refs[buf.vid]
        L = plan.param.ty.line
        affs = op.attrs["nd_affine"]
        rank = len(affs)
        blocks = plan.nd_block
        is_store = oc in (O.STORE, O.STORE_MASKED)
        mask_ev = None
        if oc == O.INDEX_MASKED:
            mask_ev = self.get(op.args[2])
        elif oc == O.STORE_MASKED:
            mask_ev = self.get(op.args[3])

        rels = []
        unit_dim, cu = None, 0
        for d, aff in enumerate(affs):
            r = self.static_rel(aff, blocked=True)
            if r is None:
                _kernel_fail("nd access lost its affine form at eval")
            uni, c = r
            if c:
                unit_dim, cu = d, c
            rels.append(uni)

        U = self.U
        idxers = []
        for d in range(rank):
            rel = rels[d]
            if d == unit_dim:
                span = cu * U
                if mask_ev is not None:
                    rel = self._clip_rel(rel, 0, blocks[d] - span)
                hint = U if cu == 1 else 1
                idxers.append(pl.ds(self._hint(_as_i32(jnp, rel), hint),
                                    span))
            else:
                if mask_ev is not None:
                    rel = self._clip_rel(rel, 0, blocks[d] - 1)
                idxers.append(pl.ds(_as_i32(jnp, rel), 1))
        if L > 1:
            idxers.append(slice(None))
        idxers = tuple(idxers)

        def to_canon(chunk):
            # chunk dims: 1 everywhere except unit dim (cu*U) (+ L)
            if unit_dim is None:
                return chunk.reshape(L) if L > 1 else chunk.reshape(())
            flat = chunk.reshape(cu * U, L) if L > 1 else \
                chunk.reshape(cu * U, 1)
            return flat if cu == 1 else flat.reshape(U, cu, -1)[:, 0, :]

        if not is_store:
            val = to_canon(ref[idxers])
            varying = unit_dim is not None
            ev = EV(arr=val, varying=varying, line=L)
            if mask_ev is not None:
                m = self.materialize(mask_ev)
                val = self.materialize(ev)
                ev = EV(arr=jnp.where(m, val, jnp.zeros_like(val)),
                        varying=varying or mask_ev.varying, line=L)
            self.set_env(inst.out, ev)
            return

        # store
        val_ev = self.get(op.args[2])
        dtype = _elem_dtype(jnp, buf.ty)
        cmask = self.current_mask()
        m = None
        if mask_ev is not None:
            m = self.materialize(mask_ev)
        if cmask is not None:
            m = cmask if m is None else m & cmask
        varying_tgt = unit_dim is not None
        if not varying_tgt and val_ev.varying:
            # uniform target, varying value: masked-unit select
            v = self._shape_cast(
                self.materialize(val_ev, dtype), (U, -1))
            if m is not None and getattr(m, "ndim", 0) > 0:
                mm = self._shape_cast(m, (U, -1))
                v = jnp.sum(jnp.where(mm, self._widen(v), 0),
                            axis=0).astype(dtype)
                m = self._any_live(mm)
            else:
                v = v[0]
            new = v.reshape(L) if L > 1 else v.reshape(())
        else:
            new = self.broadcast_to_canon(val_ev, varying_tgt, L, dtype)
            if not varying_tgt and m is not None and \
                    getattr(m, "ndim", 0) > 0:
                # uniform value + uniform target under a per-unit mask:
                # collapse (see store_buffer's c == 0 path)
                m = self._any_live(m)
        chunk_shape = ref[idxers].shape if (m is not None or cu > 1) else None
        if m is None and (unit_dim is None or cu == 1):
            ref[idxers] = new.reshape(
                tuple(1 if d != unit_dim else U for d in range(rank))
                + ((L,) if L > 1 else ()))
            return
        old = to_canon(ref[idxers])
        if m is not None:
            mm = m
            if getattr(mm, "ndim", 0) == 0 and varying_tgt:
                mm = jnp.full((U, 1), mm)
            merged = jnp.where(mm, new, old) if varying_tgt else \
                jnp.where(mm, new, old)
        else:
            merged = new
        # write back through the same window (inverse of to_canon)
        if unit_dim is None:
            ref[idxers] = merged.reshape(ref[idxers].shape)
            return
        if cu == 1:
            ref[idxers] = merged.reshape(
                tuple(1 if d != unit_dim else U for d in range(rank))
                + ((L,) if L > 1 else ()))
        else:
            full = ref[idxers].reshape(U, cu, -1)
            lane0 = self.jax.lax.broadcasted_iota(jnp.int32, (1, cu, 1), 1)
            m3 = merged.reshape(U, 1, -1)
            out3 = jnp.where(lane0 == 0, m3, full)
            ref[idxers] = out3.reshape(ref[idxers].shape)

    def _per_unit_access(self, buf, idx, val_ev, mask_ev, load: bool):
        """Per-unit local Array: scratch shape (U, len*L); uniform index only."""
        jnp, pl = self.jnp, self.pl
        ref = self.refs[buf.vid]
        L = buf.ty.line
        ev = self.get(idx)
        if ev.varying:
            _kernel_fail("per-unit Array with unit-varying index")
        i = _as_i32(jnp, self.materialize(ev))
        if load:
            val = ref[:, pl.ds(i * L, L)]  # (U, L)
            return EV(arr=val if L > 1 else val, varying=True, line=L)
        dtype = _elem_dtype(jnp, buf.ty)
        v = self.broadcast_to_canon(val_ev, True, L, dtype)
        m = self.current_mask()
        if mask_ev is not None:
            mk = self.materialize(mask_ev)
            m = mk if m is None else m & mk
        if m is None:
            ref[:, pl.ds(i * L, L)] = v
        else:
            old = ref[:, pl.ds(i * L, L)]
            mm = m if getattr(m, "ndim", 0) > 0 else jnp.full((self.U, 1), m)
            ref[:, pl.ds(i * L, L)] = jnp.where(mm, v, old)

    def _reverse_rows(self, val):
        """Reverse the sublane axis. ``lax.rev`` has no Mosaic lowering,
        so compiled kernels use an anti-diagonal one-hot matmul (the MXU
        eats the O(U^2) MACs; exact for f32/i32 inputs)."""
        jnp = self.jnp
        if self.interpret:
            return jnp.flip(val, axis=0)
        squeeze = val.ndim == 1
        v2 = val.reshape(val.shape[0], 1) if squeeze else val
        n = v2.shape[0]
        i = self.jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        j = self.jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        anti = i + j == n - 1
        if v2.dtype == jnp.int32:
            out = jnp.dot(anti.astype(jnp.int32), v2,
                          preferred_element_type=jnp.int32)
        else:
            out = jnp.dot(anti.astype(v2.dtype), v2,
                          preferred_element_type=jnp.float32) \
                .astype(v2.dtype)
        return out.reshape(val.shape) if squeeze else out

    def _widen(self, x):
        """32-bit view of a value for shape casts: Mosaic only inserts/
        removes minor dims on 32-bit types. Exact round-trips: bf16/f16→f32,
        i8/i16→i32, bool→i32, u8/u16→u32."""
        jnp = self.jnp
        dt = jnp.dtype(x.dtype)
        if dt == jnp.bool_:
            return x.astype(jnp.int32)
        if dt.itemsize == 4:
            return x
        # NB: ml_dtypes customs (bfloat16, fp8) have numpy kind 'V' —
        # dt.kind checks misroute them; issubdtype knows the hierarchy
        if jnp.issubdtype(dt, jnp.floating):
            return x.astype(jnp.float32)
        if jnp.issubdtype(dt, jnp.unsignedinteger):
            return x.astype(jnp.uint32)
        return x.astype(jnp.int32)

    def _shape_cast(self, x, shape):
        """Mosaic-safe reshape: sub-32-bit dtypes round-trip through a
        32-bit type (tpu.reshape only inserts/removes minor dims on
        32-bit elements)."""
        jnp = self.jnp
        if not hasattr(x, "reshape"):
            return jnp.asarray(x).reshape(shape)
        if tuple(x.shape) == tuple(shape):
            return x
        if self.interpret or jnp.dtype(x.dtype).itemsize == 4:
            return x.reshape(shape)
        orig = x.dtype
        wide = self._widen(x).reshape(shape)
        if orig == jnp.bool_:
            return wide != 0
        return wide.astype(orig)

    def _any_live(self, m, axis=None):
        """jnp.any that Mosaic can lower: bool-vector reductions emit
        illegal tpu.mask_cast ops — reduce an i32 view instead."""
        jnp = self.jnp
        if self.interpret or getattr(m, "ndim", 0) == 0:
            return jnp.any(m, axis=axis)
        return jnp.max(m.astype(jnp.int32), axis=axis) != 0

    def _gather_load(self, buf, idx, mask_ev, out_line):
        """Unit-varying non-affine load: one-hot matmul gather over the
        resident block (exact but O(block) — avoid in hot kernels)."""
        jnp = self.jnp
        ref, line, blk_lines, _blocked = self._buffer_geometry(buf)
        if line != 1:
            _kernel_fail("non-affine gather only supported for line_size=1")
        ev = self.get(idx)
        iv = self.materialize(ev)  # (U, 1) int
        rel = iv - self._block_base(buf)
        data = ref[...]
        data2d = data.reshape(1, -1)
        cols = data2d.shape[-1]
        col = self.jax.lax.broadcasted_iota(jnp.int32, (self.U, cols), 1)
        onehot = (col == rel).astype(data.dtype)
        val = jnp.dot(onehot, data2d.reshape(cols, 1),
                      preferred_element_type=jnp.float32
                      if data.dtype != jnp.int32 else jnp.int32)
        val = val.astype(data.dtype)
        return EV(arr=val, varying=True, line=1)

    def _eval_atomic(self, inst: Instruction) -> None:
        """Lockstep-exact atomics: per-unit results follow the serialized
        unit order (exclusive prefix), which matches any valid GPU
        interleaving. Grid-level atomicity holds because the TPU Pallas grid
        executes sequentially on a core (SURVEY §2.9 multi-stream caveat)."""
        jnp = self.jnp
        oc = inst.op.opcode
        out = inst.out
        args = inst.op.args
        buf, idx = args[0], args[1]
        idx_ev = self.get(idx)
        if idx_ev.varying:
            _kernel_fail("atomic with unit-varying index")
        old_ev = self.load_buffer(buf, idx, None, buf.ty.line)
        old = self.materialize(old_ev)
        if oc == O.ATOMIC_LOAD:
            self.set_env(out, old_ev)
            return
        val_ev = self.get(args[2]) if len(args) > 2 else None
        m = self.current_mask()

        def masked(v, neutral):
            if m is None:
                return v
            return jnp.where(m, v, neutral)

        if oc == O.ATOMIC_STORE:
            self.store_buffer(buf, idx, val_ev, None)
            return
        dtype = getattr(old, "dtype", None)
        old2d = jnp.asarray(old).reshape(1, -1)  # (1, L)
        v = self.broadcast_to_canon(val_ev, True, buf.ty.line, dtype)
        v = v.reshape(self.U, -1)
        if oc == O.ATOMIC_ADD or oc == O.ATOMIC_SUB:
            sgn = 1 if oc == O.ATOMIC_ADD else -1
            vm = masked(v, jnp.zeros_like(v))
            # exclusive prefix over the unit axis via log-step sublane
            # rotates (jnp.cumsum has no Mosaic lowering)
            incl = self._seg_scan(vm, jnp.add, 0, self.U)
            prefix = incl - vm
            total = jnp.sum(vm, axis=0, keepdims=True)
            if out is not None:
                self.set_env(out, EV(arr=old2d + sgn * prefix, varying=True,
                                     line=buf.ty.line))
            new = old2d + sgn * total
        elif oc in (O.ATOMIC_MAX, O.ATOMIC_MIN):
            red = jnp.max if oc == O.ATOMIC_MAX else jnp.min
            cmb = jnp.maximum if oc == O.ATOMIC_MAX else jnp.minimum
            neutral = jnp.broadcast_to(old2d, v.shape)
            vm = masked(v, neutral)
            new = cmb(red(vm, axis=0, keepdims=True), old2d)
            if out is not None:
                # per-unit old value approximated by the initial value (valid
                # interleaving where all units read before any write)
                self.set_env(out, EV(arr=jnp.broadcast_to(old2d, v.shape),
                                     varying=True, line=buf.ty.line))
        elif oc in (O.ATOMIC_AND, O.ATOMIC_OR, O.ATOMIC_XOR):
            neutral_val = -1 if oc == O.ATOMIC_AND else 0
            vm = masked(v, jnp.full_like(v, neutral_val))

            def scan3(fn):
                acc = old2d
                for u in range(self.U):
                    acc = fn(acc, vm[u:u + 1])
                return acc

            if oc == O.ATOMIC_AND:
                new = scan3(jnp.bitwise_and)
            elif oc == O.ATOMIC_OR:
                new = scan3(jnp.bitwise_or)
            else:
                new = scan3(jnp.bitwise_xor)
            if out is not None:
                self.set_env(out, EV(arr=jnp.broadcast_to(old2d, v.shape),
                                     varying=True, line=buf.ty.line))
        elif oc == O.ATOMIC_SWAP:
            if m is not None:
                _kernel_fail("masked atomic swap")
            new = v[-1:]
            if out is not None:
                self.set_env(out, EV(arr=jnp.broadcast_to(old2d, v.shape),
                                     varying=True, line=buf.ty.line))
        elif oc == O.ATOMIC_CAS:
            cmp_ev, val2_ev = self.get(args[2]), self.get(args[3])
            cmp_v = self.broadcast_to_canon(cmp_ev, False, buf.ty.line, dtype)
            v2 = self.broadcast_to_canon(val2_ev, False, buf.ty.line, dtype)
            new = jnp.where(old2d == cmp_v.reshape(1, -1),
                            v2.reshape(1, -1), old2d)
            if out is not None:
                self.set_env(out, EV(arr=old, varying=False, line=buf.ty.line))
        else:
            _kernel_fail(f"atomic op {oc}")
        shape = old.shape if hasattr(old, "shape") else ()
        new_arr = new.reshape(shape) if shape else new.reshape(())
        new_ev = EV(arr=new_arr, varying=False, line=buf.ty.line)
        self.store_buffer(buf, idx, new_ev, None, ignore_mask=True)

