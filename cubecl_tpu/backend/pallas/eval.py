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
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

from ...ir import ops as O
from ...ir.ops import Instruction
from ...ir.scope import Scope, walk
from ...ir.types import Type
from ...ir.value import Builtin, Value, VarKind


# ---------------------------------------------------------------------------


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


class Evaluator:
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

    # ------------------------------------------------------------ helpers

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

    # -------------------------------------------------- affine index helpers

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

    # ----------------------------------------------------------- buffer IO

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

    # -- dynamic 1D windows (Mosaic proves no alignment for dynamic 1D
    #    offsets, so we load an aligned superspan and rotate) --------------

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

    # -- Mosaic dtype-legality shims -------------------------------------
    # (all found by the round-3 TPU smoke suite: the interpreter accepts
    # shapes/dtypes Mosaic rejects)

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

    # ------------------------------------------------------------ plane ops

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

    _PLANE_NEUTRAL = {"add": 0, "mul": 1, "max": None, "min": None}

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

    # --------------------------------------------------------------- runner

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

    # -------------------------------------------------------------- dispatch

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

    # ------------------------------------------------------------- pure ops

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

    # ---------------------------------------------------------- control flow

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

    # --------------------------------------------------------------- plane

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

    # ----------------------------------------------------------------- mma

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

    # -------------------------------------------------------------- atomics

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


# ---------------------------------------------------------------------------
# Pure-op lowering table: opcode -> (evaluator, inst, materialized args) -> arr
# ---------------------------------------------------------------------------


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


def _line_reduce(ev, x, red):
    x = ev.jnp.asarray(x)
    if x.ndim <= 1:
        return red(x)
    return red(x, axis=-1, keepdims=True)


_PURE_LOWERING = _mk_pure_table()


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
