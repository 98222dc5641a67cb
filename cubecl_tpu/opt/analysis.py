"""Static analyses feeding the Pallas emitter.

1. **Uniformity** — is a value identical across all units of a cube?
   (reference cubecl-opt/src/analyses/uniformity.rs:13; there it drives
   SPIR-V NonUniform decorations, here it decides whether a value lowers to
   a scalar or to an array over the unit axis, and whether control flow
   lowers to ``lax.cond`` or to masked/predicated execution).

2. **Affine access analysis + block planning** — every buffer access index
   is abstracted as an affine form over unit positions, grid positions and
   loop variables. Accesses whose windows are grid-translated blocks give
   the buffer a Pallas ``BlockSpec`` (HBM→VMEM pipelining handled by
   Mosaic); everything else falls back to whole-buffer VMEM residency.
   This replaces the reference's pointer/index analyses
   (cubecl-opt/src/analyses/{integer_range,pointer_source}.rs) with the
   TPU-native question: *what BlockSpec does this access pattern imply?*
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ..ir import ops as O
from ..ir.ops import Instruction
from ..ir.scope import BufferParam, Scope, walk
from ..ir.value import Builtin, UNIT_VARYING, Value, VarKind

UNIT_SYMS = ("ux", "uy", "uz")
GRID_SYMS = ("cx", "cy", "cz")

_BUILTIN_SYM = {
    Builtin.UNIT_POS_X: "ux", Builtin.UNIT_POS_Y: "uy", Builtin.UNIT_POS_Z: "uz",
    Builtin.CUBE_POS_X: "cx", Builtin.CUBE_POS_Y: "cy", Builtin.CUBE_POS_Z: "cz",
}


# ---------------------------------------------------------------------------
# Uniformity
# ---------------------------------------------------------------------------


class UniformityAnalysis:
    """Fixpoint uniformity over the structured scope tree."""

    def __init__(self, scope: Scope):
        self.scope = scope
        self.varying: Set[int] = set()          # vids known unit-varying
        self.varying_shared: Set[int] = set()   # shared buffers w/ varying contents
        self._run()

    def is_varying_value(self, v: Value) -> bool:
        if v.kind == VarKind.BUILTIN:
            return v.payload in UNIT_VARYING
        if v.kind == VarKind.CONSTANT or v.kind == VarKind.SCALAR:
            return False
        if v.kind == VarKind.BUFFER:
            return False
        return v.vid in self.varying

    def _run(self) -> None:
        for _ in range(64):
            if not self._sweep(self.scope, ctx_varying=False):
                return
        # safety net: treat everything as varying if no fixpoint (shouldn't
        # happen — the lattice only descends)

    def _cond_varying(self, inst: Instruction) -> bool:
        if inst.op.opcode == O.WHILE:
            cv = inst.op.attrs.get("cond_value")
            return cv is not None and self.is_varying_value(cv)
        if inst.op.opcode == O.RANGE_LOOP:
            # any varying bound ⇒ per-unit trip counts ⇒ varying context
            return any(self.is_varying_value(a) for a in inst.op.args)
        if inst.op.args:
            return self.is_varying_value(inst.op.args[0])
        return False

    def _sweep(self, scope: Scope, ctx_varying: bool) -> bool:
        changed = False
        for inst in scope.instructions:
            oc = inst.op.opcode
            # recurse with branch context
            if oc in (O.IF, O.IF_ELSE, O.SWITCH, O.RANGE_LOOP, O.WHILE, O.LOOP):
                sub_ctx = ctx_varying or self._cond_varying(inst)
                if oc == O.RANGE_LOOP:
                    # the index var is varying iff start or step varies
                    # (a varying STOP only changes how many iterations are
                    # alive per unit — the index itself stays uniform)
                    lv = inst.op.attrs["var"]
                    if (self.is_varying_value(inst.op.args[0])
                            or self.is_varying_value(inst.op.args[2])) and \
                            lv.vid not in self.varying:
                        self.varying.add(lv.vid)
                        changed = True
                if oc == O.LOOP:
                    # a break under a varying condition makes carries varying;
                    # approximated by scanning for varying-cond ifs w/ breaks
                    sub_ctx = sub_ctx or _has_varying_break(
                        inst.op.attrs["body"], self)
                for key in ("then", "orelse", "body", "cond_scope"):
                    sub = inst.op.attrs.get(key)
                    if isinstance(sub, Scope):
                        changed |= self._sweep(sub, sub_ctx)
                for _c, sub in inst.op.attrs.get("cases", []):
                    changed |= self._sweep(sub, sub_ctx)

            out = inst.out
            var = ctx_varying
            if oc in (O.PLANE_ELECT, O.PLANE_BALLOT, O.PLANE_BROADCAST,
                      O.PLANE_SHUFFLE, O.PLANE_SHUFFLE_XOR, O.PLANE_SHUFFLE_UP,
                      O.PLANE_SHUFFLE_DOWN, O.PLANE_INCLUSIVE_SUM,
                      O.PLANE_EXCLUSIVE_SUM, O.PLANE_INCLUSIVE_PROD,
                      O.PLANE_EXCLUSIVE_PROD):
                var = True
            elif oc in (O.PLANE_SUM, O.PLANE_PROD, O.PLANE_MAX, O.PLANE_MIN,
                        O.PLANE_ALL, O.PLANE_ANY):
                # plane-uniform, cube-varying unless the cube is one plane
                var = True
            elif oc == O.INDEX or oc == O.INDEX_MASKED:
                buf = inst.op.args[0]
                idx_var = any(self.is_varying_value(a) for a in inst.op.args[1:])
                shared_var = (buf.kind == VarKind.SHARED
                              and buf.vid in self.varying_shared)
                var = var or idx_var or shared_var
            elif oc.startswith("atomic."):
                var = True
            else:
                var = var or any(self.is_varying_value(a) for a in inst.op.args)

            if oc in (O.STORE, O.STORE_MASKED):
                buf = inst.op.args[0]
                if buf.kind == VarKind.SHARED and buf.vid not in self.varying_shared:
                    stored_var = ctx_varying or any(
                        self.is_varying_value(a) for a in inst.op.args[1:])
                    if stored_var:
                        self.varying_shared.add(buf.vid)
                        changed = True

            if out is not None and var and out.vid not in self.varying:
                self.varying.add(out.vid)
                changed = True
        return changed


def _has_varying_break(scope: Scope, ua: UniformityAnalysis) -> bool:
    for s, inst in walk(scope):
        if inst.op.opcode == O.BREAK:
            return True  # conservative: any break in a LOOP ⇒ varying ctx risk
    return False


# ---------------------------------------------------------------------------
# Affine forms + block planning
# ---------------------------------------------------------------------------


@dataclass
class Affine:
    """const + Σ coeff·sym. Syms: ux/uy/uz, cx/cy/cz, L<vid> (loop vars with
    static ranges), D<vid> (dynamic uniform scalars with unknown range)."""

    const: int = 0
    coeffs: Dict[str, int] = field(default_factory=dict)

    def add(self, other: "Affine", sign: int = 1) -> "Affine":
        out = Affine(self.const + sign * other.const, dict(self.coeffs))
        for s, c in other.coeffs.items():
            out.coeffs[s] = out.coeffs.get(s, 0) + sign * c
            if out.coeffs[s] == 0:
                del out.coeffs[s]
        return out

    def scale(self, k: int) -> "Affine":
        if k == 0:
            return Affine(0)
        return Affine(self.const * k, {s: c * k for s, c in self.coeffs.items()})

    def is_const(self) -> bool:
        return not self.coeffs


@dataclass
class Access:
    """One buffer access site, in lines."""

    inst: Instruction
    affine: Optional[Affine]     # None = non-affine
    is_store: bool
    line: int
    span: int = 1                # lines touched from the base index (mma tiles)
    conditional: bool = False    # masked or under control flow


@dataclass
class BufferPlan:
    """Lowering plan for one kernel buffer."""

    param: BufferParam
    mode: str = "whole"                    # "whole" | "blocked"
    block_lines: int = 0
    grid_coeffs: Dict[str, int] = field(default_factory=dict)  # block-index coeffs
    base_const: int = 0                    # block-index constant part
    has_load: bool = False
    has_store: bool = False
    store_covers_all: bool = False
    # whole-mode tail padding (lines): guarantees span loads/stores never
    # need a start clamp (which would shift the value/mask correspondence)
    pad_lines: int = 0
    # why a blocked plan was demoted to whole-VMEM residency (used by
    # launch validation to name the offending access pattern when the
    # resident buffer blows the scoped-VMEM ceiling)
    demote_reason: str = ""
    max_span: int = 0                      # max unit-span (c*U) of accesses
    # ND ("nd") mode: per-dimension blocking of row-major tensors
    nd_shape: tuple = ()                   # logical dims (innermost in lines)
    nd_block: tuple = ()                   # block size per dim
    nd_grid_coeffs: tuple = ()             # per-dim {grid_sym: block_coeff}


def analyze_affine(scope: Scope, ua: UniformityAnalysis,
                   loop_ranges: Dict[int, Tuple[int, int, int]],
                   cube_dim: Tuple[int, int, int],
                   cube_count: Tuple[int, int, int] = (1, 1, 1)):
    """Forward affine abstract interpretation. Returns value-vid → Affine
    (missing = non-affine / not integer). ``loop_ranges`` maps RANGE_LOOP
    var vids to (start, stop, step) when static."""
    env: Dict[int, Optional[Affine]] = {}
    Ux, Uy, Uz = cube_dim
    Cx, Cy, Cz = cube_count
    U = Ux * Uy * Uz

    def get(v: Value) -> Optional[Affine]:
        if v.kind == VarKind.CONSTANT:
            if isinstance(v.const, bool) or not isinstance(v.const, int):
                return None
            return Affine(int(v.const))
        if v.kind == VarKind.BUILTIN:
            b = v.payload
            if b in _BUILTIN_SYM:
                return Affine(0, {_BUILTIN_SYM[b]: 1})
            if b == Builtin.UNIT_POS:
                return Affine(0, {"ux": 1, "uy": Ux, "uz": Ux * Uy})
            if b == Builtin.CUBE_POS:
                return Affine(0, {"cx": 1, "cy": Cx, "cz": Cx * Cy})
            if b == Builtin.ABSOLUTE_POS:
                # global linear unit id, x-fastest (reference AbsolutePos):
                # (cz*Cy*Cx + cy*Cx + cx)*U + uz*Uy*Ux + uy*Ux + ux
                return Affine(0, {"ux": 1, "uy": Ux, "uz": Ux * Uy,
                                  "cx": U, "cy": U * Cx, "cz": U * Cx * Cy})
            if b == Builtin.ABSOLUTE_POS_X:
                return Affine(0, {"ux": 1, "cx": Ux})
            if b == Builtin.ABSOLUTE_POS_Y:
                return Affine(0, {"uy": 1, "cy": Uy})
            if b == Builtin.ABSOLUTE_POS_Z:
                return Affine(0, {"uz": 1, "cz": Uz})
            if b in (Builtin.UNIT_POS_PLANE, Builtin.PLANE_POS):
                return None
            return None
        if v.kind == VarKind.SCALAR:
            return Affine(0, {f"D{v.vid}": 1})
        if v.vid in loop_ranges:
            return Affine(0, {f"L{v.vid}": 1})
        return env.get(v.vid)

    def visit(s: Scope) -> None:
        for inst in s.instructions:
            for key in ("then", "orelse", "body", "cond_scope"):
                sub = inst.op.attrs.get(key)
                if isinstance(sub, Scope):
                    visit(sub)
            for _c, sub in inst.op.attrs.get("cases", []):
                visit(sub)
            out = inst.out
            if out is None or not out.ty.elem.is_int or out.ty.line != 1:
                continue
            if out.kind == VarKind.LOCAL_MUT:
                # mut locals may be rewritten under control flow — only track
                # if every write agrees (conservatively: don't track)
                env[out.vid] = None
                continue
            oc = inst.op.opcode
            args = inst.op.args
            a = get(args[0]) if args else None
            bb = get(args[1]) if len(args) > 1 else None
            res: Optional[Affine] = None
            if oc in (O.ADD,) and a and bb:
                res = a.add(bb)
            elif oc == O.SUB and a and bb:
                res = a.add(bb, -1)
            elif oc == O.MUL and a and bb:
                if a.is_const():
                    res = bb.scale(a.const)
                elif bb.is_const():
                    res = a.scale(bb.const)
            elif oc == O.NEG and a:
                res = a.scale(-1)
            elif oc in (O.COPY, O.CAST) and a:
                res = a
            elif oc in (O.FLOORDIV, O.DIV) and a and bb and bb.is_const() \
                    and bb.const > 0:
                k = bb.const
                if a.const % k == 0 and all(c % k == 0 for c in a.coeffs.values()):
                    res = Affine(a.const // k,
                                 {sx: c // k for sx, c in a.coeffs.items()})
            elif oc == O.MOD and a and bb and bb.is_const() and bb.const > 0:
                k = bb.const
                if a.const % k == 0 and all(c % k == 0 for c in a.coeffs.values()):
                    res = Affine(0)
            env[out.vid] = res

    visit(scope)
    return env, get


def collect_loop_ranges(scope: Scope) -> Dict[int, Tuple[int, int, int]]:
    out: Dict[int, Tuple[int, int, int]] = {}
    for _s, inst in walk(scope):
        if inst.op.opcode == O.RANGE_LOOP:
            start, stop, step = inst.op.args
            if start.is_const and stop.is_const and step.is_const:
                out[inst.op.attrs["var"].vid] = (
                    int(start.const), int(stop.const), int(step.const))
    return out


def flat_unit_coeff(coeffs: Dict[str, int], cube_dim) -> Optional[int]:
    """Slope of an affine form along the flattened (x-fastest) unit id;
    None when per-dim coefficients are inconsistent with flattening.
    Size-1 dims are ignored. Mirrors Evaluator.flat_unit_coeff so the
    static plan and the eval-time lowering agree."""
    Ux, Uy, Uz = cube_dim
    dims = [(Ux, coeffs.get("ux", 0), 1),
            (Uy, coeffs.get("uy", 0), Ux),
            (Uz, coeffs.get("uz", 0), Ux * Uy)]
    c: Optional[int] = None
    for n, coeff, factor in dims:
        if n == 1:
            continue
        if coeff % factor != 0:
            return None
        want = coeff // factor
        if c is None:
            c = want
        elif c != want:
            return None
    return 0 if c is None else c


def _sym_range(sym: str, cube_dim, loop_ranges) -> Optional[Tuple[int, int]]:
    """Inclusive [min, max] of a non-grid symbol, None if unbounded."""
    if sym == "ux":
        return (0, cube_dim[0] - 1)
    if sym == "uy":
        return (0, cube_dim[1] - 1)
    if sym == "uz":
        return (0, cube_dim[2] - 1)
    if sym.startswith("L"):
        start, stop, step = loop_ranges[int(sym[1:])]
        if step > 0 and stop > start:
            last = start + ((stop - 1 - start) // step) * step
            return (start, last)
        if step < 0 and stop < start:
            last = start + ((stop + 1 - start) // step) * step
            return (min(start, last), max(start, last))
        return (0, 0)  # empty loop
    return None  # dynamic scalar


def _try_nd_plan(plan: BufferPlan, accs, get, cube_dim, cube_count,
                 loop_ranges, U: int) -> bool:
    """Per-dimension block planning for full-rank tensor accesses on
    row-major buffers: each dim gets its own (grid coeff, window) and the
    Pallas BlockSpec becomes multi-dimensional. The unit axis may ride at
    most one dim per access."""
    if not accs or not all(
            "nd" in a.inst.op.attrs and a.affine is not None for a in accs):
        return False
    rank = len(accs[0].inst.op.attrs["nd"])
    if rank < 2 or any(len(a.inst.op.attrs["nd"]) != rank for a in accs):
        return False
    shape = accs[0].inst.op.attrs["nd_shape"]
    L = plan.param.ty.line
    dims = list(shape[:-1]) + [shape[-1] // max(L, 1)]  # innermost in lines

    def nd_spans(a):
        """Per-dim extent of one access: 1 for element accesses, the
        fragment extent (rows, cols-in-lines) for MMA slab accesses."""
        if a.inst.op.opcode in (O.MMA_LOAD, O.MMA_STORE):
            mat = a.inst.op.args[0]
            r_, c_ = mat.shape
            if a.inst.op.attrs.get("layout") == "col_major":
                r_, c_ = c_, r_
            return (r_, -(-c_ // max(L, 1)))
        return (1,) * rank

    grid: Optional[list] = None
    windows = [0] * rank
    for a in accs:
        nds = a.inst.op.attrs["nd"]
        affs = [get(v) for v in nds]
        if any(x is None for x in affs):
            return False
        a.inst.op.attrs["nd_affine"] = affs
        spans = nd_spans(a)
        unit_dims = 0
        g_this = []
        for d, aff in enumerate(affs):
            g = {s: c for s, c in aff.coeffs.items()
                 if s in GRID_SYMS and c != 0
                 and {"cx": cube_count[0], "cy": cube_count[1],
                      "cz": cube_count[2]}[s] > 1}
            g_this.append(g)
            cu = flat_unit_coeff(aff.coeffs, cube_dim)
            if cu is None or cu < 0:
                return False
            if cu:
                unit_dims += 1
            lo = hi = aff.const
            for s, c in aff.coeffs.items():
                if s in GRID_SYMS:
                    continue
                r = _sym_range(s, cube_dim, loop_ranges)
                if r is None:
                    return False
                lo += min(c * r[0], c * r[1])
                hi += max(c * r[0], c * r[1])
            if lo < 0:
                return False
            if cu > 1:
                hi = max(hi, lo + cu * U - 1)
            windows[d] = max(windows[d], hi + spans[d])
        if unit_dims > 1:
            return False
        if grid is None:
            grid = g_this
        elif grid != g_this:
            return False

    assert grid is not None
    blocks = []
    gcoeffs = []
    for d in range(rank):
        g = grid[d]
        w = windows[d]
        if g:
            b = min(g.values())
            if b < w or any(c % b for c in g.values()) or b > dims[d]:
                return False
            blocks.append(b)
            gcoeffs.append({s: c // b for s, c in g.items()})
        else:
            blocks.append(dims[d])  # whole extent each step
            gcoeffs.append({})
    # Mosaic tiling legality on the trailing two ref dims
    whole_last = blocks[-1] == dims[-1]
    if L > 1:
        if L % 128 != 0 or (blocks[-1] % 8 and not whole_last):
            return False
    else:
        if blocks[-1] % 128 and not whole_last:
            return False
        if rank >= 2 and blocks[-2] % 8 and blocks[-2] != dims[-2]:
            return False
    if any(dims[d] % blocks[d] for d in range(rank)):
        # non-exact tiling: pallas pads the last block with undefined
        # values — only safe when every access is masked (checked mode):
        # masked loads select their fallback and masked stores skip the
        # out-of-range lanes, so the padding never leaks
        masked_only = all(a.inst.op.opcode in (O.INDEX_MASKED,
                                               O.STORE_MASKED)
                          for a in accs)
        if not masked_only:
            return False

    plan.mode = "nd"
    plan.nd_shape = tuple(dims)
    plan.nd_block = tuple(blocks)
    plan.nd_grid_coeffs = tuple(gcoeffs)
    sweep = 1
    for g in gcoeffs:
        for s in g:
            sweep *= {"cx": cube_count[0], "cy": cube_count[1],
                      "cz": cube_count[2]}[s]
    n_blocks = 1
    for d in range(rank):
        n_blocks *= dims[d] // blocks[d]
    all_uncond = all(not a.conditional for a in accs if a.is_store)
    plan.store_covers_all = (plan.has_store and sweep >= n_blocks
                             and all_uncond)
    return True


def shared_dynamic_vids(scope: Scope, ua: UniformityAnalysis,
                        cube_dim: Tuple[int, int, int],
                        cube_count: Tuple[int, int, int]) -> set:
    """vids of SHARED buffers that may see dynamic-offset 1D windows
    (traced/grid-dependent rel, or strided unit access) and therefore
    need quantum padding for the superspan+roll path. Shareds indexed
    only by constants + a unit stride of 0/1 keep their exact size —
    per-shared span tracking instead of the blanket conservative pad."""
    loop_ranges = collect_loop_ranges(scope)
    _env, get = analyze_affine(scope, ua, loop_ranges, cube_dim, cube_count)
    dyn: set = set()

    def idx_of(inst):
        oc = inst.op.opcode
        if oc in (O.INDEX, O.STORE, O.INDEX_MASKED, O.STORE_MASKED,
                  O.BLOCK_REDUCE) or oc.startswith("atomic."):
            return inst.op.args[0], inst.op.args[1]
        return None, None

    for _s, inst in walk(scope):
        buf, idx = idx_of(inst)
        if buf is None or buf.kind != VarKind.SHARED:
            # unknown access kinds touching shareds: conservative
            if buf is None and any(
                    a.kind == VarKind.SHARED for a in inst.op.args
                    if hasattr(a, "kind")) and \
                    inst.op.opcode not in (O.SLICE,):
                dyn.update(a.vid for a in inst.op.args
                           if getattr(a, "kind", None) == VarKind.SHARED)
            continue
        aff = get(idx)
        if aff is None:
            dyn.add(buf.vid)
            continue
        cu = flat_unit_coeff(aff.coeffs, cube_dim) or 0
        # grid syms do NOT cancel for shareds (no block base) — any
        # non-unit symbol makes the offset traced at kernel level
        traced = any(s not in ("ux", "uy", "uz") and c != 0
                     for s, c in aff.coeffs.items())
        if traced or cu > 1 or cu < 0:
            dyn.add(buf.vid)
    return dyn


def plan_buffers(scope: Scope, ua: UniformityAnalysis,
                 cube_dim: Tuple[int, int, int],
                 cube_count: Tuple[int, int, int]) -> Dict[int, BufferPlan]:
    """Build per-buffer lowering plans and annotate access instructions."""
    loop_ranges = collect_loop_ranges(scope)
    env, get = analyze_affine(scope, ua, loop_ranges, cube_dim, cube_count)

    accesses: Dict[int, List[Access]] = {}

    def visit_accesses(s: Scope, depth: int) -> None:
        for inst in s.instructions:
            oc = inst.op.opcode
            for key in ("then", "orelse", "body", "cond_scope"):
                sub = inst.op.attrs.get(key)
                if isinstance(sub, Scope):
                    # loop bodies at depth 0 still execute unconditionally
                    d = depth + (0 if oc == O.RANGE_LOOP else 1)
                    visit_accesses(sub, d)
            for _c, sub in inst.op.attrs.get("cases", []):
                visit_accesses(sub, depth + 1)
            if oc in (O.INDEX, O.INDEX_MASKED, O.STORE, O.STORE_MASKED):
                buf = inst.op.args[0]
                if buf.kind != VarKind.BUFFER:
                    continue
                idx = inst.op.args[1]
                aff = get(idx)
                is_store = oc in (O.STORE, O.STORE_MASKED)
                cond = depth > 0 or oc in (O.INDEX_MASKED, O.STORE_MASKED)
                acc = Access(inst, aff, is_store, buf.ty.line,
                             conditional=cond)
                inst.op.attrs["affine"] = aff
                accesses.setdefault(buf.vid, []).append(acc)
            elif oc == O.BLOCK_REDUCE:
                buf = inst.op.args[0]
                if buf.kind != VarKind.BUFFER:
                    continue
                aff = get(inst.op.args[1])
                inst.op.attrs["affine"] = aff
                accesses.setdefault(buf.vid, []).append(
                    Access(inst, aff, False, buf.ty.line,
                           span=int(inst.op.attrs["lines"]),
                           conditional=depth > 0))
            elif oc in (O.MMA_LOAD, O.MMA_STORE):
                buf = inst.op.args[1]
                if buf.kind != VarKind.BUFFER:
                    continue
                # slab row span for padding: rows*stride when stride const
                mat = inst.op.args[0]
                stride_v = inst.op.args[3]
                L = buf.ty.line
                span = 1
                if stride_v.is_const and mat.shape:
                    # exact slab span: (rows-1)*stride + ceil(cols/L)
                    s_lines = max(1, int(stride_v.const) // max(L, 1))
                    r_, c_ = mat.shape[0], mat.shape[-1]
                    span = (r_ - 1) * s_lines + -(-c_ // max(L, 1))
                # affine of the LINE offset enables blocked planning for
                # MMA slabs (the tile offset's grid terms become the
                # BlockSpec; _mma_geometry subtracts the block base)
                aff = get(inst.op.args[2])
                if aff is not None and L > 1:
                    if aff.const % L or any(c % L for c in
                                            aff.coeffs.values()):
                        aff = None  # offset not line-aligned
                    else:
                        aff = Affine(aff.const // L,
                                     {s: c // L
                                      for s, c in aff.coeffs.items()})
                if aff is not None:
                    cu = flat_unit_coeff(aff.coeffs, cube_dim)
                    if cu is None or cu != 0:
                        aff = None  # unit-varying mma offsets unsupported
                accesses.setdefault(buf.vid, []).append(
                    Access(inst, aff, oc == O.MMA_STORE, L, span=span,
                           conditional=depth > 0))
            elif oc.startswith("atomic."):
                buf = inst.op.args[0]
                if buf.kind != VarKind.BUFFER:
                    continue
                # atomics read-modify-write: conservatively both directions
                accesses.setdefault(buf.vid, []).extend([
                    Access(inst, None, False, buf.ty.line, conditional=True),
                    Access(inst, None, True, buf.ty.line, conditional=True),
                ])
            elif oc == O.MEMCPY_ASYNC:
                for j, direction in ((1, True), (2, False)):
                    buf = inst.op.args[j]
                    if buf.kind == VarKind.BUFFER:
                        accesses.setdefault(buf.vid, []).append(
                            Access(inst, None, direction, buf.ty.line,
                                   conditional=True))

    has_return = any(inst.op.opcode in (O.RETURN, O.TERMINATE)
                     for _s, inst in walk(scope))
    visit_accesses(scope, 1 if has_return else 0)

    U = cube_dim[0] * cube_dim[1] * cube_dim[2]
    plans: Dict[int, BufferPlan] = {}
    for bp in scope.state.buffers:
        accs = accesses.get(bp.value.vid, [])
        plan = BufferPlan(bp)
        plan.has_load = any(not a.is_store for a in accs)
        plan.has_store = any(a.is_store for a in accs)
        for a in accs:
            if a.affine is not None:
                cu = flat_unit_coeff(a.affine.coeffs, cube_dim)
                if cu:
                    plan.max_span = max(plan.max_span, abs(cu) * U)
                plan.max_span = max(plan.max_span, a.span)
            else:
                plan.max_span = max(plan.max_span, U, a.span)
        plans[bp.value.vid] = plan
        if not accs:
            continue

        # ND mode first: full-rank row-major tensor accesses block per-dim
        if _try_nd_plan(plan, accs, get, cube_dim, cube_count, loop_ranges,
                        U):
            continue

        # try blocked mode: all accesses affine, identical grid coefficients,
        # bounded local extents
        grid: Optional[Dict[str, int]] = None
        lo, hi = None, None
        ok = True
        grid_sizes = {"cx": cube_count[0], "cy": cube_count[1],
                      "cz": cube_count[2]}
        for a in accs:
            if a.affine is None:
                ok = False
                break
            g = {s: c for s, c in a.affine.coeffs.items()
                 if s in GRID_SYMS and grid_sizes[s] > 1 and c != 0}
            if grid is None:
                grid = g
            elif grid != g:
                ok = False
                break
            # local extent (lines): const + Σ over non-grid syms
            amin = amax = a.affine.const
            for s, c in a.affine.coeffs.items():
                if s in GRID_SYMS:
                    continue
                r = _sym_range(s, cube_dim, loop_ranges)
                if r is None:
                    ok = False
                    break
                smin, smax = r
                amin += min(c * smin, c * smax)
                amax += max(c * smin, c * smax)
            else:
                # strided unit loads read a padded span of c*U lines
                c = flat_unit_coeff(a.affine.coeffs, cube_dim)
                if c is None or c < 0:
                    ok = False
                    break
                if c > 1:
                    amax = max(amax, amin + c * U - 1)
                if a.span > 1:  # block-granular accesses (block_reduce)
                    amax += a.span - 1
                lo = amin if lo is None else min(lo, amin)
                hi = amax if hi is None else max(hi, amax)
                continue
            ok = False
            break

        if not ok or grid is None or lo is None:
            continue
        if lo < 0:
            continue
        window = hi + 1  # block starts at 0 shift (require const offsets ≥ 0)
        # choose block size: must divide every grid coefficient
        if grid:
            bsize = None
            for c in grid.values():
                if c <= 0:
                    bsize = None
                    break
                bsize = c if bsize is None else min(bsize, c)
            if bsize is None or bsize < window:
                continue
            if any(c % bsize != 0 for c in grid.values()):
                continue
            block = bsize
        else:
            block = bp.length  # uniform block: whole buffer each step
        if block > bp.length:
            continue
        plan.mode = "blocked"
        plan.block_lines = block
        plan.grid_coeffs = {s: c // block for s, c in grid.items()}
        plan.base_const = 0
        # store coverage: exact tiling, grid sweeps all blocks, and every
        # store unconditional (a masked/branched store must RMW old data)
        n_blocks = (bp.length + block - 1) // block
        sweep = 1
        for s, c in plan.grid_coeffs.items():
            dim = {"cx": cube_count[0], "cy": cube_count[1],
                   "cz": cube_count[2]}[s]
            sweep *= dim
        all_uncond = all(not a.conditional for a in accs if a.is_store)
        plan.store_covers_all = (plan.has_store and sweep >= n_blocks
                                 and bp.length % block == 0 and all_uncond)
    return plans
