"""Pallas compiler: KernelDefinition → pallas_call executable.

The backend-compiler of the TPU build (SURVEY.md §7.4; replaces the
reference's cubecl-cpp / cubecl-spirv source printers, e.g.
``CppCompiler::compile_ir`` cubecl-cpp/src/shared/base.rs:216-320):

1. run the scope passes (L3a) + checked-IO insertion,
2. run uniformity + affine block planning,
3. assemble ``pl.pallas_call``: grid = CubeCount (z, y, x — x innermost),
   blocked buffers get BlockSpecs (Mosaic pipelines HBM→VMEM double
   buffering automatically), whole-mode buffers are VMEM-resident,
   scalars ride in SMEM, shared memory becomes VMEM scratch,
4. the kernel body runs the IR Evaluator (eval.py).

Mutable buffers follow the functional-XLA convention: they are also
outputs, aliased via ``input_output_aliases`` (donated), and the launcher
rebinds handles — replacing the reference's in-place CUDA buffers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

from ...ir import ops as O
from ...ir.scope import Scope, walk
from ...ir.value import VarKind
from ...opt.analysis import (UniformityAnalysis, plan_buffers,
                             shared_dynamic_vids)
from ...opt.checked_io import insert_checked_io
from ...opt.passes import optimize_scope
from ..compiler import CompiledKernel, Compiler, KernelDefinition


def _grid_dim(sym: str, cube_count):
    return {"cx": cube_count[0], "cy": cube_count[1], "cz": cube_count[2]}[sym]


class PallasCompiler(Compiler):
    name = "pallas"

    def __init__(self, interpret: bool = False, processors=None):
        self.interpret = interpret
        # backend IR rewriters (reference Processor/OptimizerBuilder hook);
        # users append their own via compiler.processors
        self.processors = list(processors) if processors is not None else []

    def compile(self, defn: KernelDefinition) -> CompiledKernel:
        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from .eval import EV, Cell, Evaluator, WideRef

        scope = defn.scope
        cd, cc = defn.cube_dim, defn.cube_count
        # FastMathProcessor always runs: flags live per-INSTRUCTION (a
        # helper may set them while the kernel doesn't), and the pass is
        # a no-op scan when none are present
        from ...opt.processors import FastMathProcessor, run_processors

        dyn_grid = defn.dynamic_grid_vid is not None
        run_processors(scope, list(self.processors) + [FastMathProcessor()])
        optimize_scope(scope, cd, cc, defn.plane_dim, dynamic_grid=dyn_grid)
        if defn.options.checked:
            insert_checked_io(scope, cd, cc)
            optimize_scope(scope, cd, cc, defn.plane_dim,
                           dynamic_grid=dyn_grid)

        ua = UniformityAnalysis(scope)
        plans = plan_buffers(scope, ua, cd, cc)
        if dyn_grid:
            # a runtime grid may stop short of the capacity sweep, so a
            # buffer "fully covered" by its cx-swept stores is NOT fully
            # covered at runtime: keep it an aliased input so unvisited
            # blocks retain their old contents instead of garbage
            for plan in plans.values():
                used = set(plan.grid_coeffs)
                for g in plan.nd_grid_coeffs:
                    used |= set(g)
                if "cx" in used:
                    plan.store_covers_all = False
        shared_dyn = shared_dynamic_vids(scope, ua, cd, cc)
        state = scope.state
        U = cd[0] * cd[1] * cd[2]

        # Mosaic tiling legality: 1D blocks must be whole-array or multiples
        # of 128 lanes; 2D blocks need lane dim %128 and sublane dim %8.
        # Illegal blocks demote to whole-buffer VMEM residency.
        for plan in plans.values():
            if plan.mode != "blocked":
                continue
            L = plan.param.ty.line
            whole = plan.block_lines == plan.param.length
            legal = whole or (
                (L > 1 and L % 128 == 0 and plan.block_lines % 8 == 0)
                or (L == 1 and plan.block_lines % 128 == 0))
            # a degenerate single-block 1D plan (no grid sweep) is
            # whole-mode in disguise — demote so it gets the quantum tail
            # padding dynamic 1D windows need. (L>1 refs stay blocked:
            # their dynamic row windows fit whole blocks, and padding a
            # tiny (1, L) ref trips a Mosaic internal bug.) Store coverage
            # carries over: a fully-covered blocked sweep fully covers the
            # resident whole buffer too (keeping the out a pure output
            # avoids donating an aliased input when in == out).
            # dynamic 1D windows load an ALIGNED SUPERSPAN (quantum A) and
            # rotate — the block must be able to hold it. A block smaller
            # than max_span + 2A cannot (eval._dyn_window_1d's padding
            # contract), so demote to whole mode, where tail padding is
            # available (strided per-unit scalar loads over a blocked
            # sweep hit this, e.g. the book's reduce_parallel stage).
            span_fits = True
            if L == 1 and plan.max_span and not self.interpret:
                sub = {4: 8, 2: 16, 1: 32}.get(plan.param.ty.elem.size, 8)
                A = sub * 128
                # the block must also be a multiple of the quantum A:
                # _dyn_window_1d floor-clamps the superspan start to an
                # A-aligned offset, so a blk_lines % A tail would be
                # unreachable (rotated wrong window + silent store drop)
                span_fits = (plan.block_lines % A == 0
                             and plan.block_lines >= plan.max_span + 2 * A)
            if not legal or not span_fits or (
                    not plan.grid_coeffs and L == 1):
                if not legal:
                    plan.demote_reason = (
                        f"block shape {plan.block_lines} lines x line "
                        f"{L} violates Mosaic tiling (1D blocks %128, "
                        f"2D sublane %8)")
                elif not span_fits:
                    plan.demote_reason = (
                        f"dynamic 1D window span {plan.max_span} does "
                        f"not fit the {plan.block_lines}-line block "
                        f"(aligned superspan + rotate needs "
                        f"span + 2 quanta)")
                else:
                    plan.demote_reason = (
                        "degenerate single-block 1D sweep (no grid "
                        "coefficients)")
                plan.mode = "whole"
                plan.block_lines = 0
                plan.grid_coeffs = {}
        for plan in plans.values():
            if plan.mode == "whole" and plan.max_span:
                # pad so (a) span accesses never clamp their start (which
                # would shift the value/mask correspondence on tails) and
                # (b) line-1 dynamic windows can load aligned superspans
                L = plan.param.ty.line
                if L == 1 and not self.interpret:
                    sub = {4: 8, 2: 16, 1: 32}.get(
                        plan.param.ty.elem.size, 8)
                    A = sub * 128
                    need = plan.param.length + plan.max_span + 2 * A
                    padded = -(-need // A) * A
                    plan.pad_lines = padded - plan.param.length
                elif L > 1 and not self.interpret:
                    # rows pad: dynamic 2D row windows (8-aligned + roll)
                    need = plan.param.length + plan.max_span + 16
                    padded = -(-need // 8) * 8
                    plan.pad_lines = padded - plan.param.length
                else:
                    # strided/unaligned spans can start at any line, so the
                    # tail overshoot is up to a full span regardless of
                    # divisibility
                    plan.pad_lines = plan.max_span

        # sub-32-bit 1D refs cannot be ds-sliced by Mosaic at ANY static
        # width that isn't a full packed lane-tile (bf16 needs %256; int8
        # slices never lower) — round-3 TPU smoke suite. Line-1 sub-32-bit
        # buffers are therefore WIDENED to their 32-bit carrier at the
        # pallas_call boundary (exact round-trip: bf16->f32, i8->i32, ...)
        # and the evaluator casts loads back to the logical dtype. Costs
        # 2-4x HBM traffic on these buffers only — hot kernels use
        # line>=128 2D refs (CLAUDE.md rule), which slice natively.
        def _wide_jnp(elem):
            # jnp.issubdtype, not numpy kind: ml_dtypes customs
            # (bfloat16, fp8) carry numpy kind 'V' and would misroute
            dt = jnp.dtype(elem.jnp_dtype())
            if jnp.issubdtype(dt, jnp.floating):
                return jnp.float32
            if jnp.issubdtype(dt, jnp.unsignedinteger):
                return jnp.uint32
            return jnp.int32

        widened: Dict[int, Any] = {}
        logical_of: Dict[int, Any] = {}  # vid -> logical (narrow) dtype
        if not self.interpret:
            for bp in state.buffers:
                if bp.ty.line == 1 and bp.ty.elem.size < 4 \
                        and plans[bp.value.vid].mode != "nd":
                    widened[bp.value.vid] = _wide_jnp(bp.ty.elem)
                    logical_of[bp.value.vid] = bp.ty.elem.jnp_dtype()

        # ---------------- assemble specs ----------------------------------
        # grid is (cz, cy, cx), x innermost/fastest — with size-1 dims
        # SQUEEZED out: a 3D Mosaic grid with leading 1s costs ~2x the
        # per-step overhead of the equivalent 1D grid
        full_axes = [("cz", cc[2]), ("cy", cc[1]), ("cx", cc[0])]
        kept_axes = [(s, n) for s, n in full_axes
                     if n > 1 or (dyn_grid and s == "cx")] or [("cx", 1)]
        grid_axes = {s: i for i, (s, _n) in enumerate(kept_axes)}
        grid = tuple(n for _s, n in kept_axes)

        in_specs: List[Any] = []
        in_args_meta: List[Tuple[str, int]] = []  # ("scalar"|"buffer", idx)
        out_specs: List[Any] = []
        out_shapes: List[Any] = []
        out_buffer_vids: List[int] = []
        io_aliases: Dict[int, int] = {}

        def block_spec(plan):
            # line>1 buffers are 2D (lines, L): lanes explicit, rows are
            # sublane-aligned slices; line==1 buffers stay 1D
            L = plan.param.ty.line
            if plan.mode == "nd":
                blocks = plan.nd_block + ((L,) if L > 1 else ())
                coeffs = plan.nd_grid_coeffs

                def index_map(*ids, _cs=tuple(coeffs), _L=L, _ax=grid_axes):
                    vals = {s: ids[i] for s, i in _ax.items()}
                    idxs = []
                    for g in _cs:
                        r = 0
                        for s, k in g.items():
                            r = r + k * vals.get(s, 0)
                        idxs.append(r)
                    if _L > 1:
                        idxs.append(0)
                    return tuple(idxs)

                return pl.BlockSpec(blocks, index_map,
                                    memory_space=pltpu.VMEM)
            if plan.mode == "blocked":
                coeffs = plan.grid_coeffs

                def index_map(*ids, _c=dict(coeffs), _L=L, _ax=grid_axes):
                    vals = {s: ids[i] for s, i in _ax.items()}
                    r = 0
                    for s, k in _c.items():
                        r = r + k * vals.get(s, 0)
                    return (r, 0) if _L > 1 else (r,)

                shape = (plan.block_lines, L) if L > 1 else (plan.block_lines,)
                return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)
            return pl.BlockSpec(memory_space=pltpu.VMEM)

        # scalars first (SMEM), then buffers — a stable ABI order like the
        # reference integrator (buffers, tensor maps, scalars sorted by type)
        for sp in state.scalars:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            in_args_meta.append(("scalar", sp.value.vid))

        buffer_input_pos: Dict[int, int] = {}
        for bp in state.buffers:
            plan = plans[bp.value.vid]
            needs_input = plan.has_load or (
                plan.has_store and not (plan.store_covers_all
                                        and not plan.has_load))
            needs_output = bp.mutable and plan.has_store
            if needs_input:
                buffer_input_pos[bp.value.vid] = len(in_specs)
                in_specs.append(block_spec(plan))
                in_args_meta.append(("buffer", bp.value.vid))
            if needs_output:
                out_idx = len(out_specs)
                out_specs.append(block_spec(plan))
                if plan.mode == "nd":
                    oshape = plan.nd_shape + ((bp.ty.line,)
                                              if bp.ty.line > 1 else ())
                else:
                    padded = bp.length + plan.pad_lines
                    oshape = (padded, bp.ty.line) if bp.ty.line > 1 \
                        else (padded,)
                out_shapes.append(jax.ShapeDtypeStruct(
                    oshape, widened.get(bp.value.vid,
                                        bp.ty.elem.jnp_dtype())))
                out_buffer_vids.append(bp.value.vid)
                if needs_input:
                    io_aliases[buffer_input_pos[bp.value.vid]] = out_idx

        scratch_shapes = []
        scratch_meta: List[int] = []
        for sd in state.shareds:
            L = sd.ty.line
            per_unit = isinstance(sd.value.payload, dict) and \
                sd.value.payload.get("per_unit")
            if per_unit:
                shape = (U, sd.shape[0] * L)
            elif L > 1:
                shape = (sd.shape[0], L)
            else:
                n = sd.shape[0]
                if not self.interpret and sd.value.vid in shared_dyn:
                    # quantum-pad so dynamic 1D windows stay in bounds —
                    # only for shareds the span analysis flags as seeing
                    # dynamic/strided offsets (exact size otherwise)
                    sub = {4: 8, 2: 16, 1: 32}.get(sd.ty.elem.size, 8)
                    A = sub * 128
                    n = -(-(n + U + 2 * A) // A) * A
                elif not self.interpret and n % 128:
                    n = -(-n // 128) * 128  # 1D VMEM lane alignment
                shape = (n,)
            sdt = sd.ty.elem.jnp_dtype()
            if not self.interpret and sd.ty.elem.size < 4 and \
                    (L == 1 or per_unit):
                sdt = _wide_jnp(sd.ty.elem)  # same 1D-slicing rule
                logical_of[sd.value.vid] = sd.ty.elem.jnp_dtype()
            scratch_shapes.append(pltpu.VMEM(shape, sdt))
            scratch_meta.append(sd.value.vid)

        n_in = len(in_specs)
        n_out = len(out_specs)
        has_return = any(inst.op.opcode in (O.RETURN, O.TERMINATE)
                         for _s, inst in walk(scope))

        mutable_written = set(out_buffer_vids)

        def kernel(*refs):
            in_refs = refs[:n_in]
            out_refs = refs[n_in:n_in + n_out]
            scratch_refs = refs[n_in + n_out:]

            ref_map: Dict[int, Any] = {}
            scalar_vals: Dict[int, Any] = {}
            for spec_ref, (kind, vid) in zip(in_refs, in_args_meta):
                if kind == "scalar":
                    scalar_vals[vid] = spec_ref[0]
                else:
                    ref_map[vid] = spec_ref
            for vid, r in zip(out_buffer_vids, out_refs):
                # rw buffers: single ref = the output block; prologue copies
                # the input block in so loads see original data
                if vid in ref_map:
                    plan = plans[vid]
                    in_ref = ref_map[vid]
                    nd_used = set()
                    for g in plan.nd_grid_coeffs:
                        nd_used |= set(g)
                    if (plan.mode == "blocked" and plan.grid_coeffs) or \
                            (plan.mode == "nd" and nd_used):
                        r[...] = in_ref[...]
                    else:
                        # resident across steps: copy only on first visit
                        first = None
                        used = set(plan.grid_coeffs) | nd_used
                        for s, i in grid_axes.items():
                            if s not in used:
                                c = pl.program_id(i) == 0
                                first = c if first is None else first & c
                        if first is None:
                            r[...] = in_ref[...]
                        else:
                            @pl.when(first)
                            def _copy(r=r, in_ref=in_ref):
                                r[...] = in_ref[...]
                ref_map[vid] = r
            for vid, r in zip(scratch_meta, scratch_refs):
                ref_map[vid] = r
            # widened sub-32-bit refs: the evaluator sees the LOGICAL
            # dtype through a casting proxy (loads narrow, stores widen)
            for vid, ldt in logical_of.items():
                if vid in ref_map:
                    ref_map[vid] = WideRef(ref_map[vid], ldt, jnp)

            ev = Evaluator(defn, plans, ua, ref_map, scalar_vals,
                           jnp, lax, pl, jax, pltpu, self.interpret,
                           grid_axes=grid_axes)
            if has_return:
                cell = Cell(None)  # becomes the not-returned mask on RETURN
                ev._kernel_cell = cell
                ev.masks.append(cell)
            ev.run(scope)

        # ------------------------------------------------ pallas_call ------
        flops, mem_bytes, transc = _cost_estimate(scope, cd, cc, plans)
        # a grid dim is parallel when every stored buffer maps distinct
        # blocks along it (no cross-step carry) — lets Mosaic split cores
        auto_dims = []
        store_plans = [p for p in plans.values() if p.has_store]
        for s, n in kept_axes:
            par = n == 1 or (
                bool(store_plans)
                and all(p.mode == "blocked" and s in p.grid_coeffs
                        for p in store_plans))
            auto_dims.append("parallel" if par else "arbitrary")
        dims = defn.options.dimension_semantics or tuple(auto_dims)
        if len(dims) != len(grid):  # user-specified 3D semantics: squeeze
            dims = tuple(d for (s, n), d in zip(full_axes, dims) if n > 1) \
                or ("arbitrary",)
        if dyn_grid:
            # a runtime-sized dimension cannot be core-split statically
            dims = tuple("arbitrary" if s == "cx" else d
                         for (s, _n), d in zip(kept_axes, dims))
        # Raise the scoped-VMEM ceiling when the block windows need it:
        # Mosaic's 16MB default rejects fat (>4MB double-buffered) blocks
        # that the 128MB VMEM on v4+ holds easily, and fat blocks are how
        # grid-step overhead amortizes (BENCH_NOTES round 2: 16 steps of
        # 16MB stream within noise of XLA's reduce).
        vmem_breakdown: List[tuple] = []
        vmem_est = _vmem_estimate(state, plans, U, vmem_breakdown)
        vmem_limit = min(max(16 * 2**20, vmem_est + vmem_est // 4),
                         100 * 2**20)
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=dims,
            vmem_limit_bytes=vmem_limit,
        )
        def make_call(g):
            return pl.pallas_call(
                kernel,
                grid=g,
                in_specs=in_specs,
                out_specs=out_specs if n_out != 1 else out_specs[0],
                out_shape=out_shapes if n_out != 1 else out_shapes[0],
                scratch_shapes=scratch_shapes,
                input_output_aliases=io_aliases,
                compiler_params=compiler_params,
                cost_estimate=pl.CostEstimate(
                    flops=max(1, flops), bytes_accessed=max(1, mem_bytes),
                    transcendentals=transc),
                interpret=self.interpret,
                name=defn.options.name,
            )

        # with a runtime grid width the pallas_call binds per trace (the
        # grid carries a traced scalar); one XLA executable still serves
        # every width — Mosaic dynamic grid bounds
        call = None if dyn_grid else make_call(grid)

        param_order = [bp.value.vid for bp in state.buffers]
        scalar_order = [sp.value.vid for sp in state.scalars]
        mutable_indices = [i for i, bp in enumerate(state.buffers)
                           if bp.value.vid in mutable_written]

        lines_of = {bp.value.vid: bp.ty.line for bp in state.buffers}
        pads_of = {vid: plans[vid].pad_lines for vid in lines_of}

        def fn(buffers, scalars=()):
            flat_in = []
            for (kind, vid) in in_args_meta:
                if kind == "scalar":
                    pos = scalar_order.index(vid)
                    s = jnp.asarray(scalars[pos]).reshape(1)
                    flat_in.append(s)
                else:
                    pos = param_order.index(vid)
                    arr = buffers[pos]
                    L = lines_of[vid]
                    plan = plans[vid]
                    if plan.mode == "nd":
                        shape = plan.nd_shape + ((L,) if L > 1 else ())
                        flat_in.append(arr.reshape(shape))
                        continue
                    arr = arr.reshape(-1, L) if L > 1 else arr.reshape(-1)
                    pad = pads_of[vid]
                    if pad:
                        widths = ((0, pad), (0, 0)) if L > 1 else ((0, pad),)
                        arr = jnp.pad(arr, widths)
                    if vid in widened:
                        arr = arr.astype(widened[vid])
                    flat_in.append(arr)
            if dyn_grid:
                pos = scalar_order.index(defn.dynamic_grid_vid)
                gx = jnp.asarray(scalars[pos], jnp.int32).reshape(())
                g = tuple(gx if s == "cx" else n for s, n in kept_axes)
                res = make_call(g)(*flat_in)
            else:
                res = call(*flat_in)
            if n_out == 1:
                res = (res,)
            outs = []
            for idx in mutable_indices:
                vid = param_order[idx]
                k = out_buffer_vids.index(vid)
                r = res[k]
                pad = pads_of[vid]
                if pad:
                    r = r[:-pad] if r.ndim == 1 else r[:-pad, :]
                if vid in widened:
                    r = r.astype(buffers[idx].dtype)
                outs.append(r.reshape(buffers[idx].shape))
            return tuple(outs)

        src = _dump_source(defn, plans, ua)
        return CompiledKernel(
            fn=fn, mutable_indices=mutable_indices, source=src,
            name=defn.options.name, flops=flops, bytes_accessed=mem_bytes,
            vmem_estimate=vmem_est, vmem_breakdown=vmem_breakdown,
        )


def _cost_estimate(scope, cd, cc, plans):
    """Rough CostEstimate for the Mosaic scheduler (reference Work{} fed to
    tune/bounds_generator.rs:46)."""
    U = cd[0] * cd[1] * cd[2]
    steps = cc[0] * cc[1] * cc[2]
    flops = 0
    transc = 0
    for _s, inst in walk(scope):
        oc = inst.op.opcode
        line = inst.out.ty.line if inst.out is not None else 1
        if oc.startswith("arith.") or oc.startswith("cmp."):
            flops += U * line
            if oc in (O.EXP, O.LOG, O.TANH, O.ERF, O.SIN, O.COS, O.POW,
                      O.EXP2, O.LOG2):
                transc += U * line
        elif oc == O.MMA_EXECUTE:
            a = inst.op.args[0]
            d = inst.op.args[3]
            m, k = a.shape
            n = d.shape[1]
            flops += 2 * m * n * k
    mem = 0
    for plan in plans.values():
        L = plan.param.ty.line
        per_step = plan.block_lines * L if plan.mode == "blocked" \
            else plan.param.length * L
        n = (1 + (1 if plan.has_store else 0))
        mem += per_step * plan.param.ty.elem.size * n
    return flops * steps, mem * steps, transc * steps


def _vmem_estimate(state, plans, U, breakdown=None):
    """Total scoped-VMEM estimate; with ``breakdown`` (a list), appends
    one (name, bytes, mode, demote_reason) entry per buffer so launch
    validation can name the offender when the total blows the ceiling."""
    total = 0
    by_vid = {bp.value.vid: bp for bp in state.buffers}
    for vid, plan in plans.items():
        L = plan.param.ty.line
        if plan.mode == "blocked":
            lines = plan.block_lines
        elif plan.mode == "nd" and plan.nd_block is not None:
            # ND window: (sublane rows, line columns) per grid step
            lines = plan.nd_block[0] * plan.nd_block[1]
        else:
            lines = plan.param.length
        bp = by_vid.get(vid)
        # a read-write buffer occupies BOTH an input and an output window
        # (aliased in HBM, but each gets its own VMEM staging — observed
        # 17.8MB actual vs an 8MB single-window estimate on v5e)
        windows = 1
        if bp is not None and bp.mutable and plan.has_store and (
                plan.has_load or not plan.store_covers_all):
            windows = 2
        nbytes = lines * L * plan.param.ty.elem.size * 2 * windows
        total += nbytes
        if breakdown is not None and bp is not None:
            breakdown.append((bp.name, nbytes, plan.mode,
                              plan.demote_reason))
    for sd in state.shareds:
        total += sd.shape[0] * sd.ty.line * sd.ty.elem.size
    return total


def _dump_source(defn, plans, ua) -> str:
    lines = [f"// pallas kernel {defn.options.name}",
             f"// cube_dim={defn.cube_dim} cube_count={defn.cube_count} "
             f"plane={defn.plane_dim}"]
    for bp in defn.state.buffers:
        plan = plans[bp.value.vid]
        extra = ""
        if plan.mode == "nd":
            extra = f" nd_block={plan.nd_block} nd_grid={plan.nd_grid_coeffs}"
        lines.append(
            f"// buffer {bp.name}: {bp.ty!r}[{bp.length}] mode={plan.mode} "
            f"block={plan.block_lines} grid={plan.grid_coeffs} "
            f"mut={bp.mutable}{extra}")
    if defn.options.debug_symbols:
        # @cube(debug_symbols=True): annotate every instruction with its
        # user source location (reference CompileOptions::debug_symbols;
        # the C++ printers emit #line directives — here the IR listing
        # carries the locations and ServerLogger's full compile log
        # prints it)
        lines.append(_dump_ir_with_locs(defn.scope))
    else:
        lines.append(repr(defn.scope))
    return "\n".join(lines)


def _dump_ir_with_locs(scope, indent: str = "") -> str:
    out = []
    for inst in scope.instructions:
        loc = f"  // {inst.source_loc}" if inst.source_loc else ""
        out.append(f"{indent}{inst!r}{loc}")
        for key in ("then", "orelse", "body", "cond_scope"):
            sub = inst.op.attrs.get(key) if hasattr(inst.op, "attrs") else None
            if sub is not None and hasattr(sub, "instructions"):
                out.append(f"{indent}{key}:")
                out.append(_dump_ir_with_locs(sub, indent + "  "))
    return "\n".join(out)
