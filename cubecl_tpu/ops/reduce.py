"""Reductions: tree + plane sum/max/min/prod over large arrays.

Reference: examples/sum_things (sum_basic/sum_subgroup/sum_trait variants,
src/lib.rs:6-100) and the book's reduction progression (BASELINE §1).

TPU-native plan (SURVEY §2.9): each cube owns a contiguous chunk; inside
the cube, units×lines tile the VPU (8 sublanes × wide lanes); the grid
loop accumulates (U, L) tiles; lanes fold with line_sum, sublanes with
plane ops. Two-phase tree: per-cube partials then a final cube. The cube
dim is the plane dim (8) so plane ops span the whole cube.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..frontend import (
    ABSOLUTE_POS,
    CUBE_POS_X,
    UNIT_POS,
    ArrayArg,
    MutSlice,
    Slice,
    Vector,
    cube,
    cube_range,
    line_max,
    line_min,
    line_sum,
    max_,
    plane_max,
    plane_min,
    plane_sum,
)
from ..ir.types import f32
from ..runtime.base import CubeCount, CubeDim
from ..runtime.handle import Handle
from ..tune import TunableSet, LocalTuner

CD = 8  # cube dim == plane dim: plane ops reduce the whole cube


@cube
def reduce_sum_partial(inp: Slice, partials: MutSlice, iters: int):
    """Each cube reduces iters×CUBE_DIM lines into one scalar partial."""
    acc = Vector.zeros(f32, inp.line_size)
    base = CUBE_POS_X * (iters * 8)
    for k in cube_range(0, iters):
        acc = acc + inp[base + k * 8 + UNIT_POS]
    s = plane_sum(line_sum(acc))
    if UNIT_POS == 0:
        partials[CUBE_POS_X] = s


@cube
def reduce_max_partial(inp: Slice, partials: MutSlice, iters: int):
    base = CUBE_POS_X * (iters * 8)
    acc = inp[base + UNIT_POS]
    for k in cube_range(1, iters):
        acc = max_(acc, inp[base + k * 8 + UNIT_POS])
    s = plane_max(line_max(acc))
    if UNIT_POS == 0:
        partials[CUBE_POS_X] = s


@cube
def reduce_final_sum(partials: Slice, out: MutSlice, iters: int):
    """Single-cube final fold over the partials (any line size)."""
    acc = 0.0
    for k in cube_range(0, iters):
        idx = k * 8 + UNIT_POS
        if idx < partials.len():
            acc = acc + partials[idx]
    s = plane_sum(line_sum(acc))
    if UNIT_POS == 0:
        out[0] = s


@cube
def reduce_final_max(partials: Slice, out: MutSlice, iters: int):
    acc = partials[0]
    for k in cube_range(0, iters):
        idx = k * 8 + UNIT_POS
        if idx < partials.len():
            acc = max_(acc, partials[idx])
    s = plane_max(line_max(acc))
    if UNIT_POS == 0:
        out[0] = s


@cube
def reduce_block_partial(inp: Slice, partials: MutSlice, lines: int):
    """One cube-cooperative block_sum per cube (the TPU-idiomatic DSL
    reduce: one whole-window vector op instead of a per-unit load loop —
    ~3x the bandwidth of the unit-loop kernel at equal block size)."""
    partials[CUBE_POS_X] = inp.block_sum(CUBE_POS_X * lines, lines)


def reduce_sum_blockwise(client, inp: Handle, cubes: int = 32,
                         line_size: int = 128) -> Handle:
    """sum(inp) via cube-cooperative block reductions. Big blocks amortize
    the per-grid-step cost (~2us on v5e) — prefer ~2-4MB per cube — and
    the line MUST stay 128: HBM→VMEM streaming of blocks whose lane dim
    exceeds one 128-lane tile runs at 228 GB/s vs 750 at width 128 on
    v5e (round-2 width sweep; the DMA engine strides per lane-tile row).
    Measured (64M f32, v5e, long-chain slope): cubes=32 (8MB blocks)
    748 GB/s = 98% of XLA jnp.sum on the same harness; 64 -> 631;
    128 -> 363. 8MB double-buffered windows need the emitter's raised
    vmem_limit_bytes."""
    n = int(np.prod(inp.shape))
    line = line_size if n % line_size == 0 else 1
    n_lines = n // line
    while cubes > 1 and n_lines % cubes:
        cubes //= 2
    lines = n_lines // cubes
    partials = client.empty((cubes,), "float32")
    reduce_block_partial.launch_unchecked(
        client, CubeCount(cubes), CubeDim.new_1d(CD),
        ArrayArg(inp, line_size=line), ArrayArg(partials, mutable=True),
        lines)
    out = client.empty((1,), "float32")
    f_iters = -(-cubes // CD)
    reduce_final_sum.launch(
        client, CubeCount(1), CubeDim.new_1d(CD),
        ArrayArg(partials, line_size=1), ArrayArg(out, mutable=True),
        f_iters)
    return out


@cube
def reduce_sum_naive(inp: Slice, out: MutSlice):
    """The book's naive single-unit reduction (benchmark.md baseline) —
    kept for the 220× progression story."""
    acc = Vector.zeros(f32, inp.line_size)
    for k in cube_range(0, inp.len()):
        acc = acc + inp[k]
    if UNIT_POS == 0:
        out[0] = line_sum(acc)


def _plan(n_lines: int, line: int, target_cubes: int = 512):
    """Pick (cubes, iters) with cubes*iters*CD == n_lines, preferring a
    128-aligned cube count so the final fold can use full lines."""
    per_cube = max(CD, n_lines // target_cubes)
    iters = max(1, per_cube // CD)
    while iters > 1 and (n_lines % (iters * CD) != 0
                         or (n_lines // (iters * CD)) % 128 != 0):
        iters -= 1
    if n_lines % (iters * CD) != 0:
        iters = 1
    cubes = n_lines // (iters * CD)
    return cubes, iters


def reduce_sum(client, inp: Handle, line_size: int = 128,
               target_cubes: int = 512) -> Handle:
    """sum(inp) -> scalar handle, two-phase tree."""
    n = int(np.prod(inp.shape))
    line = line_size if n % line_size == 0 else 1
    n_lines = n // line
    assert n_lines % CD == 0, "length must be a multiple of 8 lines"
    cubes, iters = _plan(n_lines, line, target_cubes)
    # accumulate wide: f32 partials regardless of input dtype
    partials = client.empty((cubes,), "float32")
    reduce_sum_partial.launch_unchecked(
        client, CubeCount(cubes), CubeDim.new_1d(CD),
        ArrayArg(inp, line_size=line), ArrayArg(partials, mutable=True),
        iters)
    out = client.empty((1,), "float32")
    f_line = 128 if cubes % 128 == 0 else 1
    f_lines = cubes // f_line
    f_iters = -(-f_lines // CD)
    reduce_final_sum.launch(
        client, CubeCount(1), CubeDim.new_1d(CD),
        ArrayArg(partials, line_size=f_line), ArrayArg(out, mutable=True),
        f_iters)
    return out


def reduce_max(client, inp: Handle, line_size: int = 128,
               target_cubes: int = 512) -> Handle:
    n = int(np.prod(inp.shape))
    line = line_size if n % line_size == 0 else 1
    n_lines = n // line
    assert n_lines % CD == 0
    cubes, iters = _plan(n_lines, line, target_cubes)
    partials = client.empty((cubes,), str(inp.dtype))
    reduce_max_partial.launch_unchecked(
        client, CubeCount(cubes), CubeDim.new_1d(CD),
        ArrayArg(inp, line_size=line), ArrayArg(partials, mutable=True),
        iters)
    out = client.empty((1,), str(inp.dtype))
    f_line = 128 if cubes % 128 == 0 else 1
    f_lines = cubes // f_line
    f_iters = -(-f_lines // CD)
    reduce_final_max.launch(
        client, CubeCount(1), CubeDim.new_1d(CD),
        ArrayArg(partials, line_size=f_line), ArrayArg(out, mutable=True),
        f_iters)
    return out


def reduce_mean(client, inp: Handle, **kw) -> Handle:
    import jax.numpy as jnp

    s = reduce_sum(client, inp, **kw)
    n = int(np.prod(inp.shape))
    s.array = s.array / n
    return s


# ---------------------------------------------------------------------------
# Native (intrinsic-style) single-kernel reduction — the perf path
# ---------------------------------------------------------------------------


def _build_reduce_native(n: int, block_rows: int, dtype: str,
                         interpret: bool):
    """One pallas kernel: grid sweeps (block_rows, 128) blocks into a
    resident f32 accumulator tile; the final step folds it to a scalar."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = n // 128
    grid = (rows // block_rows,)

    def kernel(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.sum(x_ref[...].astype(jnp.float32), axis=0,
                                keepdims=True)

        @pl.when(i == grid[0] - 1)
        def _done():
            o_ref[...] = acc_ref[...]  # scalar stores to VMEM are illegal
                                       # on Mosaic: emit the lane row

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=n, bytes_accessed=n * np.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
        name=f"reduce_native_{block_rows}",
    )

    def fn(buffers, scalars=()):
        x, o = buffers
        out = call(x.reshape(rows, 128))
        return (jnp.sum(out).reshape(o.shape),)  # final 128-lane fold

    from ..backend.compiler import CompiledKernel

    return CompiledKernel(fn=fn, mutable_indices=[1],
                          source=f"native reduce n={n} rows/block="
                          f"{block_rows}", name="reduce_native")


def reduce_sum_native(client, inp: Handle, block_rows: int = 4096) -> Handle:
    """Speed-of-light path: whole reduction in one kernel (intrinsic-style,
    like the native matmul)."""
    from ..runtime.kernel import KernelId, NativeKernelTask

    n = int(np.prod(inp.shape))
    assert n % 128 == 0, "native reduce needs length % 128 == 0"
    rows = n // 128
    q = 8 * (4 // max(1, np.dtype(str(inp.dtype)).itemsize))  # sublane tile
    br = block_rows
    while rows % br or br % q:
        br //= 2
        if br < q:
            br = rows
            break
    interpret = bool(client._dev.call(
        lambda s: getattr(s.compiler, "interpret", False)))
    out = client.empty((1,), "float32")
    kid = KernelId.build("reduce_native", n, br, str(inp.dtype), interpret)
    task = NativeKernelTask(
        kid, lambda: _build_reduce_native(n, br, str(inp.dtype), interpret),
        name="reduce_native")
    client.launch(task, [inp, out])
    return out


# ---------------------------------------------------------------------------
# Autotuned line size / chunking (reference LocalTuner usage pattern)
# ---------------------------------------------------------------------------

_sum_tuner = LocalTuner("reduce_sum")


def reduce_sum_autotuned(client, inp: Handle) -> Handle:
    from ..tune.anchor import anchor

    n = int(np.prod(inp.shape))

    def key_fn(client_, inp_):
        return ("sum", anchor(int(np.prod(inp_.shape))), str(inp_.dtype))

    ts = TunableSet("reduce_sum", key_fn)
    if n % 128 == 0:
        for br in (512, 1024, 2048, 4096):
            ts.with_tunable(
                lambda c, h, _b=br: reduce_sum_native(c, h, block_rows=_b),
                name=f"native_br{br}",
                work=lambda key, _n=n: (_n, _n * 4))
    for bc in (16, 32, 64):
        if n % 128 == 0 and (n // 128) % bc == 0:
            ts.with_tunable(
                lambda c, h, _b=bc: reduce_sum_blockwise(c, h, cubes=_b),
                name=f"blockwise_c{bc}",
                work=lambda key, _n=n: (_n, _n * 4))
    for line in (128,):  # lane dim > one 128-lane tile streams 3.3x slower
        for tc in (256, 512, 1024):
            if n % line == 0 and (n // line) % CD == 0:
                ts.with_tunable(
                    lambda c, h, _l=line, _t=tc: reduce_sum(
                        c, h, line_size=_l, target_cubes=_t),
                    name=f"line{line}_cubes{tc}",
                    work=lambda key, _n=n: (_n, _n * 4))
    if not ts.tunables:
        return reduce_sum(client, inp, line_size=1)
    return _sum_tuner.execute(client, ts, client, inp)
